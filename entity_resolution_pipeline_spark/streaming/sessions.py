"""Custom STATEFUL streaming operators over the events stream.

Two formulations of gap-based sessionization, mirroring the oracle-checked
batch `sessionization` query (__spark_entry__.q_sessionization — lag →
new-session flag → running sum → per-session aggs):

* `session_window_stream` — the Spark-FIRST scale path: watermark +
  `F.session_window` grouped aggregation.  Pure built-in operators, state
  managed by the engine (RocksDB/HDFS state store on a cluster), merges
  late-but-within-watermark events into their session.  Use this whenever
  the built-in gap semantics fit — which they do for plain sessionization.

* `sessionize_stream` — the CUSTOM-stateful-operator pattern the built-ins
  can't express (running per-session state with arbitrary transition
  logic): `applyInPandasWithState` with explicit per-user state
  (open-session start / last-seen / count), event-time timeouts closing
  idle sessions when the watermark passes, Arrow-batched per-group
  processing (vectorized numpy segment splits, no per-row Python beyond
  the group loop Spark itself drives).  This is the template for stateful
  operators with richer transitions (per-entity incremental ER state,
  windowed dedup state) — sessionization keeps it parity-checkable against
  the batch query.

Boundary semantics: a gap STRICTLY GREATER than `gap_seconds` starts a new
session — identical to the batch query's `diff > 1800s` flag.  (Note the
built-in session_window closes at `diff >= gap`; `session_window_stream`
therefore documents and tests its own boundary rather than silently
diverging from the batch query on exact-gap events.)

Reference anchor: the reference has no streaming at all (SURVEY §2.11);
this extends the checkpointed batch pipeline the same way ingest.py does,
with batch parity pinned by tests/test_streaming_sessions.py.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
    ]
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: (open-session start, last event seen, event count) in epoch micros
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def read_events_stream(
    spark: SparkSession, in_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source readStream over time-ordered event chunk files.  `ts` is
    cast to TIMESTAMP (the watermark column); parquet TIMESTAMP_NTZ and
    TIMESTAMP inputs both land on the same session arithmetic because all
    boundaries are computed on microsecond DIFFS."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(in_dir)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _us(series: pd.Series) -> np.ndarray:
    return series.astype("datetime64[us]").astype(np.int64).to_numpy()


def _sessions_frame(user_id: int, closed: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": np.full(len(closed), user_id, dtype=np.int64),
            "session_start": pd.to_datetime(
                [c[0] for c in closed], unit="us"
            ),
            "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
            "n_events": np.array([c[2] for c in closed], dtype=np.int64),
        }
    )


def make_sessionizer(gap_seconds: int = 1800):
    """applyInPandasWithState transition function: merge the batch's events
    (sorted, vectorized gap-split) with the user's open-session state, emit
    every CLOSED session, keep the trailing open session in state, and arm
    an event-time timeout at last_seen + gap so idleness closes it once the
    watermark passes.  Strictly-greater gap boundary (batch parity)."""
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1_000

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _sessions_frame(user_id, [(start_us, last_us, n)])
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        rows = rows.sort_values(["ts", "event_id"], kind="stable")
        us = _us(rows["ts"])
        closed: list[tuple[int, int, int]] = []
        # vectorized gap split: positions where a NEW session starts
        splits = (np.flatnonzero(np.diff(us) > gap_us) + 1).tolist()
        bounds = [0] + splits + [len(us)]
        segs = [
            (int(us[a]), int(us[b - 1]), b - a)
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        if state.exists:
            start_us, last_us, n = state.get
            s0, s1, sn = segs[0]
            if s0 - last_us > gap_us:
                closed.append((start_us, last_us, n))  # idle gap closed it
            else:
                segs[0] = (start_us, max(s1, last_us), n + sn)
        closed.extend(segs[:-1])
        start_us, last_us, n = segs[-1]
        state.update((start_us, last_us, n))
        # close the open session when event-time passes last_seen + gap;
        # Spark requires the timeout to sit above the current watermark
        state.setTimeoutTimestamp(
            max(last_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield _sessions_frame(user_id, closed)

    return fn


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-sessionization as a CUSTOM stateful operator
    (applyInPandasWithState, event-time timeout).  Emits one row per CLOSED
    session: (user_id, session_start, session_end, n_events) — append mode,
    exactly-once per session given the file-source + checkpoint contract.
    Scale shape: state is O(1) per active user (three longs), shuffles hash
    on user_id only, and each micro-batch's per-user work is vectorized."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def session_window_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """The built-in formulation: watermark + F.session_window grouped agg —
    the plan to prefer at scale when the gap semantics fit (engine-managed
    state store, late-event session merging for free).  Built-in boundary:
    an event exactly `gap_seconds` after its predecessor starts a NEW
    session (diff >= gap), one tick earlier than the batch query's strict
    `>` — pinned by its own parity test, not silently conflated."""
    sw = F.session_window("ts", f"{gap_seconds} seconds")
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", sw)
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
