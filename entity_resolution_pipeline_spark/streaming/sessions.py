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
  logic): `applyInPandasWithState` with an explicit per-user event buffer
  over the non-final horizon, watermark-sealed emission (a session is
  emitted exactly once, only when no admissible event can still change
  it), event-time timeouts flushing idle users, Arrow-batched per-group
  processing (vectorized numpy segment splits, no per-row Python beyond
  the group loop Spark itself drives).  Late events within the watermark
  extend, merge, or backward-grow buffered sessions EXACTLY as the batch
  query would (pinned by test).  This is the template for stateful
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
    ArrayType,
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

# state: the user's NON-FINAL event horizon — every buffered event
# timestamp (epoch micros) belonging to a session the watermark has not yet
# sealed.  Same asymptotic state bound as the engine's own session_window
# store: O(events within watermark delay) per active user.
_STATE_SCHEMA = StructType([StructField("buf", ArrayType(LongType()))])


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
    """applyInPandasWithState transition function, WATERMARK-CORRECT for
    late data: the state buffers every event timestamp of the user's
    non-final horizon; each invocation re-splits the sorted buffer into
    sessions (strictly-greater gap boundary — batch parity) and emits
    exactly the sessions the watermark has SEALED.

    Finality proof: Spark admits only rows with ts ≥ watermark, and an
    event can extend/merge a session only if ts ≤ session_end + gap — so
    once watermark > end + gap the session can never change (backward
    merges need ts < start ≤ end < watermark − gap, already inadmissible).
    Sealed sessions are emitted once and their events pruned from state;
    everything else (including late-but-admitted events that extend, merge,
    or backward-grow buffered sessions) stays in the buffer.  An event-time
    timeout re-evaluates the buffer when the watermark passes the earliest
    possible seal point, so idle users still flush."""
    gap_us = gap_seconds * 1_000_000

    def _split(us: np.ndarray) -> list[tuple[int, int, int]]:
        splits = (np.flatnonzero(np.diff(us) > gap_us) + 1).tolist()
        bounds = [0] + splits + [len(us)]
        return [
            (int(us[a]), int(us[b - 1]), b - a)
            for a, b in zip(bounds[:-1], bounds[1:])
        ]

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        buf = np.asarray(state.get[0], dtype=np.int64) if state.exists else None
        if not state.hasTimedOut:
            parts = [p for p in pdfs if len(p)]
            if parts:
                rows = (
                    pd.concat(parts, ignore_index=True)
                    if len(parts) > 1
                    else parts[0]
                )
                new = _us(rows["ts"])
                buf = new if buf is None else np.concatenate([buf, new])
        if buf is None or not len(buf):
            if state.exists:
                state.remove()
            return
        buf = np.sort(buf, kind="stable")
        wm_us = state.getCurrentWatermarkMs() * 1000
        segs = _split(buf)
        sealed = [s for s in segs if s[1] + gap_us < wm_us]
        open_segs = segs[len(sealed) :]  # segs are time-ordered
        if open_segs:
            keep_from = np.searchsorted(buf, open_segs[0][0], side="left")
            state.update((buf[keep_from:].tolist(),))
            # re-check when the watermark can first seal the oldest open
            # session; must sit strictly above the current watermark
            state.setTimeoutTimestamp(
                max((open_segs[0][1] + gap_us) // 1000 + 1, wm_us // 1000 + 1)
            )
        else:
            state.remove()
        if sealed:
            yield _sessions_frame(user_id, sealed)

    return fn


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-sessionization as a CUSTOM stateful operator
    (applyInPandasWithState, event-time timeout).  Emits one row per SEALED
    session: (user_id, session_start, session_end, n_events) — append mode,
    exactly-once per session given the file-source + checkpoint contract,
    late events within the watermark handled exactly.  Scale shape: state
    is O(events within the watermark horizon) per active user (the same
    bound as the engine's session_window state store), shuffles hash on
    user_id only, and each micro-batch's per-user work is vectorized."""
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
