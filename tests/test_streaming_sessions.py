"""Stateful streaming sessionization: applyInPandasWithState (custom state,
event-time timeouts) and the built-in session_window formulation, each
parity-pinned against the batch lag/sum sessionization on the same events
replayed as a time-ordered file stream."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.streaming.sessions import (
    read_events_stream,
    session_window_stream,
    sessionize_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
GAP = 1800


def _events_pdf(spark) -> pd.DataFrame:
    df = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id")
        .toPandas()
    )
    return df.sort_values(["ts", "event_id"], kind="stable").reset_index(drop=True)


def _write_chunks(spark, pdf: pd.DataFrame, in_dir: str, n_chunks: int) -> None:
    """Split time-ordered events into n chunk files (each chunk's min ts ≥
    the previous chunk's max — the file-stream replay contract) and append a
    final flush chunk: one far-future sentinel event per user, which closes
    every real session in-batch and whose own one-event session dies with
    the query (it is the open state at stream end)."""
    bounds = [int(len(pdf) * i / n_chunks) for i in range(n_chunks + 1)]
    for c in range(n_chunks):
        part = pdf.iloc[bounds[c] : bounds[c + 1]]
        spark.createDataFrame(part).coalesce(1).write.mode("append").parquet(in_dir)
    flush_ts = pdf["ts"].max() + pd.Timedelta(days=10)
    users = pdf["user_id"].unique()
    sentinel = pd.DataFrame(
        {
            "event_id": [10**12 + i for i in range(len(users))],
            "ts": [flush_ts] * len(users),
            "user_id": users,
        }
    )
    spark.createDataFrame(sentinel).coalesce(1).write.mode("append").parquet(in_dir)


def _batch_sessions(spark, strict_greater: bool) -> set:
    """The batch lag → flag → running-sum sessionization (the oracle-checked
    q_sessionization shape), with the gap boundary parameterized: `>`
    matches the custom stateful operator, `>=` matches the built-in
    session_window."""
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    diff = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    boundary = diff > GAP * 1_000_000 if strict_greater else diff >= GAP * 1_000_000
    sess = events.withColumn(
        "session_idx",
        F.sum(F.when(boundary, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    rows = (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_micros("ts")).alias("s_us"),
            F.max(F.unix_micros("ts")).alias("e_us"),
        )
        .collect()
    )
    return {(r["user_id"], r["s_us"], r["e_us"], r["n_events"]) for r in rows}


def _run_stream(spark, tmp_path, make_query, name: str) -> set:
    in_dir = str(tmp_path / "events_in")
    _write_chunks(spark, _events_pdf(spark), in_dir, n_chunks=3)
    stream = read_events_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        make_query(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    return {
        (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
        )
        for r in rows
    }


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization over a 3-chunk replay (state
    crosses micro-batch boundaries; sentinels close the trailing sessions
    in-batch) is EXACTLY the batch lag/sum result."""
    streamed = _run_stream(
        spark, tmp_path, lambda s: sessionize_stream(s, GAP, watermark="1 hour"),
        "sess_state",
    )
    expected = _batch_sessions(spark, strict_greater=True)
    # the sentinels' own sessions must stay OPEN in state (never emitted) —
    # exact set equality therefore also pins the open-session contract
    assert streamed == expected
    assert len(expected) > 50  # the fixture really sessionizes


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Built-in session_window formulation matches the batch recomputation
    under ITS boundary (diff >= gap starts a new session).  Append mode
    emits a window only after the watermark passes it — the far-future
    sentinel chunk advances the watermark past every real session."""
    streamed = _run_stream(
        spark, tmp_path, lambda s: session_window_stream(s, GAP, watermark="1 hour"),
        "sess_window",
    )
    expected = _batch_sessions(spark, strict_greater=False)
    max_real_end = max(s[2] for s in expected)
    extras = streamed - expected
    # anything beyond the batch set may only be sentinel singletons (and
    # normally the sentinels' windows never pass the watermark at all)
    assert all(s[3] == 1 and s[1] > max_real_end for s in extras)
    assert streamed - extras == expected


def test_stateful_sessionize_admits_late_events(spark, tmp_path):
    """Out-of-order ACROSS micro-batches: a held-out slice of events arrives
    one batch late (but within the watermark).  The buffered-state design
    must fold them into the right sessions — extending, merging, or
    backward-growing buffered sessions — and still equal the batch result
    exactly.  (Sessions are sealed only once the watermark passes
    session_end + gap, so no session can be emitted before its late events
    can no longer arrive.)"""
    pdf = _events_pdf(spark)
    in_dir = str(tmp_path / "events_late_in")
    cut = int(len(pdf) * 0.7)
    early = pdf.iloc[:cut]
    held_out = early.iloc[::7]  # every 7th early event arrives LATE
    on_time = early.drop(held_out.index)
    spark.createDataFrame(on_time).coalesce(1).write.mode("append").parquet(in_dir)
    late_batch = pd.concat([held_out, pdf.iloc[cut:]], ignore_index=True)
    spark.createDataFrame(late_batch).coalesce(1).write.mode("append").parquet(in_dir)
    # flush sentinels must clear the (huge) watermark delay that admits the
    # late slice: one per user, far beyond max_ts + delay + gap
    users = pdf["user_id"].unique()
    sentinel = pd.DataFrame(
        {
            "event_id": [10**12 + i for i in range(len(users))],
            "ts": [pdf["ts"].max() + pd.Timedelta(days=400)] * len(users),
            "user_id": users,
        }
    )
    spark.createDataFrame(sentinel).coalesce(1).write.mode("append").parquet(in_dir)

    stream = read_events_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        sessionize_stream(stream, GAP, watermark="365 days")
        .writeStream.format("memory")
        .queryName("sess_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
        )
        for r in spark.table("sess_late").collect()
    }
    assert streamed == _batch_sessions(spark, strict_greater=True)


def test_stateful_sessionize_multibatch_equals_singlebatch(spark, tmp_path):
    """Chunking must not change the result: 1-file-per-trigger replay equals
    an all-at-once replay (state merge across batches is exact)."""
    in_dir = str(tmp_path / "events_in2")
    _write_chunks(spark, _events_pdf(spark), in_dir, n_chunks=5)
    results = []
    for name, mfpt in (("sess_m1", 1), ("sess_all", None)):
        stream = read_events_stream(spark, in_dir, max_files_per_trigger=mfpt)
        q = (
            sessionize_stream(stream, GAP, watermark="1 hour")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt2_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results.append(
            {
                (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                for r in spark.table(name).collect()
            }
        )
    assert results[0] == results[1] and results[0]
