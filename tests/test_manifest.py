"""Lineage manifest + resume protocol tests (north rule: resumable from
checkpoint with per-partition lineage + metrics)."""

from __future__ import annotations

import pytest

from entity_resolution_pipeline_spark.sources import manifest as M


def test_write_read_stage_table(spark, tmp_path):
    base = str(tmp_path / "stages")
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS doubled")
    out = M.write_stage_table(df, base, "stage_a", metrics={"dropped": 3.0})
    assert out.count() == 100
    assert M.stage_complete(spark, base, "stage_a")
    assert not M.stage_complete(spark, base, "stage_b")
    re_read = M.read_stage_table(spark, base, "stage_a")
    assert sorted(r["doubled"] for r in re_read.collect()) == sorted(
        2 * i for i in range(100)
    )


def test_manifest_rows_carry_metrics(spark, tmp_path):
    base = str(tmp_path / "stages")
    M.record_stage(spark, base, "blocking", rows=42, metrics={"hot_blocks": 2.0})
    mf = M.read_manifest(spark, base).collect()
    assert len(mf) == 1
    row = mf[0]
    assert row["stage"] == "blocking" and row["rows"] == 42
    assert row["metrics"]["hot_blocks"] == 2.0
    assert row["status"] == "complete"


def test_resume_skips_complete_stage(spark, tmp_path):
    """The resume contract: a completed stage is skipped and its output
    re-read; an incomplete stage re-runs."""
    base = str(tmp_path / "stages")
    runs = {"n": 0}

    def expensive_stage():
        runs["n"] += 1
        return spark.range(0, 10).selectExpr("id")

    def run_stage(name):
        if M.stage_complete(spark, base, name):
            return M.read_stage_table(spark, base, name)
        return M.write_stage_table(expensive_stage(), base, name)

    a1 = run_stage("s1")
    assert runs["n"] == 1 and a1.count() == 10
    a2 = run_stage("s1")  # resume: must NOT recompute
    assert runs["n"] == 1 and a2.count() == 10


def test_per_partition_lineage_rows(spark, tmp_path):
    base = str(tmp_path / "stages")
    df = spark.range(0, 1000, numPartitions=4).selectExpr("id")
    M.write_stage_table(df, base, "s_part")
    mf = M.read_manifest(spark, base)
    parts = mf.where("stage = 's_part/partitions'").collect()
    assert len(parts) >= 1
    assert sum(r["rows"] for r in parts) == 1000
    assert all(r["partition_id"] >= 0 for r in parts)
    summary = mf.where("stage = 's_part'").collect()
    assert len(summary) == 1 and summary[0]["rows"] == 1000


def test_interrupted_stage_reruns(spark, tmp_path):
    base = str(tmp_path / "stages")
    # simulate an interrupted write: table exists but no manifest row
    spark.range(0, 5).write.mode("overwrite").parquet(f"{base}/s2")
    assert not M.stage_complete(spark, base, "s2")


def test_bucketed_stage_table_joins_without_exchange(spark, tmp_path):
    """Two stage tables bucketed on the join key with the same bucket count
    must join with no Exchange on either side (the co-location lever)."""
    from pyspark.sql import functions as F

    from entity_resolution_pipeline_spark.sources import manifest as M

    out = str(tmp_path)
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    ta = M.write_stage_table(a, out, "bucket_a", bucket_by=("k",), num_buckets=8)
    tb = M.write_stage_table(b, out, "bucket_b", bucket_by=("k",), num_buckets=8)
    # disable broadcast so the sort-merge path (where bucketing applies) is
    # chosen — at real stage-table sizes neither side broadcasts anyway
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # resume protocol still intact for bucketed stages
    assert M.stage_complete(spark, out, "bucket_a")


def test_merge_stage_table_upsert_and_idempotency(spark, tmp_path):
    """MERGE semantics (S7): key-matched rows replaced, others kept;
    re-running the same merge yields a byte-identical table."""
    base = str(tmp_path / "stages")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "val", "score"]
    )
    M.merge_stage_table(v1, base, "dim", keys=("id",))
    # upsert: id 2 updated, id 4 inserted, ids 1/3 untouched
    v2 = spark.createDataFrame([(2, "B", 21), (4, "d", 40)], ["id", "val", "score"])
    out = M.merge_stage_table(v2, base, "dim", keys=("id",))
    rows1 = sorted(map(tuple, out.collect()))  # materialize pre-swap
    got = {r[0]: (r[1], r[2]) for r in rows1}
    assert got == {1: ("a", 10), 2: ("B", 21), 3: ("c", 30), 4: ("d", 40)}
    # idempotency: same merge twice → identical table
    again = M.merge_stage_table(v2, base, "dim", keys=("id",))
    assert sorted(map(tuple, again.collect())) == rows1


def test_merge_recovers_from_mid_swap_crash(spark, tmp_path):
    """A driver death between the swap's two renames leaves the table only
    in `<path>.old-<uuid>`; the next merge must RESTORE it, not take the
    fresh-table branch and silently drop every previously merged row."""
    import os

    base = str(tmp_path / "stages")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "val", "score"]
    )
    M.merge_stage_table(v1, base, "dim", keys=("id",))
    path = os.path.join(base, "dim")
    # simulate the crash window: rename(path → trash) happened,
    # rename(tmp → path) did not; an orphaned tmp dir is also left behind
    os.rename(path, f"{path}.old-deadbeef")
    os.makedirs(f"{path}.merge-cafe")
    v2 = spark.createDataFrame([(2, "B", 21), (4, "d", 40)], ["id", "val", "score"])
    out = M.merge_stage_table(v2, base, "dim", keys=("id",))
    got = {r["id"]: (r["val"], r["score"]) for r in out.collect()}
    # ids 1/3 came back from the recovered trash dir
    assert got == {1: ("a", 10), 2: ("B", 21), 3: ("c", 30), 4: ("d", 40)}
    # leftovers garbage-collected
    assert not [d for d in os.listdir(base) if d.startswith("dim.")]


def test_overwrite_partitions_touches_only_incoming(spark, tmp_path):
    """Dynamic partition overwrite (S8): re-ingesting one day replaces that
    day's partition only; other partitions persist."""
    base = str(tmp_path / "stages")
    day1 = spark.createDataFrame(
        [("2026-01-01", 1, "x"), ("2026-01-01", 2, "y"), ("2026-01-02", 3, "z")],
        ["day", "id", "val"],
    )
    M.overwrite_partitions(day1, base, "events", partition_by=("day",))
    redo = spark.createDataFrame([("2026-01-02", 3, "Z!")], ["day", "id", "val"])
    out = M.overwrite_partitions(redo, base, "events", partition_by=("day",))
    # hive partition values are type-inferred on read (string day → date)
    rows1 = sorted(map(tuple, out.collect()))  # materialize pre-rewrite
    got = {(str(r[-1]), r[0]): r[1] for r in rows1}
    assert got == {("2026-01-01", 1): "x", ("2026-01-01", 2): "y", ("2026-01-02", 3): "Z!"}
    # re-run of the same batch is a no-op
    again = M.overwrite_partitions(redo, base, "events", partition_by=("day",))
    assert sorted(map(tuple, again.collect())) == rows1
