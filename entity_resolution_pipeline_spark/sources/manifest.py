"""Per-stage lineage manifest + resume protocol.

Replaces the reference's pickle-checkpoint zoo (utils.py:47-86 +
per-stage resume sets, pattern I3 in SURVEY.md §2.10) with a tiny parquet
manifest table: one row per (stage, partition) write, carrying status, row
count, timestamp, and free-form numeric metrics (e.g. dropped hot blocks).

Resume semantics: a stage whose manifest shows status='complete' is skipped
and its output table re-read; an interrupted stage re-runs (stage outputs
are written atomically via overwrite, so a half-written run is simply
replaced).  This is the Spark-native equivalent of "load state + skip
processed keys" — the anti-join happens at stage granularity because stage
outputs are immutable tables, not mutable dicts.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MANIFEST


def _manifest_path(base_dir: str) -> str:
    return os.path.join(base_dir, "_manifest")


def record_stage(
    spark: SparkSession,
    base_dir: str,
    stage: str,
    rows: int,
    metrics: dict[str, float] | None = None,
    status: str = "complete",
) -> None:
    """Append one lineage row for a finished stage write."""
    row = [
        (
            stage,
            -1,
            status,
            rows,
            dt.datetime.now(),
            {k: float(v) for k, v in (metrics or {}).items()},
        )
    ]
    spark.createDataFrame(row, MANIFEST).write.mode("append").parquet(
        _manifest_path(base_dir)
    )


def stage_complete(spark: SparkSession, base_dir: str, stage: str) -> bool:
    path = _manifest_path(base_dir)
    if not os.path.exists(path):
        return False
    mf = spark.read.parquet(path)
    return (
        mf.where((F.col("stage") == stage) & (F.col("status") == "complete")).limit(1).count()
        > 0
    )


def read_manifest(spark: SparkSession, base_dir: str) -> DataFrame:
    return spark.read.schema(MANIFEST).parquet(_manifest_path(base_dir))


def record_partitions(
    spark: SparkSession, base_dir: str, stage: str, df: DataFrame
) -> int:
    """Append one lineage row PER PARTITION of a stage output (north rule:
    per-partition lineage + metrics): (stage, partition_id, rows).  Returns
    the total row count (one pass computes both)."""
    import datetime as dt

    from pyspark.sql import functions as F

    per_part = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    now = dt.datetime.now()
    rows = [
        (stage, int(r["pid"]), "complete", int(r["rows"]), now, {})
        for r in per_part
    ]
    if rows:
        spark.createDataFrame(rows, MANIFEST).write.mode("append").parquet(
            _manifest_path(base_dir)
        )
    return sum(int(r["rows"]) for r in per_part)


def write_stage_table(
    df: DataFrame,
    base_dir: str,
    stage: str,
    metrics: dict[str, float] | None = None,
    bucket_by: tuple[str, ...] | None = None,
    num_buckets: int = 16,
) -> DataFrame:
    """Write a stage output table + per-partition lineage rows + the stage
    summary row; return the re-read DataFrame (so downstream plans read from
    parquet, truncating lineage — the batch equivalent of checkpointing).

    The summary row (partition_id = -1, status = 'complete') is written LAST:
    resume treats the stage as complete only when it exists, so an
    interrupted write — even one that produced some partition rows — re-runs.

    ``bucket_by``: hash-bucket the table on the given columns (Spark
    `bucketBy` + `sortBy`) and register it in the session catalog as
    ``erx_<stage>``.  Two tables bucketed on their join key with the same
    bucket count join with NO exchange on either side — the co-location
    lever for repeatedly-joined stage tables (pairs ⋈ record_field_hashes).
    The session catalog here is in-memory, so bucket METADATA lives for the
    session; production deployments point this at a persistent catalog
    (Hive metastore / Iceberg bucket partition transforms) for cross-job
    reuse.  The parquet files themselves are readable either way.
    """
    spark = df.sparkSession
    path = os.path.join(base_dir, stage)
    if bucket_by:
        table = f"erx_{stage}".replace("/", "_").replace("-", "_")
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", path)
            .bucketBy(num_buckets, *bucket_by)
            .sortBy(*bucket_by)
            .saveAsTable(table)
        )
        out = spark.table(table)
    else:
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
    total = record_partitions(spark, base_dir, f"{stage}/partitions", out)
    record_stage(spark, base_dir, stage, rows=total, metrics=metrics)
    return out


def read_stage_table(spark: SparkSession, base_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base_dir, stage))
