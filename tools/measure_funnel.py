"""One-off measurement: curation_funnel persisted vs recomputed.

Runs the bench's exact funnel fixture at sf0.1 (5k docs) and at a 10x
replica (50k docs), timing storage_level=None vs MEMORY_AND_DISK, n
repeats each, and prints the medians.  Supports the r4 decision to drop
the r3 in-operator persists (VERDICT r3 "What's wrong" #1).

Usage: python tools/measure_funnel.py [repeats]
"""
import statistics
import sys
import time

from pyspark import StorageLevel
from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")
from __spark_entry__ import _FUNNEL_FOOTER, _FUNNEL_PAGE, _read  # noqa: E402
from entity_resolution_pipeline_spark.operators.webtext import (  # noqa: E402
    curation_funnel,
)

REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def build_input(spark, sf_dir, replicas):
    docs = _read(spark, sf_dir, "documents")
    if replicas > 1:
        rep = spark.range(replicas).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(rep).select(
            (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
            # vary the text per replica so dedup stages stay non-trivial
            F.concat(F.col("text"), F.lit(" r"), F.col("rep")).alias("text"),
        )
    prepped = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 13 == 1, F.lit(_FUNNEL_PAGE)).otherwise(
                F.coalesce(F.col("text"), F.lit(""))
            ),
            F.lit(" " + _FUNNEL_FOOTER),
        ).alias("text"),
    )
    return prepped


def run_once(spark, prepped, level):
    t0 = time.time()
    out = curation_funnel(
        prepped, badwords=("dup",), k=8, min_count=2, storage_level=level
    )
    rows = out.collect()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt, sorted((r["stage"], r["n_docs"], r["n_tokens"]) for r in rows)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("measure_funnel")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for label, replicas in (("sf0.1 (5k docs)", 1), ("10x (50k docs)", 10)):
        prepped = build_input(spark, "/root/testdata/sf0.1", replicas)
        prepped.count()  # warm the scan
        results = {}
        for name, level in (
            ("recompute", None),
            ("persist", StorageLevel.MEMORY_AND_DISK),
        ):
            times, ref = [], None
            for _ in range(REPEATS):
                dt, rows = run_once(spark, prepped, level)
                times.append(dt)
                if ref is None:
                    ref = rows
                assert rows == ref, "nondeterministic funnel output!"
            results[name] = (statistics.median(times), times, ref)
        same = results["recompute"][2] == results["persist"][2]
        print(f"\n== {label} ==  outputs identical: {same}")
        for name, (med, times, _) in results.items():
            print(f"  {name:10s} median {med:6.2f}s  runs {['%.2f' % t for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
