#!/usr/bin/env python
"""Round-6 optimization harness (bench.py itself is FROZEN for measurement).

Per-query isolated measurement with the SAME session config and timing
protocol as bench.py (construct the DataFrame, .count() it), plus:

* --noop        : time df.write.format("noop") instead of .count() (guide §1.4)
  so the full column set is computed (count() lets Catalyst prune).
* --explain DIR : write .explain("formatted") for each query to DIR/<q>.txt.
* --repeat N    : N cold-ish repeats per query in ONE session (first repeat is
  the cold number comparable to bench.py sweep 1; later repeats approximate
  the steady sweep).
* --queries a,b : subset (default: bench.py's HEADLINE list).

Usage:
  python bench_extra.py --queries minhash_lsh_pairs,fuzzy_dedup_corpus --repeat 3
  python bench_extra.py --explain plans/r06 --suffix _before
"""

from __future__ import annotations

import argparse
import gc
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # frozen; reused for make_spark + HEADLINE so config matches

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else list(bench.HEADLINE)

    import __spark_entry__ as E

    spark = bench.make_spark(CPUS, "bench-extra-r6")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    # identical warmup to bench.py's bench_queries
    from pyspark.sql.functions import col, pandas_udf
    from pyspark.sql.functions import sum as _fsum
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _warm(s: pd.Series) -> pd.Series:
        import numpy  # noqa: F401

        return s

    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    spark.range(0, 100000, numPartitions=CPUS).select(
        _warm(col("id")).alias("w")
    ).agg(_fsum("w")).collect()

    out: dict[str, list[float]] = {}
    for name in names:
        if name == "er_dedup_pipeline":
            runs = []
            for _ in range(args.repeat):
                spark.sparkContext.setJobDescription(f"r6:{name}")
                r = bench.run_er_pipeline(spark)
                runs.append(round(r["sec"], 3))
                print(f"{name}: {runs[-1]}s (scoring {r['scoring_sec']:.2f}s)",
                      file=sys.stderr, flush=True)
            out[name] = runs
            continue
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
            df = None
            spark.catalog.clearCache()
            gc.collect()
            print(f"explained {name}", file=sys.stderr, flush=True)
            continue
        runs = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"r6:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.time() - t0, 3))
            df = None
            spark.catalog.clearCache()
            gc.collect()
            print(f"{name}: {runs[-1]}s", file=sys.stderr, flush=True)
        out[name] = runs
    spark.stop()
    line = json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "noop": args.noop,
                       "runs": out})
    print(line)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
