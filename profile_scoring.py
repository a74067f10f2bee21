#!/usr/bin/env python
"""Phase-level profile of the scoring job at two parallelism levels.

Splits the north-rule scoring window into (a) driver-serial staging
(vector-matrix collect + person-string broadcast) and (b) the parallel
featurize+score job, to locate the Amdahl terms behind the N-vs-4N
efficiency number.  Not part of the driver contract — a diagnostics tool.
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # reuse make_spark/_trained_model

N_RECORDS = int(os.environ.get("PROFILE_N", "40000"))
LEVELS = [int(x) for x in os.environ.get("PROFILE_LEVELS", "8,32").split(",")]


def run_level(cpus: int) -> dict:
    from entity_resolution_pipeline_spark import synth
    from entity_resolution_pipeline_spark.config import DEFAULT_CONFIG
    from entity_resolution_pipeline_spark.operators import blocking as B
    from entity_resolution_pipeline_spark.operators import classify as C
    from entity_resolution_pipeline_spark.operators import features as FE
    from entity_resolution_pipeline_spark.plans import pipeline as PL

    spark = bench.make_spark(cpus, f"profile-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    bench._MODEL_CACHE.clear()
    model = bench._trained_model(spark)
    # warm
    bench.run_er_pipeline(spark, n_records=2000, cpus=cpus)

    cfg = DEFAULT_CONFIG
    pages = synth.pages_df(spark, N_RECORDS, partitions=max(cpus, 8)).cache()
    pages.count()
    t0 = time.time()
    prep = PL.prepare(pages, cfg)
    membership = B.block_membership(prep.records, cfg.blocking)
    candidates = B.candidate_pairs(membership, cfg.blocking).persist()
    n_cand = candidates.count()
    t_prep = time.time() - t0

    t1 = time.time()
    features = PL.featurize_pairs(candidates, prep, cfg)
    t_featurize_call = time.time() - t1  # driver-serial staging + plan build
    staging = dict(FE.LAST_STAGING)

    t2 = time.time()
    predictions = C.score(features, model).persist()
    n_pred = predictions.count()
    t_job = time.time() - t2

    out = {
        "cpus": cpus,
        "n_records": N_RECORDS,
        "n_candidates": n_cand,
        "pairs_scored": n_pred,
        "prep_sec": round(t_prep, 2),
        "featurize_call_sec": round(t_featurize_call, 2),
        "staging": {k: round(v, 2) for k, v in staging.items()},
        "score_job_sec": round(t_job, 2),
        "scoring_total_sec": round(t_featurize_call + t_job, 2),
        "pairs_per_sec": round(n_pred / (t_featurize_call + t_job), 1),
    }
    spark.stop()
    return out


def main() -> None:
    results = [run_level(c) for c in LEVELS]
    print(json.dumps({"profile": results}, indent=2))


if __name__ == "__main__":
    main()
