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


def _stage_report(evlog_dir: str, after_ms: float = 0) -> list[dict]:
    """Parse the Spark event log: per-stage wall, executor-cpu sum, GC sum,
    shuffle read/write, python-worker time (biggest stages first)."""
    import glob

    stages = {}
    paths = [
        p
        for p in glob.glob(os.path.join(evlog_dir, "**", "*"), recursive=True)
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        for line in open(path, errors="replace"):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if not isinstance(ev, dict):
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {"tasks": 0, "cpu_ms": 0, "gc_ms": 0,
                                             "run_ms": 0, "py_ms": 0,
                                             "shuf_r_mb": 0.0, "shuf_w_mb": 0.0})
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub and sub < after_ms:
                    stages.pop(sid, None)
                    continue
                st["name"] = si["Stage Name"].split("\n")[0][:60]
                st["wall_s"] = round((comp - sub) / 1e3, 2) if sub and comp else None
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, {"tasks": 0, "cpu_ms": 0, "gc_ms": 0,
                                             "run_ms": 0, "py_ms": 0,
                                             "shuf_r_mb": 0.0, "shuf_w_mb": 0.0})
                st["tasks"] += 1
                st["run_ms"] += tm.get("Executor Run Time", 0)
                st["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                st["gc_ms"] += tm.get("JVM GC Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                swm = tm.get("Shuffle Write Metrics") or {}
                st["shuf_r_mb"] += (srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)) / 1e6
                st["shuf_w_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
                for acc in ev.get("Task Info", {}).get("Accumulables", []):
                    if "pythonTotal" in str(acc.get("Name")):
                        try:
                            st["py_ms"] += int(acc.get("Update", 0))
                        except Exception:
                            pass
    out = sorted(stages.values(), key=lambda s: -(s.get("run_ms", 0)))
    return [s for s in out if s.get("run_ms", 0) > 500 and "name" in s][:12]


def run_level(cpus: int) -> dict:
    from entity_resolution_pipeline_spark import synth
    from entity_resolution_pipeline_spark.config import DEFAULT_CONFIG
    from entity_resolution_pipeline_spark.operators import blocking as B
    from entity_resolution_pipeline_spark.operators import classify as C
    from entity_resolution_pipeline_spark.operators import features as FE
    from entity_resolution_pipeline_spark.plans import pipeline as PL

    import shutil

    evdir = f"/tmp/spark-events-{cpus}-{os.getpid()}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    os.environ["SPARK_GRAFT_EVLOG"] = evdir
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
    predictions = PL.score_pairs(candidates, prep, model, cfg)
    t_featurize_call = time.time() - t1  # driver-serial staging + plan build
    staging = dict(FE.LAST_STAGING)

    t2 = time.time()
    predictions = predictions.persist()
    n_pred = predictions.count()
    t_job = time.time() - t2
    spark.stop()
    stage_rep = _stage_report(evdir, after_ms=t1 * 1000)

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
        "stages": stage_rep,
    }
    return out


def main() -> None:
    results = [run_level(c) for c in LEVELS]
    print(json.dumps({"profile": results}, indent=2))


if __name__ == "__main__":
    main()
