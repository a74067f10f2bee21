#!/usr/bin/env python
"""Profile the curation chain's fuzzy_vs_prior substage in isolation at N vs
4N cores (r4 verdict ask #3: the substage scaled 0.70 alone at the 8-replica
corpus and the composed chain 0.55-0.58).

Three measurements on the IDENTICAL inputs:

1. ``spark``: the substage exactly as the chain runs it —
   ``fuzzy_flags_against_corpus`` (broadcast fused-kernel path at this corpus
   size) + the left-semi join + the localCheckpoint pin, at local[N] and
   local[4N].  This is the number the chain's per-substage split reports.
2. ``spark_nopin``: same minus the checkpoint pin (plain count over the
   flags), separating the kernel from the pin's write barrier.
3. ``raw``: the kernel arithmetic (shingle -> sigs -> band probe -> estimate
   gate -> reduceat exact verify) on the SAME rows via plain
   multiprocessing.Pool at N and 4N processes — no Spark, no Arrow, no JVM.
   This is the hardware envelope: if raw itself scales ~0.7 at 8->32 procs
   on this box, the substage's floor is the one-socket memory bus (the
   SemDeDup envelope argument), not the plan.

Inputs are generated once at 32 cores (the same 8-replica corpus + chain
prefix the bench uses) and parqueted to /dev/shm so generation never
pollutes timing.  Usage: ``python tools/profile_fuzzy.py [--json out.json]``.
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_CURATION_REPLICAS.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))


def _gen_inputs(work: str) -> dict:
    """Build the 8-replica corpus, run the chain prefix (clean + exact) at
    full width, write the fuzzy substage's two inputs to parquet."""
    from pyspark.sql import functions as F

    from __spark_entry__ import _curate_cfg, _curate_pages
    from bench import CPUS, CURATION_REPLICAS, SF_DIR, make_spark
    from entity_resolution_pipeline_spark.plans.curation import (
        build_clean_snapshot,
        s_dedup_exact,
    )

    cfg = _curate_cfg()
    spark = make_spark(CPUS, "profile-fuzzy-gen")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    toks = F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+")
    reps = []
    for i in range(CURATION_REPLICAS):
        txt = (
            F.col("text")
            if i == 0
            else F.concat_ws(
                " ", F.transform(toks, lambda t: F.concat(F.lit(f"r{i}~"), t))
            )
        )
        reps.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                txt.alias("text"),
            )
        )
    docs = reps[0]
    for r in reps[1:]:
        docs = docs.unionAll(r)
    pages = _curate_pages(docs)
    new_pages = pages.where(F.col("k") % 7 != 0).drop("k")
    prior_pages = pages.where(F.col("k") % 7 == 0).drop("k")
    prior_clean = build_clean_snapshot(prior_pages, cfg, funnel=False)[
        "clean"
    ].select("doc_id", "clean_text")
    clean = build_clean_snapshot(new_pages, cfg)["clean"]
    exact = s_dedup_exact(clean, prior_clean, cfg)
    exact.select("doc_id", "clean_text").write.parquet(os.path.join(work, "new"))
    prior_clean.write.parquet(os.path.join(work, "prior"))
    n_new = spark.read.parquet(os.path.join(work, "new")).count()
    n_prior = spark.read.parquet(os.path.join(work, "prior")).count()
    spark.stop()
    return {"n_new": n_new, "n_prior": n_prior, "threshold": cfg.fuzzy_threshold}


def _spark_leg(work: str, cpus: int, threshold: float, pin: bool) -> list[float]:
    from pyspark.sql import functions as F

    from bench import make_spark
    from entity_resolution_pipeline_spark.operators.dedup import (
        fuzzy_flags_against_corpus,
    )

    spark = make_spark(cpus, f"profile-fuzzy-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    new = spark.read.parquet(os.path.join(work, "new"))
    prior = spark.read.parquet(os.path.join(work, "prior"))

    def run() -> None:
        flags = fuzzy_flags_against_corpus(
            new, prior, text_col="clean_text", threshold=threshold
        ).where(F.col("kept") == 1)
        if pin:
            out = new.join(flags.select("doc_id"), "doc_id", "left_semi")
            pinned = out.localCheckpoint(eager=True)
            pinned.count()
        else:
            flags.count()

    run()  # warmup: JIT, Python worker pool, broadcast build
    gc.collect()
    walls = []
    for _ in range(REPEATS):
        spark.catalog.clearCache()
        gc.collect()
        t0 = time.time()
        run()
        walls.append(round(time.time() - t0, 2))
    spark.stop()
    return walls


# ---- raw multiprocessing envelope -----------------------------------------
# Module-level state so fork()ed workers inherit the corpus features without
# per-task pickling (mirrors Spark's broadcast semantics).
_G: dict = {}


def _raw_init(sigs, flat, offs, lens, packed, floor, threshold, nh, k):
    _G.update(
        SIGS=sigs, FLAT=flat, OFFS=offs, LENS=lens, BKT=packed,
        FLOOR=floor, THRESH=threshold, NH=nh, K=k,
    )


def _raw_chunk(texts: list[str]) -> int:
    from entity_resolution_pipeline_spark.functions.minhash import (
        _coeffs,
        _sigs_batched,
        band_keys,
        shingle_set,
    )

    nh, k = _G["NH"], _G["K"]
    ca, cb = _coeffs(nh)
    sigs_m, flat_all, offs_all, lens_all = (
        _G["SIGS"], _G["FLAT"], _G["OFFS"], _G["LENS"],
    )
    bkt, floor, threshold = _G["BKT"], _G["FLOOR"], _G["THRESH"]
    denom = float(nh)
    sets = [
        shingle_set(t, k) if t else np.empty(0, dtype=np.uint64) for t in texts
    ]
    sigs = _sigs_batched(sets, ca, cb, nh)
    n_matched = 0
    for sig, sh_u in zip(sigs, sets):
        sig_a = np.asarray(sig, dtype=np.int64)
        keys = band_keys(sig_a, 16)
        sig32 = sig_a.astype(np.uint32)
        hits = [bkt[kk] for kk in keys if kk in bkt]
        if not hits:
            continue
        rids = np.unique(np.concatenate(hits))
        est = (sigs_m[rids] == sig32[None, :]).sum(axis=1) / denom
        sur = rids[est >= floor]
        if not len(sur):
            continue
        a = sh_u.astype(np.int64)
        la = len(a)
        lens = lens_all[sur]
        flat = np.concatenate(
            [flat_all[offs_all[ri]: offs_all[ri] + lens_all[ri]] for ri in sur]
        )
        idx = np.searchsorted(a, flat)
        np.clip(idx, 0, max(la - 1, 0), out=idx)
        mask = (a[idx] == flat) if la else np.zeros(len(flat), dtype=bool)
        offs = np.zeros(len(sur), dtype=np.intp)
        np.cumsum(lens[:-1], out=offs[1:])
        cs = np.add.reduceat(mask, offs) if len(flat) else np.zeros(len(sur))
        jac = cs / (la + lens - cs)
        if np.count_nonzero(jac >= threshold):
            n_matched += 1
    return n_matched


def _raw_leg(texts: list[str], corpus_texts: list[str], threshold: float,
             procs: int, n_chunks: int) -> tuple[list[float], int]:
    import multiprocessing as mp

    from entity_resolution_pipeline_spark.functions.minhash import (
        _coeffs,
        _sigs_batched,
        band_keys,
        shingle_set,
    )
    from entity_resolution_pipeline_spark.operators.dedup import _est_floor

    nh, k, bands = 64, 5, 16
    ca, cb = _coeffs(nh)
    csets = [
        shingle_set(t, k) if t else np.empty(0, dtype=np.uint64)
        for t in corpus_texts
    ]
    # uint32-truncated to mirror the operator's estimate gate (equality-
    # only test; see fuzzy_flags_against_corpus)
    sigs = np.asarray(_sigs_batched(csets, ca, cb, nh), dtype=np.int64).astype(
        np.uint32
    )
    sigs_full = np.asarray(_sigs_batched(csets, ca, cb, nh), dtype=np.int64)
    lens = np.array([len(s) for s in csets], dtype=np.int64)
    offs = np.zeros(len(csets), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    flat = (
        np.concatenate([s.astype(np.int64) for s in csets])
        if csets
        else np.empty(0, dtype=np.int64)
    )
    buckets: dict[str, list[int]] = {}
    for i in range(len(csets)):
        for bkey in band_keys(sigs_full[i], bands):
            buckets.setdefault(bkey, []).append(i)
    packed = {kk: np.array(v, dtype=np.intp) for kk, v in buckets.items()}
    floor = _est_floor(threshold, nh)
    chunks = [list(c) for c in np.array_split(np.array(texts, dtype=object), n_chunks)]
    ctx = mp.get_context("fork")
    walls = []
    total = 0
    with ctx.Pool(
        procs,
        initializer=_raw_init,
        initargs=(sigs, flat, offs, lens, packed, floor, threshold, nh, k),
    ) as pool:
        pool.map(_raw_chunk, chunks[: max(procs, 4)])  # warmup
        for _ in range(REPEATS):
            t0 = time.time()
            res = pool.map(_raw_chunk, chunks)
            walls.append(round(time.time() - t0, 2))
            total = sum(res)
    return walls, total


def main() -> None:
    from bench import CPUS

    json_path = None
    if "--json" in sys.argv:
        json_path = sys.argv[sys.argv.index("--json") + 1]
    work = tempfile.mkdtemp(
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        prefix="erx-fuzzyprof-",
    )
    out: dict = {"repeats": REPEATS}
    try:
        out["inputs"] = _gen_inputs(work)
        thr = out["inputs"]["threshold"]
        n_small = max(CPUS // 4, 1)
        for mode, pin in (("spark_pinned", True), ("spark_nopin", False)):
            out[mode] = {}
            for label, cpus in (("N", n_small), ("4N", CPUS)):
                walls = _spark_leg(work, cpus, thr, pin)
                out[mode][label] = {"cpus": cpus, "walls_sec": walls}
                print(f"{mode} {label} ({cpus} cores): {walls}", flush=True)
            eff = (
                min(out[mode]["N"]["walls_sec"])
                / min(out[mode]["4N"]["walls_sec"])
                / (CPUS / n_small)
            )
            out[mode]["scaling_efficiency"] = round(eff, 4)
            print(f"{mode} efficiency: {eff:.3f}", flush=True)

        # raw envelope on the same rows
        import duckdb

        new_txt = [
            r[0]
            for r in duckdb.sql(
                f"SELECT clean_text FROM read_parquet('{work}/new/*.parquet')"
            ).fetchall()
        ]
        prior_txt = [
            r[0]
            for r in duckdb.sql(
                f"SELECT clean_text FROM read_parquet('{work}/prior/*.parquet')"
            ).fetchall()
        ]
        out["raw"] = {}
        counts = {}
        for label, procs in (("N", n_small), ("4N", CPUS)):
            walls, total = _raw_leg(new_txt, prior_txt, thr, procs, n_chunks=CPUS * 4)
            out["raw"][label] = {"procs": procs, "walls_sec": walls}
            counts[label] = total
            print(f"raw {label} ({procs} procs): {walls} matched={total}", flush=True)
        assert counts["N"] == counts["4N"], "raw legs diverged"
        out["raw"]["n_matched"] = counts["N"]
        eff = (
            min(out["raw"]["N"]["walls_sec"])
            / min(out["raw"]["4N"]["walls_sec"])
            / (CPUS / n_small)
        )
        out["raw"]["scaling_efficiency"] = round(eff, 4)
        print(f"raw efficiency: {eff:.3f}", flush=True)
        print(json.dumps(out))
        if json_path:
            with open(json_path, "w") as f:
                json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
