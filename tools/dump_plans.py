#!/usr/bin/env python
"""Regenerate BENCH/PLANS.md: formatted physical plans for the flagship
queries, with the scale-relevant plan properties called out.  Run after any
plan-affecting change; test_plans_physical pins the load-bearing properties
so drift fails CI, and this artifact makes them reviewable."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

SHOW = [
    ("top_unshipped_orders", "TPC-H Q3 analog: broadcast dim join + pushed date filters"),
    ("token_counts", "column pruning: 2 of 5 document columns reach the scan"),
    ("exact_dedup_groups", "map-side partial aggregation around one exchange"),
    ("revenue_rollup", "rollup lattice in one pass"),
    ("ann_topk", "projection before mapInPandas (scan prunes the unused columns)"),
    ("threshold_sweep", "r2: distributed sweep — 9-row grid broadcast against scored pairs, one grouped agg, no driver loop"),
    ("bpe_token_counts", "r2: regexp_extract_all token battery entirely inside whole-stage codegen"),
    ("gopher_quality", "r2: whole Gopher rule battery in ONE Project over a 2-column pruned scan — zero shuffle, zero UDF"),
    ("unigram_logprob", "r2: corpus LM filter — word-count shuffle once, corpus total via cheap global agg (no freq re-execution), vocab broadcast to the scoring join"),
    ("url_latest_capture", "r2: cross-snapshot URL dedup — canonicalization folded into ONE aggregation with map-side partial_max_by and a single exchange (SortAggregate: struct-ordered max_by isn't hash-aggregable; still no window, no global sort)"),
    ("line_dedup", "r2: line-frequency boilerplate filter — md5(line) agg, heavy-hitter anti-join (AQE broadcasts the small side at runtime), one doc-keyed regroup"),
    ("lm_quality_buckets", "r2: CCNet head/middle/tail split — scoring plan + ONE 1-row exact-percentile agg broadcast back; no global sort, no window"),
    ("remove_dup_spans", "r2: exact-substring dedup — slim (id,pos,16-hex) gram rows, map-side-combined count, LEFT SEMI dup join, per-row JVM excision lambdas (text never rides the shuffle)"),
    ("curation_funnel", "r2: composed pipeline funnel — five 1-row aggregates over successively filtered shared-scan branches; the only shuffles are the span-dedup gram count/semi-join and the final tiny group-bys"),
    ("bigram_logprob", "r2: interpolated bigram LM — pair explode + three map-side-combined count aggs assemble the LM table, which is BROADCAST back to the per-doc scoring join (no doc-side shuffle on gram keys)"),
    ("quality_classifier", "r2: model-based quality filter — ONE shuffle-free projection: weight array literal folded over each doc's grams via higher-order aggregate (no explode, no join, no Exchange); broadcast-join path kept for 2M-bucket models"),
    ("incremental_dedup", "r2: bloom-gated snapshot dedup — corpus read map-side into <=16 filter shards (no corpus shuffle), bloom-negative branch joins NOTHING, only the positive sliver reaches the exact verify join"),
    ("html_extract", "r2: WET-style HTML→text — the whole strip/unescape/normalize chain is ONE shuffle-free Project over the scan"),
    ("incremental_fuzzy_dedup", "r4: cross-snapshot near-dup flagging — when the corpus feature table fits the broadcast budget (columnar octet-length estimate, no Python pre-pass) the WHOLE count runs as ONE fused mapInPandas pass over the new side's raw text (shingle+sign+band, per-doc band buckets → unique candidates, vectorized signature gate, sorted-merge exact intersect) with the corpus broadcast — zero pair rows, zero feature shuffles (the one Exchange is the stage-width round-robin of the new side's slim (id,text) rows); over budget it falls back to the r2 shape (snapshot bands equi-join corpus bands, new×new structurally impossible, estimate prefilter + exact verify)"),
    ("minhash_lsh_pairs", "r4: MinHash-LSH self-join — ONE persisted sig+shingle feature pass per document (combined Arrow kernel: shift-add Mersenne mod, reduceat-blocked signatures), band explode + equi-join on (band, key) buckets, signature-agreement estimate gate, sorted-merge exact-Jaccard verify on survivors only; tiered two-phase pair assembly keeps per-pair shingle arrays off the band shuffle"),
    ("fuzzy_dedup_corpus", "r5/r6: full fuzzy dedup with the exact-duplicate PRE-COLLAPSE — distinct pairable texts collapse to a min-id representative FIRST (one hash agg), only representatives run the MinHash band/gate/verify tiers (pair volume drops from Σ n_f² to unique-text near-dup pairs), members re-attach by star edges unioned with the verified rep pairs, then distributed large-star/small-star CC (localCheckpoint-truncated rounds; the printed plan starts from the final assignment table) and the min-id representative choice; r6 adds the width-pinned pair-dedup exchange and the eager feature-table checkpoint shared with minhash_lsh_pairs"),
    ("semantic_dedup", "r3/r4: SemDeDup — ±1 sign-projection shards as one shuffle-free Project (index-select folds, no UDF), then ONE groupBy(bucket)-applyInArrow stage (zero-copy flatten + gather, no per-row Series) computing the entire per-cluster semantics in numpy (centroid, blocked cosine matmul with a reused buffer, min-label-prop CC, keep-least-central); single Exchange total, no persist, no join-backs; bucket size bounded only by n_planes sizing (auto-derived from a corpus count by default)"),
    ("semantic_dedup_multitable", "r5: multi-table SemDeDup — ONE mapInArrow pass computes all R tables' bucket codes (single V @ P.T for the concatenated plane matrix) and explodes to R (id,vec,bucket) rows; ONE groupBy(bucket)-applyInPandas stage emits threshold EDGES (pair volume, not corpus volume) deduplicated across tables; distributed large-star/small-star CC unions the per-table pair sets; tiny near-clique components regroup for the keep-least-central kernel while singletons take an id-only anti-join (their vectors never shuffle twice)"),
    ("cluster_modularity", "r3: Newman Q decomposition — edge list shuffles on community id only; m is a 1-row broadcast; no windows, no driver graph"),
    ("quality_roc", "r4: distributed ROC/PR — ONE map-side-combined agg quantizes probabilities to 64 buckets; the window cumsum runs over the 64-row bin table (single-partition sort of O(bins), never of the data); P/N totals are a 1-row broadcast cross join"),
    ("snapshot_curation", "r4: the composed 12-substage snapshot-curation chain as ONE lazy plan (WET extract → latest-capture → blocklist → Gopher → badwords → PII → span excision → exact+fuzzy dedup vs prior snapshot → CCNet buckets → mixture sample → packing → funnel); every substage's shuffles are the individually-audited shapes above — composition adds the cross-snapshot band join and the funnel's tiny 1-row aggs, nothing else"),
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    out = [
        "# Physical plans — flagship queries (auto-generated by tools/dump_plans.py)",
        "",
        "`spark.sql.adaptive` initial plans at sf0.001; the load-bearing",
        "properties (broadcast joins, pruned scans, pushed filters, partial",
        "aggs, single fused Python stage) are pinned by",
        "`tests/test_plans_physical.py` — this file is the reviewable form.",
        "",
    ]
    for name, why in SHOW:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # keep the operator tree + the scan details; drop the verbose
        # per-node field dumps beyond a budget
        lines = plan.splitlines()
        head = []
        for ln in lines:
            head.append(ln.rstrip())
            if len(head) > 120:
                head.append("… (truncated)")
                break
        out += [f"## {name}", "", f"*{why}*", "", "```", *head, "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
