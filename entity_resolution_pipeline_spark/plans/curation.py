"""Resumable end-to-end snapshot-curation stage.

Composes the individually-oracled webtext operators into the ONE job a
training-data team actually runs per crawl snapshot (the Dolma/RefinedWeb/
CCNet shape):

    raw captures (url, warc_ts, html, text)
      -> html_to_text            (WET extraction, shuffle-free)
      -> latest_capture          (cross-snapshot URL dedup, one max_by agg)
      -> blocklist_filter        (C4 URL blocklist, broadcast suffix join)
      -> gopher_quality          (rule battery, zero shuffle)
      -> badwords_filter + PII redaction
      -> remove_dup_spans        (exact-substring excision, Lee et al. 2021)
      -> incremental exact dedup vs the PRIOR snapshot (broadcast Bloom)
      -> incremental fuzzy dedup vs the PRIOR snapshot (cross-band MinHash)
      -> lm_quality_buckets      (CCNet head/middle/tail, no global sort)
      -> stratified_sample       (deterministic mixture rates per bucket)
      -> pack_sequences          (token-budget chunks)
      -> MERGE into the corpus table (sources/manifest.merge_stage_table)

Reference parity: this is the Spark re-expression of the reference's staged
pipeline driver (/root/reference/src/pipeline.py:66-120 stage sequence +
utils.py:47-86 checkpoint/resume, patterns I3/S7 in SURVEY.md §2.10) applied
to the webtext battery instead of the ER battery: every substage writes its
output table plus per-partition manifest lineage rows, the summary row lands
LAST, and a resumed run skips manifest-complete substages and re-reads their
tables — so a killed run resumes mid-pipeline and reproduces the
uninterrupted output exactly (tests/test_curation.py pins this bit-for-bit).

Scale notes (100 TB): the chain adds NO plan shape beyond its constituent
operators — each substage's physical plan is audited in its own docstring
(webtext.py / dedup.py).  Materializing between substages is the checkpoint
pattern, not a performance tax: stage tables truncate lineage exactly where
an executor loss would otherwise recompute the whole chain, and the
expensive corpus passes (span grams, MinHash signatures) run once per stage
table instead of once per downstream consumer.  The only driver-side state
is the Bloom filter bytes (m_bits/8) and the funnel report rows.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for one snapshot-curation run (defaults mirror the published
    pipelines: Gopher's rule bounds, C4's badword drop, CCNet's bucket
    split; rates/budget are fixture-sized — production overrides them)."""

    blocked_domains: tuple[str, ...] = ()
    badwords: tuple[str, ...] = ()
    gopher: dict = field(default_factory=dict)  # kwargs for gopher_quality
    span_k: int = 8
    span_min_count: int = 2
    fuzzy_threshold: float = 0.5
    bloom_m_bits: int = 1 << 23
    bucket_rates: tuple = (("head", 1.0), ("middle", 0.5), ("tail", 0.2))
    pack_budget_tokens: int = 400


# --------------------------------------------------------------- substages
#
# Each substage is a pure DataFrame -> DataFrame builder so the SAME code
# runs (a) materialized per-stage under the manifest protocol (run_curation)
# and (b) as one in-memory lineage for the DuckDB full-chain oracle
# (__spark_entry__.q_snapshot_curation).  Column contract between stages is
# documented per function.


def s_extract(pages: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """(url, warc_ts, html[, text]) -> (url, warc_ts, text, *keep).

    WET-style extraction of the html column (binary or string); rows with
    NULL html fall back to the pre-extracted text column when present
    (Common-Crawl WET records), else empty."""
    from ..operators.webtext import html_to_text

    extracted = html_to_text(pages, html_col="html", out_col="__xt")
    fallback = (
        F.coalesce(F.col("text"), F.lit(""))
        if "text" in pages.columns
        else F.lit("")
    )
    text = F.when(F.col("html").isNull(), fallback).otherwise(F.col("__xt"))
    return extracted.select(
        "url", "warc_ts", text.alias("text"), *[F.col(c) for c in keep]
    )


def s_latest(extracted: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Keep the latest capture per canonical URL.  Output:
    (doc_id = canonical_url, n_captures, latest_ts, url, text, *keep)."""
    from ..operators.webtext import latest_capture

    out = latest_capture(
        extracted, url_col="url", ts_col="warc_ts", keep_cols=("text",) + keep
    )
    return out.select(
        F.col("canonical_url").alias("doc_id"),
        "n_captures",
        "latest_ts",
        "url",
        "text",
        *[F.col(c) for c in keep],
    )


def s_quality(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """URL blocklist -> Gopher rule gate -> badwords gate -> PII redaction.
    All row-local filters, fused into one substage (one stage table, zero
    extra shuffles).  Output: survivors as (doc_id, url, text) with text
    PII-redacted, plus the per-gate funnel columns the report reads."""
    from ..operators.webtext import (
        badwords_filter,
        blocklist_filter,
        gopher_quality,
        redact_pii,
    )

    cur = docs
    if cfg.blocked_domains:
        cur = blocklist_filter(
            cur, list(cfg.blocked_domains), url_col="url", keep=True
        ).drop("host", "blocked")
    gate = gopher_quality(cur, **cfg.gopher).where(F.col("passes") == 1)
    cur = cur.join(gate.select("doc_id"), "doc_id", "left_semi")
    if cfg.badwords:
        ok = badwords_filter(cur, list(cfg.badwords)).where(F.col("kept") == 1)
        cur = cur.join(ok.select("doc_id"), "doc_id", "left_semi")
    return redact_pii(cur).select("doc_id", "url", "text")


def s_blocklist_only(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Blocklist survivors alone (used by the funnel report to count the
    blocklist gate separately from the Gopher/badwords gates)."""
    from ..operators.webtext import blocklist_filter

    if not cfg.blocked_domains:
        return docs
    return blocklist_filter(
        docs, list(cfg.blocked_domains), url_col="url", keep=True
    ).drop("host", "blocked")


def s_gopher_only(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    from ..operators.webtext import gopher_quality

    gate = gopher_quality(docs, **cfg.gopher).where(F.col("passes") == 1)
    return docs.join(gate.select("doc_id"), "doc_id", "left_semi")


def s_spans(quality: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Exact-substring span excision over the survivor corpus; documents
    reduced to nothing (pure boilerplate) drop out.  Output:
    (doc_id, url, n_tokens, n_clean_tokens, clean_text)."""
    from ..operators.webtext import remove_dup_spans

    cleaned = remove_dup_spans(
        quality, k=cfg.span_k, min_count=cfg.span_min_count
    ).withColumn(
        "n_clean_tokens", (F.col("n_tokens") - F.col("n_removed")).cast("long")
    )
    return (
        cleaned.where(F.col("n_clean_tokens") > 0)
        .join(quality.select("doc_id", "url"), "doc_id")
        .select("doc_id", "url", "n_tokens", "n_clean_tokens", "clean_text")
    )


def s_dedup_exact(
    clean: DataFrame,
    prior_clean: DataFrame | None,
    cfg: CurationConfig,
    bloom_bytes: bytes | None = None,
) -> DataFrame:
    """Exact dedup vs the prior snapshot's clean corpus via the broadcast
    Bloom path (no corpus shuffle, no new x corpus join).  prior=None (first
    snapshot) keeps everything.  `bloom_bytes`: optionally a prebuilt
    corpus filter (the overlapped builder computes it on the prior-side
    thread, off the critical path)."""
    if prior_clean is None:
        return clean
    from ..operators.dedup import incremental_dedup

    flags = incremental_dedup(
        clean,
        prior_clean,
        text_col="clean_text",
        m_bits=cfg.bloom_m_bits,
        bloom_bytes=bloom_bytes,
    ).where(F.col("kept") == 1)
    return clean.join(flags.select("doc_id"), "doc_id", "left_semi")


def s_dedup_fuzzy(
    clean: DataFrame,
    prior_clean: DataFrame | None,
    cfg: CurationConfig,
    corpus_artifact=None,
) -> DataFrame:
    """Near-dup dedup vs the prior snapshot: cross-table MinHash band join
    only (no new x new / prior x prior pairs), exact-Jaccard verified.
    `corpus_artifact`: optionally the prebuilt broadcast-kernel corpus
    structures (build_fuzzy_corpus_artifact), same thread story as the
    exact stage's bloom."""
    if prior_clean is None:
        return clean
    from ..operators.webtext import incremental_fuzzy_dedup

    flags = incremental_fuzzy_dedup(
        clean,
        prior_clean,
        text_col="clean_text",
        threshold=cfg.fuzzy_threshold,
        corpus_artifact=corpus_artifact,
    ).where(F.col("kept") == 1)
    return clean.join(flags.select("doc_id"), "doc_id", "left_semi")


def s_buckets(deduped: DataFrame) -> DataFrame:
    """CCNet head/middle/tail LM-quality bucketing of the surviving corpus
    (percentile cut points from one 1-row agg, no global sort).  Output:
    deduped columns + (bucket, avg_logprob)."""
    from ..operators.webtext import lm_quality_buckets

    b = lm_quality_buckets(deduped, text_col="clean_text").select(
        "doc_id", "avg_logprob", "bucket"
    )
    return deduped.join(b, "doc_id")


def s_sample(bucketed: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Deterministic mixture sampling by bucket (per-id md5 uniform — the
    kept set is identical at any parallelism / in any engine)."""
    from ..operators.webtext import stratified_sample

    return stratified_sample(
        bucketed, dict(cfg.bucket_rates), strata_col="bucket"
    )


def s_pack(sampled: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Token-budget packing of the final kept set, chunked within each
    quality bucket in doc_id order.  Output: (bucket, chunk_id, n_docs,
    chunk_tokens)."""
    from ..operators.webtext import pack_sequences

    return pack_sequences(
        sampled,
        budget_tokens=cfg.pack_budget_tokens,
        by="bucket",
        text_col="clean_text",
    )


# ------------------------------------------------------------ funnel report

def _id_checksum(col) -> F.Column:
    """Engine-portable 32-bit id hash summed over the group: pins the kept
    SET at each funnel stage, not just its size (DuckDB replays the same
    md5-prefix arithmetic)."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.coalesce(
        F.sum(
            F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
                "long"
            )
        ),
        F.lit(0),
    ).cast("long")


def _n_tokens_col(text_col: str) -> F.Column:
    from ..operators.webtext import _tokens

    return F.size(_tokens(text_col)).cast("long")


def funnel_rows(stages: list[tuple[int, str, DataFrame, str, F.Column]]) -> DataFrame:
    """Union of one summary row per stage: (stage, stage_name, n_docs,
    n_tokens, id_checksum).  `stages` entries are (index, name, frame,
    id_col, token_expr)."""
    out = None
    for i, name, df, id_col, tok in stages:
        row = df.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum(tok), F.lit(0)).cast("long").alias("n_tokens"),
            _id_checksum(id_col).alias("id_checksum"),
        ).select(
            F.lit(i).alias("stage"),
            F.lit(name).alias("stage_name"),
            "n_docs",
            "n_tokens",
            "id_checksum",
        )
        out = row if out is None else out.unionAll(row)
    return out


def _pin(
    df: DataFrame, timings: dict | None = None, name: str | None = None
) -> DataFrame:
    """Materialize a shared frame AND truncate its logical plan
    (localCheckpoint, not persist): the funnel unions one aggregate per
    stage, so without truncation each branch would re-carry the entire
    upstream lineage — ten copies of the chain in one plan tree, which
    blows up Catalyst's plan-string/codegen long before any data moves.
    In the CLI path the stage TABLES play this role (read-back after
    write_stage_table); _pin is the in-memory equivalent for the
    oracle/test path.  When `timings` is given, the eager materialization
    wall (this substage's incremental cost since the previous pin) is
    accumulated under `name` — the per-substage split bench.py
    --curation-scaling reports."""
    import time as _time

    t0 = _time.time()
    out = df.localCheckpoint(eager=True)
    if timings is not None and name is not None:
        timings[name] = timings.get(name, 0.0) + _time.time() - t0
    return out


def build_clean_snapshot(
    pages: DataFrame,
    cfg: CurationConfig,
    persist: bool = True,
    timings: dict | None = None,
    funnel: bool = True,
) -> dict[str, DataFrame]:
    """Substages extract -> latest -> quality -> spans as one in-memory
    lineage (the oracle/testing path; run_curation materializes the same
    substages to stage tables instead).  Frames consumed by more than one
    downstream (latest, quality, clean) are pinned (_pin) so the funnel's
    multi-consumer aggregates evaluate each expensive subtree once.

    With `funnel=True` (default) the three row-local gates (blocklist,
    Gopher, badwords) are computed as FLAG COLUMNS during the latest pin's
    one corpus pass: the funnel's per-gate survivor frames and the quality
    gate itself become cheap filters over the pinned flags instead of
    re-running the tokenize/rule battery per consumer (previously 3 full
    battery evaluations per snapshot — at corpus scale, 3 scans -> 1).
    Row-local gates commute, so "gopher applied to blocklist survivors"
    equals the flag conjunction and every funnel row is value-identical.
    `funnel=False` (the PRIOR-snapshot path, which only feeds the dedup
    stages) skips the flag columns AND the latest pin — extract->latest->
    quality evaluates once inside the quality pin, and the per-gate frames
    fall back to the recompute builders (correct, just not pre-paid)."""
    from ..operators.webtext import (
        badwords_count_col,
        blocklist_filter,
        gopher_passes_col,
        redact_pii,
    )

    from ..config import ensure_min_width

    frames: dict[str, DataFrame] = {}
    # minimum-width guard on the chain input: the WET-extraction regex
    # chain, the gate flag battery, and everything before the first
    # exchange are heavy row-local expressions; a single-split page scan
    # (tiny fixture parquet) would run them all on one core.  No-op at
    # corpus scale (see config.ensure_min_width).
    frames["extracted"] = s_extract(ensure_min_width(pages))
    if not funnel:
        latest = s_latest(frames["extracted"])
        frames["latest"] = latest
        frames["blocklist"] = s_blocklist_only(
            latest.select("doc_id", "url", "text"), cfg
        )
        frames["gopher"] = s_gopher_only(frames["blocklist"], cfg)
        quality = s_quality(latest.select("doc_id", "url", "text"), cfg)
    else:
        # Gate flags are computed on the PRE-latest capture rows and ride
        # the latest-capture max_by struct (keep=): the flags are row-local
        # functions of (url, text), so the kept row's flags computed before
        # the agg equal the flags computed on the kept row after it — but
        # before the agg they evaluate at the SCAN's full width, while
        # after it they ran on the agg output, which AQE's byte-based
        # coalescing squeezes to 1-2 partitions at small shuffle sizes
        # (measured: the whole tokenize/rule battery on one core inside the
        # extract+latest pin).  Costs flag evaluation per capture instead
        # of per kept URL (~the capture dup factor) and 3 small ints on the
        # shuffle — the right trade at every scale.
        ext = frames["extracted"]
        if cfg.blocked_domains:
            # keep=False: adds the 0/1 `blocked` column map-side (both
            # physical shapes compose onto this same scan — no extra pass)
            ext = blocklist_filter(
                ext, list(cfg.blocked_domains), url_col="url", keep=False
            ).drop("host")
        else:
            ext = ext.withColumn("blocked", F.lit(0))
        ext = ext.withColumn(
            "__gopher", gopher_passes_col("text", **cfg.gopher)
        ).withColumn(
            "__badok",
            (badwords_count_col("text", list(cfg.badwords)) == 0).cast("int"),
        )
        flagged = s_latest(ext, keep=("blocked", "__gopher", "__badok"))
        if persist:
            flagged = _pin(flagged, timings, "extract+latest")
        gates = ["blocked", "__gopher", "__badok"]
        frames["latest"] = flagged.drop(*gates)
        frames["blocklist"] = flagged.where(F.col("blocked") == 0).drop(*gates)
        frames["gopher"] = flagged.where(
            (F.col("blocked") == 0) & (F.col("__gopher") == 1)
        ).drop(*gates)
        survivors = flagged.where(
            (F.col("blocked") == 0)
            & (F.col("__gopher") == 1)
            & (F.col("__badok") == 1)
        ).select("doc_id", "url", "text")
        quality = redact_pii(survivors).select("doc_id", "url", "text")
    # On the fused (funnel=True) path `quality` is a row-local filter +
    # regex projection over the already-pinned flag frame, so a second
    # eager pin here bought only the avoidance of re-streaming that cheap
    # projection per consumer — one whole sequential materialization
    # barrier for ~a regex pass.  Re-streaming is the documented
    # recompute-vs-materialize rule (BENCH/BASELINE.md finding 3); the
    # un-fused prior-side path (funnel=False) keeps the pin, since there
    # `quality` carries the whole extract→latest lineage.
    if persist and not funnel:
        quality = _pin(quality, timings, "quality")
    frames["quality"] = quality
    clean = s_spans(quality, cfg)
    if persist:
        clean = _pin(clean, timings, "spans")
    frames["clean"] = clean
    return frames


def curate_snapshot_frames(
    pages: DataFrame,
    prior_clean: DataFrame | None,
    cfg: CurationConfig,
    persist: bool = True,
    timings: dict | None = None,
) -> dict[str, DataFrame]:
    """The full chain, in memory, returning every stage frame (shared by the
    contract query and tests; the CLI materializes between stages)."""
    frames = build_clean_snapshot(pages, cfg, persist=persist, timings=timings)
    return _dedup_tail_frames(frames, prior_clean, cfg, persist, timings)


def _dedup_tail_frames(
    frames: dict[str, DataFrame],
    prior_clean: DataFrame | None,
    cfg: CurationConfig,
    persist: bool = True,
    timings: dict | None = None,
    bloom_bytes: bytes | None = None,
    fuzzy_artifact=None,
) -> dict[str, DataFrame]:
    """The post-clean tail of the chain (dedup vs prior → buckets → sample →
    pack), shared by the sequential and the overlapped builders.
    bloom_bytes/fuzzy_artifact: prior-side dedup artifacts optionally
    prebuilt off the critical path (curate_snapshot_overlapped)."""
    exact = s_dedup_exact(frames["clean"], prior_clean, cfg, bloom_bytes=bloom_bytes)
    if persist and prior_clean is not None:
        exact = _pin(exact, timings, "exact_vs_prior")
    frames["exact"] = exact
    fuzzy = s_dedup_fuzzy(exact, prior_clean, cfg, corpus_artifact=fuzzy_artifact)
    if persist and prior_clean is not None:
        fuzzy = _pin(fuzzy, timings, "fuzzy_vs_prior")
    frames["fuzzy"] = fuzzy
    # buckets has exactly ONE downstream consumer (the sampled pin; the
    # funnel has no buckets row), so pinning it bought nothing: the sampled
    # pin below materializes the bucket lineage (percentile agg + join)
    # exactly once either way, and the extra eager materialization was one
    # whole sequential job per snapshot (measured 0.5-1.4 s at sf0.1; at
    # corpus scale a full extra pass over the surviving corpus).
    bucketed = s_buckets(fuzzy)
    frames["buckets"] = bucketed
    sampled = s_sample(bucketed, cfg)
    if persist:
        sampled = _pin(sampled, timings, "sampled")
    frames["sampled"] = sampled
    frames["chunks"] = s_pack(sampled, cfg)
    return frames


def curate_snapshot_overlapped(
    new_pages: DataFrame,
    prior_pages: DataFrame,
    cfg: CurationConfig,
    timings: dict | None = None,
) -> dict[str, DataFrame]:
    """curate_snapshot_frames with the PRIOR snapshot's cleaning chain built
    in a background thread (guide-style independent-job overlap): the prior
    side's extract→quality→spans pins are data-independent of the new
    side's until the exact-dedup stage, so its eager materializations run
    while the new side's pins execute instead of serializing in front of
    them.  Spark's scheduler interleaves the two job streams (FIFO
    back-fill); frames and values are identical to the sequential builder —
    only job *submission* order changes, and every pin is still
    materialized exactly once."""
    from concurrent.futures import ThreadPoolExecutor

    def _build_prior():
        prior_clean = build_clean_snapshot(
            prior_pages, cfg, funnel=False, timings=timings
        )["clean"].select("doc_id", "clean_text")
        # The dedup stages' CORPUS-side artifacts depend only on the prior
        # side, so they are also built here, off the new side's critical
        # path: the exact stage's Bloom filter and the fuzzy stage's
        # broadcast kernel structures (the 'per-snapshot precomputable
        # artifact' the flag operator documents).
        from ..operators.dedup import (
            build_corpus_bloom,
            build_fuzzy_corpus_artifact,
        )

        bloom = build_corpus_bloom(
            prior_clean, text_col="clean_text", m_bits=cfg.bloom_m_bits
        )
        fuzzy_art = build_fuzzy_corpus_artifact(prior_clean, text_col="clean_text")
        return prior_clean, bloom, fuzzy_art

    with ThreadPoolExecutor(max_workers=1) as pool:
        prior_fut = pool.submit(_build_prior)
        frames = build_clean_snapshot(new_pages, cfg, timings=timings)
        prior_clean, bloom, fuzzy_art = prior_fut.result()
    return _dedup_tail_frames(
        frames, prior_clean, cfg, True, timings,
        bloom_bytes=bloom, fuzzy_artifact=fuzzy_art,
    )


def snapshot_funnel(frames: dict[str, DataFrame]) -> DataFrame:
    """Per-stage survival funnel over the chain's frames, every row pinned
    by (count, token sum, kept-set checksum).  The pack row reports
    (n_chunks, total packed tokens, Σ (chunk_id+1)·n_docs) so the chunk
    STRUCTURE is value-checked, not just totals."""
    ext_tok = _n_tokens_col("text")
    clean_tok = F.col("n_clean_tokens")
    stages = [
        (0, "extracted", frames["extracted"], "url", ext_tok),
        (1, "latest", frames["latest"], "doc_id", ext_tok),
        (2, "blocklist", frames["blocklist"], "doc_id", ext_tok),
        (3, "gopher", frames["gopher"], "doc_id", ext_tok),
        (4, "quality", frames["quality"], "doc_id", ext_tok),
        (5, "span_dedup", frames["clean"], "doc_id", clean_tok),
        (6, "exact_vs_prior", frames["exact"], "doc_id", clean_tok),
        (7, "fuzzy_vs_prior", frames["fuzzy"], "doc_id", clean_tok),
        (8, "sampled", frames["sampled"], "doc_id", clean_tok),
    ]
    funnel = funnel_rows(stages)
    pack_row = frames["chunks"].agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("chunk_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.sum((F.col("chunk_id") + 1) * F.col("n_docs")), F.lit(0))
        .cast("long")
        .alias("id_checksum"),
    ).select(
        F.lit(9).alias("stage"),
        F.lit("packed").alias("stage_name"),
        "n_docs",
        "n_tokens",
        "id_checksum",
    )
    return funnel.unionAll(pack_row)


# ----------------------------------------------------------- CLI orchestration

CURATE_SUBSTAGES = (
    "curate_extract",
    "curate_latest",
    "curate_quality",
    "curate_clean",
    "curate_dedup",
    "curate_sample",
    "curate_chunks",
    "curate_merge",
)


def run_curation(
    spark: SparkSession,
    pages_path: str,
    out: str,
    cfg: CurationConfig | None = None,
    prior: str | None = None,
    resume: bool = False,
    stop_after: str | None = None,
) -> dict:
    """Run (or resume) the snapshot-curation pipeline over the manifest
    protocol: each substage writes its table + per-partition lineage rows
    via sources/manifest.write_stage_table (summary row LAST, so a killed
    write re-runs); `resume=True` skips manifest-complete substages and
    re-reads their tables; the final substage MERGEs the kept set into the
    persistent `corpus` table (idempotent keyed upsert — re-running the
    merge is a no-op).  `prior` points at a previous snapshot's corpus
    table (doc_id, clean_text, ...); None means first snapshot.

    `stop_after` kills the run after the named substage completes — the
    deterministic stand-in for a mid-run crash that tests/test_curation.py
    uses to pin resume-equals-uninterrupted bit-for-bit.

    Returns {"report": funnel rows as dicts, "tables": {substage: path}}.
    """
    from ..sources import manifest as M

    cfg = cfg or CurationConfig()
    produced: dict[str, DataFrame] = {}

    def done(stage: str) -> bool:
        return resume and M.stage_complete(spark, out, stage)

    def table(stage: str) -> DataFrame:
        if stage in produced:
            return produced[stage]
        return M.read_stage_table(spark, out, stage)

    def write(df: DataFrame, stage: str, **kw) -> DataFrame:
        produced[stage] = M.write_stage_table(df, out, stage, **kw)
        return produced[stage]

    def stop(stage: str) -> bool:
        return stop_after == stage

    prior_clean = spark.read.parquet(prior) if prior else None

    if not done("curate_extract"):
        pages = spark.read.parquet(pages_path)
        write(s_extract(pages), "curate_extract")
    if stop("curate_extract"):
        return {"stopped_after": "curate_extract"}

    if not done("curate_latest"):
        write(s_latest(table("curate_extract")), "curate_latest")
    if stop("curate_latest"):
        return {"stopped_after": "curate_latest"}

    if not done("curate_quality"):
        latest = table("curate_latest").select("doc_id", "url", "text")
        write(s_quality(latest, cfg), "curate_quality")
    if stop("curate_quality"):
        return {"stopped_after": "curate_quality"}

    if not done("curate_clean"):
        write(s_spans(table("curate_quality"), cfg), "curate_clean")
    if stop("curate_clean"):
        return {"stopped_after": "curate_clean"}

    if not done("curate_dedup"):
        clean = table("curate_clean")
        deduped = s_dedup_fuzzy(
            s_dedup_exact(clean, prior_clean, cfg), prior_clean, cfg
        )
        write(deduped, "curate_dedup")
    if stop("curate_dedup"):
        return {"stopped_after": "curate_dedup"}

    if not done("curate_sample"):
        sampled = s_sample(s_buckets(table("curate_dedup")), cfg)
        write(sampled, "curate_sample")
    if stop("curate_sample"):
        return {"stopped_after": "curate_sample"}

    if not done("curate_chunks"):
        write(s_pack(table("curate_sample"), cfg), "curate_chunks")
    if stop("curate_chunks"):
        return {"stopped_after": "curate_chunks"}

    if not done("curate_merge"):
        kept = table("curate_sample").select(
            "doc_id", "url", "n_clean_tokens", "clean_text", "bucket"
        )
        M.merge_stage_table(kept, out, "corpus", keys=("doc_id",))
        M.record_stage(spark, out, "curate_merge", rows=kept.count())

    # funnel report over the materialized tables (cheap scalar aggs)
    ext_tok = _n_tokens_col("text")
    clean_tok = F.col("n_clean_tokens")
    report_df = funnel_rows(
        [
            (0, "extracted", table("curate_extract"), "url", ext_tok),
            (1, "latest", table("curate_latest"), "doc_id", ext_tok),
            (4, "quality", table("curate_quality"), "doc_id", ext_tok),
            (5, "span_dedup", table("curate_clean"), "doc_id", clean_tok),
            (7, "deduped", table("curate_dedup"), "doc_id", clean_tok),
            (8, "sampled", table("curate_sample"), "doc_id", clean_tok),
        ]
    )
    report = [r.asDict() for r in report_df.collect()]
    chunks = table("curate_chunks").agg(
        F.count("*").alias("n_chunks"),
        F.coalesce(F.sum("chunk_tokens"), F.lit(0)).alias("packed_tokens"),
    ).first()
    report.append(
        {
            "stage": 9,
            "stage_name": "packed",
            "n_docs": int(chunks["n_chunks"]),
            "n_tokens": int(chunks["packed_tokens"]),
            "id_checksum": 0,
        }
    )
    with open(os.path.join(out, "curation_report.json"), "w") as f:
        json.dump(report, f, indent=1, default=int)
    return {
        "report": report,
        "tables": {s: os.path.join(out, s) for s in CURATE_SUBSTAGES[:-1]},
        "corpus": os.path.join(out, "corpus"),
    }
