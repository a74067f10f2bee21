"""End-to-end snapshot-curation stage (plans/curation.py): the composed
webtext battery run over the manifest protocol, resumable mid-pipeline.

Pins (reference parity: staged driver + checkpoint/resume,
/root/reference/src/pipeline.py:66-120 + utils.py:47-86):
  * the CLI's materialized funnel equals the in-memory chain's funnel
    (same counts, token sums, AND kept-set checksums per stage);
  * a run killed after an arbitrary substage, then resumed, reproduces the
    uninterrupted run's corpus + chunks + report BIT-FOR-BIT;
  * re-running a complete pipeline with resume=True is a no-op.

Fixture: the oracle-checked snapshot_curation page synthesizer from
__spark_entry__ (modulus-branch captures over sf0.001 documents), split
into a prior snapshot slice (k % 7 == 0, pre-cleaned to a corpus table)
and the new snapshot (everything else).
"""

from __future__ import annotations

import argparse
import functools
import json
import os

import pytest

import __spark_entry__ as E
import main as _main
from entity_resolution_pipeline_spark.plans.curation import (
    build_clean_snapshot,
    curate_snapshot_frames,
    run_curation,
    snapshot_funnel,
)

SF_DIR = "/root/testdata/sf0.001"

run_keep = functools.partial(_main.run, stop_spark=False)


@pytest.fixture(scope="module")
def fix(spark, tmp_path_factory):
    """pages parquet (new snapshot), prior-corpus parquet, and one
    uninterrupted CLI run to compare every other scenario against."""
    tmp = str(tmp_path_factory.mktemp("curate"))
    pages = E._curate_pages(
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    )
    cfg = E._curate_cfg()

    new_path = os.path.join(tmp, "pages_new")
    pages.where("k % 7 != 0").drop("k").write.parquet(new_path)

    prior_pages = pages.where("k % 7 = 0").drop("k")
    prior_clean = build_clean_snapshot(prior_pages, cfg, persist=False)[
        "clean"
    ].select("doc_id", "clean_text")
    prior_path = os.path.join(tmp, "prior_corpus")
    prior_clean.write.parquet(prior_path)

    out_a = os.path.join(tmp, "run_a")
    result = run_curation(spark, new_path, out_a, cfg=cfg, prior=prior_path)
    return {
        "tmp": tmp,
        "cfg": cfg,
        "new_path": new_path,
        "prior_path": prior_path,
        "out_a": out_a,
        "report_a": result["report"],
    }


def _table_rows(spark, out: str, stage: str):
    df = spark.read.parquet(os.path.join(out, stage))
    return sorted(df.collect(), key=lambda r: tuple(str(v) for v in r))


def _by_stage(report):
    return {r["stage_name"]: r for r in report}


def test_cli_funnel_matches_inmemory_chain(spark, fix):
    """The materialized (stage-table) pipeline and the single in-memory
    lineage (the DuckDB-oracled snapshot_curation plan) agree on every
    comparable funnel row — counts, token sums, kept-set checksums."""
    prior_clean = spark.read.parquet(fix["prior_path"])
    frames = curate_snapshot_frames(
        spark.read.parquet(fix["new_path"]), prior_clean, fix["cfg"]
    )
    mem = {r["stage_name"]: r.asDict() for r in snapshot_funnel(frames).collect()}
    cli = _by_stage(fix["report_a"])

    for name in ("extracted", "latest", "quality", "span_dedup", "sampled"):
        for k in ("n_docs", "n_tokens", "id_checksum"):
            assert cli[name][k] == mem[name][k], (name, k)
    # CLI fuses exact+fuzzy into one 'deduped' stage == in-memory fuzzy row
    for k in ("n_docs", "n_tokens", "id_checksum"):
        assert cli["deduped"][k] == mem["fuzzy_vs_prior"][k], k
    assert cli["packed"]["n_docs"] == mem["packed"]["n_docs"]
    assert cli["packed"]["n_tokens"] == mem["packed"]["n_tokens"]
    # the funnel is a funnel: monotone non-increasing doc counts
    order = ["extracted", "latest", "quality", "span_dedup", "deduped", "sampled"]
    counts = [cli[s]["n_docs"] for s in order]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0


def test_fused_gates_equal_recompute_path(spark, fix):
    """funnel=True computes blocklist/Gopher/badwords as flag columns in
    ONE latest-pin pass; funnel=False keeps the original per-frame
    recompute builders.  Row-local gates commute, so every shared frame
    must be row-identical between the two paths — including the
    blocklist/gopher intermediate frames the CLI comparison can't see
    (they exist only in memory)."""
    pages = spark.read.parquet(fix["new_path"])
    cfg = fix["cfg"]
    fused = build_clean_snapshot(pages, cfg, persist=False)
    plain = build_clean_snapshot(pages, cfg, persist=False, funnel=False)
    for name, cols in (
        ("latest", ["doc_id", "n_captures", "latest_ts", "url", "text"]),
        ("blocklist", ["doc_id", "url", "text"]),
        ("gopher", ["doc_id", "url", "text"]),
        ("quality", ["doc_id", "url", "text"]),
        ("clean", ["doc_id", "url", "n_tokens", "n_clean_tokens", "clean_text"]),
    ):
        a = sorted(map(tuple, fused[name].select(*cols).collect()))
        b = sorted(map(tuple, plain[name].select(*cols).collect()))
        assert a == b, name
        assert len(a) > 0, name


@pytest.mark.parametrize("kill_after", ["curate_quality", "curate_dedup"])
def test_kill_and_resume_bit_identical(spark, fix, kill_after):
    """A run killed after `kill_after`, then resumed, reproduces the
    uninterrupted run bit-for-bit: corpus table, chunks table, report."""
    out_b = os.path.join(fix["tmp"], f"run_kill_{kill_after}")
    stopped = run_curation(
        spark,
        fix["new_path"],
        out_b,
        cfg=fix["cfg"],
        prior=fix["prior_path"],
        stop_after=kill_after,
    )
    assert stopped == {"stopped_after": kill_after}
    # the killed run must NOT have produced the final corpus
    assert not os.path.exists(os.path.join(out_b, "corpus"))

    resumed = run_curation(
        spark,
        fix["new_path"],
        out_b,
        cfg=fix["cfg"],
        prior=fix["prior_path"],
        resume=True,
    )
    assert resumed["report"] == fix["report_a"]
    for stage in ("corpus", "curate_chunks", "curate_sample"):
        assert _table_rows(spark, out_b, stage) == _table_rows(
            spark, fix["out_a"], stage
        ), stage


def test_resume_of_complete_run_is_noop(spark, fix):
    """resume=True over an already-complete pipeline recomputes nothing
    (merge is skipped — the corpus table's files are untouched) and
    reproduces the same report."""
    corpus_dir = os.path.join(fix["out_a"], "corpus")
    before = sorted(os.listdir(corpus_dir))
    mtimes = {f: os.path.getmtime(os.path.join(corpus_dir, f)) for f in before}
    again = run_curation(
        spark,
        fix["new_path"],
        fix["out_a"],
        cfg=fix["cfg"],
        prior=fix["prior_path"],
        resume=True,
    )
    assert again["report"] == fix["report_a"]
    after = sorted(os.listdir(corpus_dir))
    assert after == before
    assert all(os.path.getmtime(os.path.join(corpus_dir, f)) == mtimes[f] for f in before)


def test_cli_entrypoint_stage_curate(spark, fix, capsys):
    """main.py --stage curate drives the same pipeline (resumed here so the
    CLI test is cheap) and prints the funnel report JSON."""
    args = argparse.Namespace(
        pages=fix["new_path"],
        labeled_pairs=None,
        out=fix["out_a"],
        stage="curate",
        resume=True,
        limit=None,
        prior=fix["prior_path"],
        blocked_domains=list(fix["cfg"].blocked_domains),
        badwords=list(fix["cfg"].badwords),
    )
    run_keep(args)
    printed = json.loads(capsys.readouterr().out)
    assert printed == json.loads(json.dumps(fix["report_a"], default=int))
