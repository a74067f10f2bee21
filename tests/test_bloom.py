"""Bloom primitives (functions/bloom.py) + bloom-gated incremental dedup
(operators/dedup.incremental_dedup): no false negatives ever, measured FPR
within theory, and exact operator output identical to the naive anti-join."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from entity_resolution_pipeline_spark.functions.bloom import (
    bloom_index_matrix,
    build_bloom,
    merge_blooms,
    probe_bloom,
)
from entity_resolution_pipeline_spark.operators.dedup import incremental_dedup

M = 1 << 16


def _fps(prefix: str, n: int) -> list[str]:
    return [hashlib.md5(f"{prefix}-{i}".encode()).hexdigest() for i in range(n)]


def test_bloom_no_false_negatives():
    members = _fps("m", 2000)
    bloom = build_bloom(pd.Series(members), M)
    assert probe_bloom(pd.Series(members), bloom, M).all()


def test_bloom_fpr_within_theory():
    members = _fps("m", 2000)
    bloom = build_bloom(pd.Series(members), M)
    outsiders = _fps("x", 20000)
    fpr = probe_bloom(pd.Series(outsiders), bloom, M).mean()
    # (1 - e^(-4n/m))^4 at n=2000, m=65536 -> ~1.6e-4; allow 10x slack
    theory = (1 - np.exp(-4 * 2000 / M)) ** 4
    assert fpr <= 10 * theory + 1e-4


def test_bloom_merge_equals_single_build():
    a, b = _fps("a", 500), _fps("b", 500)
    merged = merge_blooms([build_bloom(pd.Series(a), M), build_bloom(pd.Series(b), M)])
    whole = build_bloom(pd.Series(a + b), M)
    assert np.array_equal(merged, whole)


def test_bloom_index_matrix_rejects_bad_fp():
    with pytest.raises(ValueError):
        bloom_index_matrix(["deadbeef"], M)


def test_build_bloom_rejects_tiny_m_bits():
    with pytest.raises(ValueError):
        build_bloom(pd.Series(_fps("m", 4)), 4)


def test_build_bloom_non_multiple_of_8_rounds_up():
    # m_bits=1000 -> 125.0 bytes exactly, but m_bits=1001..1007 must NOT
    # under-allocate: bit index m_bits-1 lands in byte (m_bits-1)>>3
    members = _fps("m", 500)
    for m in (1000, 1001, 1007):
        bloom = build_bloom(pd.Series(members), m)
        assert len(bloom) == (m + 7) >> 3
        assert probe_bloom(pd.Series(members), bloom, m).all()


def _snapshot_tables(spark):
    corpus = spark.createDataFrame(
        [(i, f"shared text {i % 5}") for i in range(10)], "doc_id long, text string"
    )
    # new snapshot: ids 100..119; texts 100..104 collide with corpus texts 0..4
    new = spark.createDataFrame(
        [(100 + i, f"shared text {i}" if i < 5 else f"fresh text {i}") for i in range(20)],
        "doc_id long, text string",
    )
    return new, corpus


def test_incremental_dedup_exact_flags(spark):
    new, corpus = _snapshot_tables(spark)
    out = {r["doc_id"]: r["kept"] for r in incremental_dedup(new, corpus).collect()}
    assert len(out) == 20
    for i in range(20):
        assert out[100 + i] == (0 if i < 5 else 1)


def test_incremental_dedup_bloom_matches_naive(spark):
    new, corpus = _snapshot_tables(spark)
    with_bloom = sorted(map(tuple, incremental_dedup(new, corpus, m_bits=1 << 12).collect()))
    naive = sorted(map(tuple, incremental_dedup(new, corpus, use_bloom=False).collect()))
    assert with_bloom == naive


def test_incremental_dedup_empty_corpus_keeps_all(spark):
    new, corpus = _snapshot_tables(spark)
    out = incremental_dedup(new, corpus.where("doc_id < 0")).collect()
    assert len(out) == 20 and all(r["kept"] == 1 for r in out)


def test_incremental_dedup_tiny_filter_still_exact(spark):
    # m_bits=64: nearly every probe is a false positive -> verify join does
    # all the work, output unchanged (the bloom is an optimization only)
    new, corpus = _snapshot_tables(spark)
    out = {r["doc_id"]: r["kept"] for r in incremental_dedup(new, corpus, m_bits=64).collect()}
    assert sum(out.values()) == 15


def test_incremental_dedup_null_text_matches_naive(spark):
    """NULL text -> NULL fingerprint.  A NULL never equi-joins, so the naive
    path keeps those rows (kept=1); the bloom path must agree: NULLs are
    dropped from the corpus filter build and routed straight to kept=1 on
    the probe side (never a corpus match)."""
    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "beta")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "alpha"), (11, None), (12, "gamma"), (13, None)],
        "doc_id long, text string",
    )
    with_bloom = sorted(map(tuple, incremental_dedup(new, corpus).collect()))
    naive = sorted(map(tuple, incremental_dedup(new, corpus, use_bloom=False).collect()))
    assert with_bloom == naive
    kept = {t[0]: t[2] for t in with_bloom}
    assert kept == {10: 0, 11: 1, 12: 1, 13: 1}


def test_incremental_dedup_streaming_batch_parity(spark, tmp_path):
    """flag_against_corpus is a stateless probe + stream-static join, so the
    SAME call dedups a STREAM of new documents against a frozen corpus bloom:
    pin bit-equality between the batch run and an availableNow streaming run
    over the same parquet source."""
    from entity_resolution_pipeline_spark.operators.dedup import (
        build_corpus_bloom,
        flag_against_corpus,
    )

    new, corpus = _snapshot_tables(spark)
    src = str(tmp_path / "new_docs")
    new.write.parquet(src)
    bloom = build_corpus_bloom(corpus, m_bits=1 << 12)

    batch_in = spark.read.parquet(src)
    expected = sorted(
        map(tuple, flag_against_corpus(batch_in, corpus, bloom, m_bits=1 << 12).collect())
    )
    assert sum(t[2] for t in expected) == 15  # 5 dups flagged

    stream_in = spark.readStream.schema(batch_in.schema).parquet(src)
    q = (
        flag_against_corpus(stream_in, corpus, bloom, m_bits=1 << 12)
        .writeStream.format("memory")
        .queryName("bloom_parity")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM bloom_parity").collect()))
    assert got == expected
