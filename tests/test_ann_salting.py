"""Hot-bucket bounding for the ANN scale paths (VERDICT r1 'what's wrong'
#1/#2): salting must bound per-bucket join size while leaving the top-k /
near-dup output provably unchanged, and the embedding near-dup operator must
auto-fall-back to the SRP-bucketed path when the broadcast matrix would
exceed its memory budget."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.config import BlockingConfig
from entity_resolution_pipeline_spark.operators import ann, dedup
from entity_resolution_pipeline_spark.operators.blocking import (
    salt_hot_blocks,
    salted_pair_predicate,
)


def _clustered_corpus(n: int = 120, d: int = 8, seed: int = 11):
    """One dense direction cluster (everyone lands in the same SRP bucket)
    plus a few outliers — the worst case for bucketed ANN."""
    rng = np.random.Generator(np.random.PCG64(seed))
    base = rng.standard_normal(d)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(n):
        v = base + rng.standard_normal(d) * 0.01  # tight cluster
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    return rows, d


def test_lsh_bucket_topk_salting_identical_output(spark):
    rows, d = _clustered_corpus()
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    uncapped = sorted(
        map(tuple, ann.lsh_bucket_topk(emb, k=3, dim=d, n_planes=6, n_tables=2,
                                       max_bucket_size=None).collect())
    )
    capped = sorted(
        map(tuple, ann.lsh_bucket_topk(emb, k=3, dim=d, n_planes=6, n_tables=2,
                                       max_bucket_size=10).collect())
    )
    assert capped == uncapped and len(capped) > 0


def test_ivf_topk_salting_identical_output(spark):
    rows, d = _clustered_corpus()
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    uncapped = sorted(
        map(tuple, ann.ivf_topk(emb, k=3, n_centroids=4, n_probe=2, sample=120,
                                max_cell_size=None).collect())
    )
    capped = sorted(
        map(tuple, ann.ivf_topk(emb, k=3, n_centroids=4, n_probe=2, sample=120,
                                max_cell_size=10).collect())
    )
    assert capped == uncapped and len(capped) > 0


def test_salted_bucket_sizes_bounded(spark):
    """Plant one dense block: after triangle salting no bucket exceeds
    ~2·cap, and the pair set enumerated by a self-join is EXACTLY the
    original pair set (completeness + no duplicates)."""
    n, cap = 97, 10
    membership = spark.createDataFrame(
        [(i, "hot") for i in range(n)] + [(n + i, "cold") for i in range(3)],
        ["id", "block_key"],
    )
    salted = salt_hot_blocks(membership, BlockingConfig(max_block_size=cap))
    sizes = salted.groupBy("block_key").count().collect()
    # expected bucket size ≈ 2·cap (two hash-assigned groups of ~cap);
    # allow hash unevenness up to 3·cap — the point is 97 → ~20, not 97
    assert max(r["count"] for r in sizes) <= 3 * cap
    l, r = salted.alias("l"), salted.alias("r")
    pairs = (
        l.join(r, "block_key")
        .where(F.col("l.id") < F.col("r.id"))
        .where(salted_pair_predicate())
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .collect()
    )
    got = [(p["a"], p["b"]) for p in pairs]
    want = {(a, b) for a in range(n) for b in range(a + 1, n)} | {
        (n, n + 1), (n, n + 2), (n + 1, n + 2)
    }
    assert len(got) == len(set(got)), "salting must not duplicate pairs"
    assert set(got) == want, "salting must not lose pairs"


def test_grid_salt_bipartite_exact_join(spark):
    queries = spark.createDataFrame(
        [(i, "c0") for i in range(40)] + [(100 + i, "c1") for i in range(2)],
        ["id", "cell"],
    )
    members = spark.createDataFrame(
        [(200 + i, "c0") for i in range(35)] + [(300 + i, "c1") for i in range(2)],
        ["id", "cell"],
    )
    q2, m2 = ann._grid_salt_bipartite(queries, members, "cell", "id", cap=8)
    sizes = m2.groupBy("cell").count().collect()
    assert max(r["count"] for r in sizes) <= 2 * 8
    joined = q2.join(m2.withColumnRenamed("id", "mid"), "cell").select("id", "mid")
    got = [(r["id"], r["mid"]) for r in joined.collect()]
    want = {(q, 200 + m) for q in range(40) for m in range(35)} | {
        (100 + q, 300 + m) for q in range(2) for m in range(2)
    }
    assert len(got) == len(set(got)) and set(got) == want


def test_srp_params_follow_the_s_curve():
    """LSH parameters must adapt to the threshold regime: high thresholds →
    many planes / few tables; low thresholds → few planes / many tables.  A
    fixed plane count collapses recall in the regime it wasn't tuned for
    (8 planes ≈ 7% recall at τ≈0.33, measured in test_recall)."""
    import math

    hi_k, hi_t, hi_r = ann.srp_params_for(0.95)
    lo_k, lo_t, lo_r = ann.srp_params_for(0.35)
    assert hi_k > lo_k and lo_t > hi_t
    assert hi_r >= 0.95 and lo_r >= 0.95
    # the analytic recall the chooser reports must match the S-curve
    for tau, k, t, r in [(0.95, hi_k, hi_t, hi_r), (0.35, lo_k, lo_t, lo_r)]:
        p = 1 - math.acos(tau) / math.pi
        assert abs(r - (1 - (1 - p**k) ** t)) < 1e-12
    # both respect the table budget
    assert hi_t <= 64 and lo_t <= 64


def test_embedding_neardup_auto_srp_fallback(spark):
    """A corpus just over the broadcast budget must take the SRP-bucketed
    path (with a RuntimeWarning naming the parameter choice) and produce
    identical pairs at the threshold."""
    rng = np.random.Generator(np.random.PCG64(4))
    n, d = 60, 8
    M = rng.standard_normal((n, d))
    M[1] = M[0] * 0.99 + rng.standard_normal(d) * 0.001
    M[7] = M[6] * 0.995 + rng.standard_normal(d) * 0.001
    emb = spark.createDataFrame(
        [(i, M[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    broadcast = sorted(
        map(tuple, dedup.embedding_neardup_pairs(emb, threshold=0.98).collect())
    )
    # budget below n*d*8 bytes → must auto-route to srp_neardup_pairs
    import warnings as _w

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        fallback = sorted(
            map(tuple, dedup.embedding_neardup_pairs(
                emb, threshold=0.98, broadcast_budget_bytes=n * d * 8 - 1
            ).collect())
        )
    assert any(
        issubclass(c.category, RuntimeWarning) and "SRP-LSH" in str(c.message)
        for c in caught
    ), "fallback must be surfaced, not silent"
    assert broadcast == fallback
    assert {(p[0], p[1]) for p in broadcast} >= {(0, 1), (6, 7)}


def test_srp_neardup_direct(spark):
    rng = np.random.Generator(np.random.PCG64(9))
    n, d = 50, 8
    M = rng.standard_normal((n, d))
    M[3] = M[2] * 0.999 + rng.standard_normal(d) * 0.0005
    emb = spark.createDataFrame(
        [(i, M[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    pairs = {
        (r["left_id"], r["right_id"])
        for r in dedup.srp_neardup_pairs(emb, threshold=0.99).collect()
    }
    assert (2, 3) in pairs
