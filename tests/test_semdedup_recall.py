"""Cross-bucket pair recall of SemDeDup sharding (r4 verdict ask #4) and the
multi-table remedy.

Fixture: deterministic planted-twin corpus — n_base unit vectors (PCG64 by
id) plus one perturbed twin each (noise norm 0.25 → twin cosine ≈0.97;
background cosines near 0 at dim 32, so the true near-dup pair set at
threshold 0.9 is exactly computable by brute force).  A true pair counts as
recalled iff the operator assigns both members one `root` — for the
single-table operator that is precisely "the pair co-bucketed" (roots are
bucket-confined), so recall measures the sign-projection miss rate the
docstring previously only described.

Floors are pinned ~10 points under the measured values (single p=4: 0.735,
p=8: 0.534; multitable p=8 T=2: 0.782, T=4: 0.947 on this fixture) so the
test fails on structural regressions, not fixture jitter (the corpus is
fully deterministic, so these only move if the assignment/kernel change).
"""

from __future__ import annotations

import numpy as np
import pytest

from entity_resolution_pipeline_spark.operators.dedup import (
    semantic_dedup,
    semantic_dedup_multitable,
)

N_BASE, DIM, THRESHOLD = 2000, 32, 0.9


@pytest.fixture(scope="module")
def corpus(spark):
    V = np.stack(
        [
            np.random.Generator(np.random.PCG64(i)).standard_normal(DIM)
            for i in range(N_BASE)
        ]
    )
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    noise = np.stack(
        [
            np.random.Generator(np.random.PCG64(10**9 + i)).standard_normal(DIM)
            for i in range(N_BASE)
        ]
    )
    noise *= 0.25 / np.linalg.norm(noise, axis=1, keepdims=True)
    twins = V + noise
    twins /= np.linalg.norm(twins, axis=1, keepdims=True)
    allv = np.concatenate([V, twins])
    S = allv @ allv.T
    ii, jj = np.nonzero(S >= THRESHOLD)
    true_pairs = {(int(i), int(j)) for i, j in zip(ii, jj) if i < j}
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(DoubleType(), False), False),
        ]
    )
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(allv)], schema
    )
    return emb, true_pairs


def _recall(df, true_pairs) -> float:
    root = {int(r["vec_id"]): r["root"] for r in df.select("vec_id", "root").collect()}
    return sum(1 for i, j in true_pairs if root[i] == root[j]) / len(true_pairs)


def test_single_table_recall_decays_with_planes(spark, corpus):
    emb, true_pairs = corpus
    r4 = _recall(semantic_dedup(emb, threshold=THRESHOLD, n_planes=4, dim=DIM), true_pairs)
    r8 = _recall(semantic_dedup(emb, threshold=THRESHOLD, n_planes=8, dim=DIM), true_pairs)
    assert r4 >= 0.65  # measured 0.735
    assert r8 >= 0.45  # measured 0.534
    # the decay itself is the documented tradeoff — pin its direction
    assert r4 > r8


def test_multitable_recovers_recall(spark, corpus):
    emb, true_pairs = corpus
    r1 = _recall(semantic_dedup(emb, threshold=THRESHOLD, n_planes=8, dim=DIM), true_pairs)
    r2 = _recall(
        semantic_dedup_multitable(
            emb, threshold=THRESHOLD, n_planes=8, n_tables=2, dim=DIM
        ),
        true_pairs,
    )
    r4 = _recall(
        semantic_dedup_multitable(
            emb, threshold=THRESHOLD, n_planes=8, n_tables=4, dim=DIM
        ),
        true_pairs,
    )
    assert r2 >= 0.70  # measured 0.782
    assert r4 >= 0.85  # measured 0.947
    assert r1 < r2 < r4
    # union-of-tables theory: R tables cannot recall less than 1-(1-r1)^R
    # minus component-merge slack; pin the useful direction only
    assert r4 >= 1 - (1 - r1) ** 4 - 0.05


def test_multitable_output_contract(spark, corpus):
    emb, _ = corpus
    out = semantic_dedup_multitable(
        emb, threshold=THRESHOLD, n_planes=8, n_tables=2, dim=DIM
    ).toPandas()
    n = 2 * N_BASE
    assert len(out) == n and out["vec_id"].nunique() == n
    # exactly one kept representative per root, and it is the least-central
    grp = out.groupby("root")
    assert (grp["kept"].sum() == 1).all()
    for _, g in list(grp)[:50]:
        g = g.sort_values(["cent_cos", "vec_id"])
        assert g.iloc[0]["kept"] == 1
    # singletons keep themselves with cent_cos exactly 1
    singles = grp.size()
    single_roots = set(singles[singles == 1].index)
    srows = out[out["root"].isin(single_roots)]
    assert (srows["kept"] == 1).all()
    assert (srows["cent_cos"] == 1.0).all()
    assert (srows["root"] == srows["vec_id"].astype(str)).all()
