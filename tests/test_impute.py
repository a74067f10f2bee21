"""Hot-deck imputation tests (reference batch_parallel_imputation.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.config import DEFAULT_CONFIG, ImputationConfig
from entity_resolution_pipeline_spark.operators import impute as I


@pytest.fixture(scope="module")
def knn_fixture(spark):
    # 3 tight donor groups in 8-d space; target sits in group A
    rng = np.random.Generator(np.random.PCG64(5))
    base = {}
    for g in range(3):
        v = rng.standard_normal(8)
        base[g] = v / np.linalg.norm(v)
    donors = []
    k = 0
    for g in range(3):
        for i in range(6):
            v = base[g] + rng.standard_normal(8) * 0.05
            donors.append((f"d{g}{i}", v.tolist(), (np.ones(4) * g).tolist(), f"val{g}"))
            k += 1
    donors_df = spark.createDataFrame(
        donors, ["donor_id", "query_vec", "donor_vec", "donor_value"]
    )
    targets_df = spark.createDataFrame(
        [("t0", (base[0] + rng.standard_normal(8) * 0.02).tolist())],
        ["record_id", "query_vec"],
    )
    return targets_df, donors_df


def test_knn_candidates_find_group(knn_fixture):
    targets, donors = knn_fixture
    cands = I.knn_candidates(targets, donors, ImputationConfig(max_candidates=5))
    rows = cands.collect()
    assert 0 < len(rows) <= 5
    assert all(r["donor_id"].startswith("d0") for r in rows)
    assert all(r["cosine"] >= 0.30 for r in rows)
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, len(rows) + 1)
    )


def test_impute_average(knn_fixture):
    targets, donors = knn_fixture
    cands = I.knn_candidates(targets, donors, ImputationConfig(max_candidates=5))
    out = I.impute_vectors(cands, ImputationConfig(method="average")).collect()
    assert len(out) == 1
    vec = out[0]["imputed_vec"]
    # all donors in group 0 carry donor_vec = zeros → average is zeros
    assert np.allclose(vec, 0.0)
    assert out[0]["n_donors"] == len(cands.collect())


def test_impute_nearest_carries_value(knn_fixture):
    targets, donors = knn_fixture
    cands = I.knn_candidates(targets, donors, ImputationConfig(max_candidates=5))
    out = I.impute_vectors(cands, ImputationConfig(method="nearest")).collect()
    assert len(out) == 1
    assert out[0]["imputed_value"] == "val0"
    assert np.allclose(out[0]["imputed_vec"], 0.0)


def test_weighted_average_weights_by_cosine(spark):
    cands = spark.createDataFrame(
        [
            ("t", "a", 0.9, [1.0, 0.0], 1),
            ("t", "b", 0.3, [0.0, 1.0], 2),
        ],
        ["record_id", "donor_id", "cosine", "donor_vec", "rank"],
    )
    out = I.impute_vectors(cands, ImputationConfig(method="weighted_average")).collect()[0]
    assert out["imputed_vec"][0] == pytest.approx(0.9 / 1.2)
    assert out["imputed_vec"][1] == pytest.approx(0.3 / 1.2)


def test_end_to_end_imputation_on_fixture(spark):
    """Records missing subjects get vectors imputed from composite-similar
    donors (subjects are entity-stable in the fixture, so the imputed vector
    should be closest to the entity's true subjects vector)."""
    from entity_resolution_pipeline_spark import synth
    from entity_resolution_pipeline_spark.operators import embedding as E
    from entity_resolution_pipeline_spark.operators import extract as X
    from entity_resolution_pipeline_spark.operators import preprocess as P

    pages = synth.pages_df(spark, 300)
    records = X.extract_records(pages)
    melted = P.melt_fields(records).cache()
    rfh = P.record_field_hashes(melted)
    uniq = P.unique_strings(melted)
    emb = E.embed_unique_strings(melted, DEFAULT_CONFIG.embedding)
    vectors = emb.select("hash", "embedding").dropDuplicates(["hash"])
    out = I.impute_missing_fields(rfh, vectors, uniq, ImputationConfig(method="nearest"))
    rows = out.where(F.col("field") == "subjects").collect()
    # fixture: variant 3 of every entity drops subjects → there are targets
    assert len(rows) > 0
    n_missing = rfh.where(F.col("subjects") == "NULL").count()
    assert len(rows) <= n_missing
    for r in rows[:5]:
        assert r["imputed_value"] is not None and len(r["imputed_vec"]) > 0
