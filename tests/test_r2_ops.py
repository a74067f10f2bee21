"""r2 additions: label propagation (G4), RFECV (M3), prefilters (F14) —
the three reference-configured-but-disabled paths, now real operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.config import (
    ClassifierConfig,
    ClusteringConfig,
    PrefilterConfig,
)
from entity_resolution_pipeline_spark.operators import classify as C
from entity_resolution_pipeline_spark.operators import cluster as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_label_propagation_splits_bridged_communities(spark):
    """Two triangles bridged by one edge: CC merges them into one component,
    LPA keeps two communities — the behavioral reason the reference offers
    the fallback."""
    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("d", "e"), ("e", "f"), ("d", "f")]
    bridge = [("c", "d")]
    e = _edges(spark, tri1 + tri2 + bridge)
    cc = {r["entity_id"]: r["root"] for r in G.connected_components(e).collect()}
    assert len(set(cc.values())) == 1
    lpa = {r["entity_id"]: r["root"] for r in G.label_propagation(e).collect()}
    comms = {}
    for node, root in lpa.items():
        comms.setdefault(root, set()).add(node)
    assert sorted(map(sorted, comms.values())) == [["a", "b", "c"], ["d", "e", "f"]]


def test_label_propagation_matches_cc_on_disjoint_cliques(spark):
    """On clean disjoint cliques LPA and CC agree exactly (same partition,
    same min-id roots)."""
    cliq1 = [("p", "q"), ("q", "r"), ("p", "r")]
    cliq2 = [("x", "y")]
    e = _edges(spark, cliq1 + cliq2)
    cc = sorted(map(tuple, G.connected_components(e).collect()))
    lpa = sorted(map(tuple, G.label_propagation(e).collect()))
    assert cc == lpa


def test_label_propagation_deterministic_across_partitioning(spark):
    rows = [(f"n{i}", f"n{i+1}") for i in range(0, 20, 2)] + [("n2", "n5")]
    a = sorted(map(tuple, G.label_propagation(_edges(spark, rows)).collect()))
    b = sorted(
        map(tuple, G.label_propagation(_edges(spark, rows).repartition(7)).collect())
    )
    assert a == b


def test_cluster_predictions_label_prop_path(spark):
    preds = spark.createDataFrame(
        [("a", "b", 0.99, True), ("c", "d", 0.99, True)],
        ["left_id", "right_id", "probability", "match"],
    )
    out = G.cluster_predictions(
        preds, cfg=ClusteringConfig(algorithm="label_propagation")
    )
    got = {r["entity_id"]: r["cluster_key"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_rfecv_selects_informative_features():
    """2 informative + 3 pure-noise features: RFECV keeps the signal and
    drops the noise, deterministically."""
    rng = np.random.Generator(np.random.PCG64(3))
    n = 400
    x1 = rng.standard_normal(n)
    x2 = rng.standard_normal(n)
    y = ((x1 + x2) > 0).astype(np.float64)
    X = np.column_stack(
        [x1, rng.standard_normal(n), x2, rng.standard_normal(n), rng.standard_normal(n)]
    )
    names = ["sig1", "noise1", "sig2", "noise2", "noise3"]
    cfg = ClassifierConfig(max_iterations=300)
    out = C.rfecv(X, y, names, cfg)
    assert set(out["selected"]) >= {"sig1", "sig2"}
    assert "noise1" not in out["selected"] or len(out["selected"]) <= 3
    assert out["cv_scores"][out["n_features"]] >= 0.9
    again = C.rfecv(X, y, names, cfg)
    assert again == out  # fully deterministic
    assert out["ranking"]["sig1"] <= 2 or out["ranking"]["sig2"] <= 2


def test_prefilters_decisions_and_scoring(spark):
    feats = spark.createDataFrame(
        [
            # bd match + similar person → auto-match
            ("l1", "r1", 1.0, 0.9, 0.2),
            # high composite → auto-match
            ("l2", "r2", 0.0, 0.4, 0.9),
            # dissimilar person → auto-non-match
            ("l3", "r3", 0.0, 0.1, 0.3),
            # nothing fires → classifier decides
            ("l4", "r4", 0.0, 0.72, 0.5),
        ],
        ["left_id", "right_id", "birth_death_match", "person_cosine", "composite_cosine"],
    )
    pf = PrefilterConfig(
        birth_death_use_as_prefilter=True,
        composite_cosine_enabled=True,
        composite_cosine_threshold=0.65,
        person_cosine_enabled=True,
        person_cosine_threshold=0.70,
    )
    dec = {
        r["left_id"]: r["d"]
        for r in feats.withColumn("d", C.prefilter_decision_col(feats, pf)).collect()
    }
    assert dec == {"l1": "match", "l2": "match", "l3": "non_match", "l4": None}

    model = C.LRModel(
        weights=np.array([0.0]),
        bias=10.0,  # sigmoid(10) ≈ 1 → classifier says match
        feature_names=["person_cosine"],
        decision_threshold=0.95,
        scaler={"person_cosine": (0.0, 1.0)},
    )
    out = {
        r["left_id"]: (round(r["probability"], 3), r["match"])
        for r in C.score_with_prefilters(feats, model, pf).collect()
    }
    assert out["l1"] == (1.0, True) and out["l2"] == (1.0, True)
    assert out["l3"] == (0.0, False)
    assert out["l4"][1] is True and out["l4"][0] > 0.99  # classifier path


def test_prefilters_disabled_is_passthrough(spark):
    feats = spark.createDataFrame(
        [("l1", "r1", 1.0, 0.9, 0.99)],
        ["left_id", "right_id", "birth_death_match", "person_cosine", "composite_cosine"],
    )
    dec = feats.withColumn(
        "d", C.prefilter_decision_col(feats, PrefilterConfig())
    ).collect()[0]["d"]
    assert dec is None
