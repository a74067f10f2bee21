"""Connected-components (large-star/small-star) correctness.

The reference clusters with driver-local networkx (classification.py:877-878);
these tests pin our distributed replacement to the same semantics: exact
partition into components, deterministic lexicographic-min roots, and
robustness to chains (worst case for iterative min-propagation).
"""

from __future__ import annotations

import pytest

from entity_resolution_pipeline_spark.operators.cluster import (
    cluster_predictions,
    cluster_statistics,
    connected_components,
)


def _components(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df).collect()
    comps: dict[str, set[str]] = {}
    for r in rows:
        comps.setdefault(r["root"], set()).add(r["entity_id"])
    return comps


def test_two_components_and_roots(spark):
    comps = _components(
        spark, [("b", "a"), ("b", "c"), ("c", "d"), ("e", "f"), ("h", "g"), ("g", "f")]
    )
    assert comps == {"a": {"a", "b", "c", "d"}, "e": {"e", "f", "g", "h"}}


def test_long_chain_single_component(spark):
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(60)]
    comps = _components(spark, edges)
    assert list(comps) == ["n000"]
    assert len(comps["n000"]) == 61


def test_duplicate_and_reversed_edges(spark):
    comps = _components(spark, [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")])
    assert comps == {"a": {"a", "b", "c"}}


def test_self_loop_only_drops_out(spark):
    comps = _components(spark, [("a", "a"), ("b", "c")])
    # 'a' has no non-loop edge → not in any component (callers add singletons)
    assert comps == {"b": {"b", "c"}}


def test_cluster_predictions_singletons_and_threshold(spark):
    preds = spark.createDataFrame(
        [
            ("r1", "r2", 0.99, True),
            ("r2", "r3", 0.97, True),
            ("r4", "r5", 0.45, True),   # below min_edge_weight=0.5 → no edge
            ("r6", "r7", 0.99, False),  # not a match → no edge
        ],
        ["left_id", "right_id", "probability", "match"],
    )
    entities = spark.createDataFrame([(f"r{i}",) for i in range(1, 8)], ["record_id"])
    out = cluster_predictions(preds, entities).collect()
    by_entity = {r["entity_id"]: r for r in out}
    assert len(by_entity) == 7
    big = {e for e, r in by_entity.items() if r["cluster_size"] == 3}
    assert big == {"r1", "r2", "r3"}
    assert by_entity["r1"]["cluster_id"] == by_entity["r3"]["cluster_id"]
    singles = {e for e, r in by_entity.items() if r["cluster_size"] == 1}
    assert singles == {"r4", "r5", "r6", "r7"}


def test_cluster_statistics_buckets(spark):
    preds = spark.createDataFrame(
        [("a1", "a2", 0.99, True), ("b1", "b2", 0.99, True), ("b2", "b3", 0.99, True)],
        ["left_id", "right_id", "probability", "match"],
    )
    entities = spark.createDataFrame([("a1",), ("a2",), ("b1",), ("b2",), ("b3",), ("c1",)], ["record_id"])
    clusters = cluster_predictions(preds, entities)
    stats = {r["size_bucket"]: (r["num_clusters"], r["num_entities"]) for r in cluster_statistics(clusters).collect()}
    assert stats == {"1": (1, 1), "2": (1, 2), "3-5": (1, 3)}
