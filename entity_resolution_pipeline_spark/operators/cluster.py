"""Transitive clustering: iterative large-star/small-star connected
components.

Replaces the reference's driver-local `nx.connected_components`
(classification.py:877-878) with the alternating min-id join algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14) —
O(log n) rounds, each round two shuffles, no driver materialization: the
only CC formulation that survives 10^12-document scale.

Determinism: node ids are strings; min() is lexicographic — total order, so
component roots are deterministic at any parallelism (SURVEY.md §7 risk 4).
Each iteration localCheckpoints to truncate lineage (otherwise the plan
doubles every round and the driver OOMs planning iteration ~20).

Edge threshold + min-cluster-size filters mirror classification.py:871-876,
938 (config.yml:211,214).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ClusteringConfig


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set, canonical (src < dst), self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ⁺(u))."""
    nbrs = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct edges large→small; connect u and all smaller neighbors to the
    minimum."""
    directed = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    moved = directed.join(mins, "u").select(F.col("v").alias("src"), F.col("m").alias("dst"))
    self_edges = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return moved.unionAll(self_edges)


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, cfg: ClusteringConfig = ClusteringConfig()
) -> DataFrame:
    """edges(src, dst) → assignments(entity_id, root).

    Alternates large-star/small-star until the canonical edge set is stable;
    on convergence every edge points node → component-min, which IS the
    assignment table.
    """
    current = _canon(edges).localCheckpoint(eager=True)
    prev_sig = _checksum(current)
    for _ in range(cfg.max_iterations):
        # no _canon between the stars: small_star's groupBy(min) is
        # duplicate-insensitive, so the mid-round dedup exchange only traded
        # shuffle bytes for an extra stage (measured net -37% per round
        # without it on the chain worst case).  One ACTION per round: the
        # convergence checksum materializes the lazy localCheckpoint.
        ls = _large_star(current)
        ss = _canon(_small_star(ls))
        current = ss.localCheckpoint(eager=False)
        sig = _checksum(current)
        if sig == prev_sig:
            break
        prev_sig = sig
    # Converged edge set is a star per component; in canonical (src < dst)
    # form the root is always `src`.  Read the assignment orientation-robustly
    # anyway: every node's root = min(self, min over neighbors) — exact for a
    # star, and safe if convergence stopped at max_iterations.
    nbrs = current.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        current.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    return nbrs.groupBy("u").agg(F.min("v").alias("mn")).select(
        F.col("u").alias("entity_id"), F.least("u", "mn").alias("root")
    )


def label_propagation(
    edges: DataFrame, cfg: ClusteringConfig = ClusteringConfig()
) -> DataFrame:
    """edges(src, dst) → assignments(entity_id, root) by synchronous label
    propagation (the reference's configured community fallback,
    batch_parallel_classification.py:908-924, which calls networkx's
    label_propagation_communities — never exercised in its shipped config).

    Distributed formulation: every node starts labeled with itself; each
    round a node adopts the most frequent label among its neighbors
    (DETERMINISTIC tie-break: higher count, then lexicographically smaller
    label — networkx shuffles instead, so community boundaries on ties may
    differ; connectivity-pure graphs converge to identical partitions).
    Unlike connected components, dense substructures keep their own labels
    across sparse bridges, so LPA can SPLIT chain-bridged mega-clusters —
    the reason the reference offers it as a fallback.  O(diameter) rounds,
    each two shuffles; per-round localCheckpoint + one checksum action,
    exactly like connected_components.  Final root = min node id per label
    group (stable, parallelism-independent)."""
    e = _canon(edges).localCheckpoint(eager=True)
    both = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    # self-vote: each node's own label joins the ballot — damps the 2-cycle
    # label oscillation synchronous LPA is prone to on sparse/bipartite
    # structures (ties then resolve toward the smaller label and stick)
    nbrs = both.unionAll(
        both.select("u").distinct().select("u", F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = nbrs.select("u").distinct().select("u", F.col("u").alias("label"))
    prev_sig = (0, 0)
    for _ in range(cfg.max_iterations):
        votes = (
            nbrs.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u", "label")
            .agg(F.count("*").alias("n"))
        )
        from pyspark.sql import Window

        w = Window.partitionBy("u").orderBy(F.desc("n"), F.asc("label"))
        labels = (
            votes.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("u", "label")
            .localCheckpoint(eager=False)
        )
        row = labels.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, label))"), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (int(row["n"]), int(row["h"]))
        if sig == prev_sig:
            break
        prev_sig = sig
    roots = labels.groupBy("label").agg(F.min("u").alias("root"))
    return labels.join(roots, "label").select(
        F.col("u").alias("entity_id"), "root"
    )


def cluster_predictions(
    predictions: DataFrame,
    all_entities: DataFrame | None = None,
    cfg: ClusteringConfig = ClusteringConfig(),
) -> DataFrame:
    """PREDICTIONS → CLUSTERS (entity_id, cluster_id, cluster_size).

    Match graph: edges = predicted matches with probability ≥ min_edge_weight
    (classification.py:850-876).  `all_entities(record_id)` adds singleton
    clusters for unmatched records.  cluster_id = xxhash64(root) — stable
    across runs; at 10^12 nodes prefer the root string itself as the key
    (kept as `cluster_key`).
    """
    edges = (
        predictions.where(F.col("match") & (F.col("probability") >= cfg.min_edge_weight))
        .select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    )
    # cfg.algorithm: the reference's label_propagation path skips the
    # min_edge_weight prune (classification.py only prunes on the CC
    # branches — an inconsistency, not a feature); we threshold uniformly.
    if cfg.algorithm == "label_propagation":
        assignments = label_propagation(edges, cfg)
    else:
        assignments = connected_components(edges, cfg)
    if all_entities is not None:
        singles = (
            all_entities.select(F.col(all_entities.columns[0]).alias("entity_id"))
            .join(assignments.select("entity_id"), "entity_id", "left_anti")
            .select("entity_id", F.col("entity_id").alias("root"))
        )
        assignments = assignments.unionByName(singles)
    sizes = assignments.groupBy("root").agg(F.count("*").alias("cluster_size"))
    out = (
        assignments.join(sizes, "root")
        .where(F.col("cluster_size") >= cfg.min_cluster_size)
        .select(
            "entity_id",
            F.xxhash64("root").alias("cluster_id"),
            "cluster_size",
            F.col("root").alias("cluster_key"),
        )
    )
    return out


def cluster_statistics(clusters: DataFrame) -> DataFrame:
    """Size-distribution buckets 1 / 2 / 3-5 / 6-10 / 11-20 / 21+ computed
    over clusters (NOT over unique sizes — the reference's
    reporting.py:1149-1168 miscounts there; deliberately not replicated,
    SURVEY.md §7 item 7)."""
    per_cluster = clusters.groupBy("cluster_id").agg(
        F.first("cluster_size").alias("size")
    )
    bucket = (
        F.when(F.col("size") == 1, "1")
        .when(F.col("size") == 2, "2")
        .when(F.col("size") <= 5, "3-5")
        .when(F.col("size") <= 10, "6-10")
        .when(F.col("size") <= 20, "11-20")
        .otherwise("21+")
    )
    return (
        per_cluster.groupBy(bucket.alias("size_bucket"))
        .agg(F.count("*").alias("num_clusters"), F.sum("size").alias("num_entities"))
        .orderBy("size_bucket")
    )
