"""Similarity search over an embedding column.

Three tiers, mirroring how a 100 TB pipeline actually runs ANN:

* brute_force_topk — exact cosine top-k: broadcast the (small) query set,
  one Arrow pass computes a (batch × queries) matrix product per partition,
  then a global per-query top-k.  Exact, oracle-checkable, and the right
  choice whenever |queries| is small enough to broadcast — the scan over the
  corpus is embarrassingly parallel and shuffle cost is only
  |queries| × k × partitions partial top-k rows (we pre-prune per partition).

* lsh_bucket_topk — scale path: sign-random-projection LSH (Charikar '02)
  buckets both sides; per-bucket exact rerank; probing multiple tables
  trades recall for cost.  No server, no index build beyond one shuffle.

* ivf_topk — the other classic scale path (IVF / coarse quantizer, as in
  FAISS IVF-Flat): spherical k-means centroids trained driver-side on a
  deterministic sample, every vector assigned to its nearest cell, queries
  probe their n_probe nearest cells; exact cosine rerank within probed
  cells.  Data-adaptive where SRP is oblivious — better recall/cost on
  clustered corpora; the centroid table IS the index (broadcast, no server).

Replaces the reference's Weaviate HNSW server (docker-compose.yml:18-22,
batch_parallel_indexing.py:283-294) with pure computation + shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("cosine", DoubleType(), False),
    ]
)


def brute_force_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    `queries` is a driver-side list (query_id, vector) — the broadcastable
    side.  Per partition: stack corpus vectors into one matrix, single
    matmul against the query matrix, partial top-k per query; the global
    top-k is a window over (#partitions × k) rows per query only.
    """
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    Q = np.array([q[1] for q in queries], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)

    # project before mapInPandas: it consumes whole rows, so an unprojected
    # corpus would drag every column through the scan and the Arrow boundary
    corpus = corpus.select(id_col, vec_col)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            sims = Mn @ Qn.T  # (n_rows, n_queries)
            out_q, out_n, out_s = [], [], []
            kk = min(k + (0 if include_self else 1), len(ids))
            for j in range(len(qids)):
                # prune on the ROUNDED cosine, tie-INCLUSIVE at the cut:
                # argpartition on raw floats could evict a neighbor that
                # ties at 6dp with the kk-th value, breaking the global
                # (cosine desc, neighbor_id asc) tie-break the final window
                # and the DuckDB oracle both apply.  Keeping every row at
                # or above the kk-th rounded value costs a few extra rows
                # per batch on ties; the window dedups.
                col = np.round(sims[:, j], 6)
                if kk < len(ids):
                    cut = np.partition(col, len(col) - kk)[len(col) - kk]
                    top = np.flatnonzero(col >= cut)
                else:
                    top = np.arange(len(ids))
                for i in top:
                    if not include_self and ids[i] == qids[j]:
                        continue
                    out_q.append(qids[j])
                    out_n.append(ids[i])
                    out_s.append(float(col[i]))
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_s})

    partials = corpus.mapInPandas(partial, schema=_TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")  # deterministic tie-break
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_expr(a: str, b: str) -> "F.Column":
    """Exact cosine between two array<double> columns as ONE whole-stage-
    codegen column expression (fold-based dot product and norms — JVM-side,
    no UDF, no per-row Python).  UNROUNDED; pair operators round to 6dp
    (the driver-compare convention) at their output boundary.  Shared by
    every bucketed pair join (SRP/IVF/near-dup/impute) so the cosine
    semantics can never drift between them."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (n(a) * n(b))


def _srp_planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def srp_params_for(
    threshold: float,
    target_recall: float = 0.95,
    max_tables: int = 64,
    max_planes: int = 16,
) -> tuple[int, int, float]:
    """S-curve-derived (n_planes, n_tables, expected_recall) for an SRP-LSH
    cosine join at `threshold`.  Per-plane sign-collision probability for a
    pair at cosine τ is p = 1 − arccos(τ)/π; a k-plane table collides with
    p^k and T independent tables recover the pair with 1 − (1−p^k)^T.
    Chooses the LARGEST k (most selective buckets → cheapest join) whose
    required table count T = ⌈ln(1−R)/ln(1−p^k)⌉ still fits `max_tables` —
    low thresholds genuinely need few planes / many tables (θ≈70° at τ=0.35
    gives p≈0.61), high thresholds support many planes / few tables; a
    FIXED k across regimes silently collapses recall on one side (measured:
    8 planes ≈ 7% recall at this corpus's τ≈0.33 regime, tests/test_recall).
    """
    import math

    tau = min(max(threshold, -1.0), 1.0)
    p = 1.0 - math.acos(tau) / math.pi
    if p <= 0.0:  # τ = −1: sign patterns never collide — no LSH regime
        return 1, max_tables, 0.0
    best = (1, max_tables)
    for k in range(1, max_planes + 1):
        pk = p**k
        if pk >= 1.0:  # τ = 1 exactly
            best = (k, 1)
            continue
        t_needed = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pk))
        if t_needed <= max_tables:
            best = (k, t_needed)
        else:
            break
    k, t = best
    expected = 1.0 - (1.0 - p**k) ** t
    return k, t, expected


def make_srp_bucket_udf(dim: int, n_planes: int = 12, n_tables: int = 4, seed: int = 7):
    """Arrow UDF: vector → array of n_tables bucket keys ('t<i>:<signbits>').
    Sign-random-projection: bucket = sign pattern of n_planes projections;
    multiple tables = independent plane sets (probing ↑recall)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    planes = [_srp_planes(dim, n_planes, seed + t) for t in range(n_tables)]

    @pandas_udf(ArrayType(StringType()))
    def srp_udf(vecs: pd.Series) -> pd.Series:
        M = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        keys = []
        if len(M) == 0:
            return pd.Series(keys)
        sigs = []
        for t, P in enumerate(planes):
            bits = (M @ P.T) > 0  # (n, n_planes)
            weights = 1 << np.arange(n_planes)
            codes = (bits * weights).sum(axis=1)
            sigs.append([f"t{t}:{int(c)}" for c in codes])
        for row in zip(*sigs):
            keys.append(list(row))
        return pd.Series(keys)

    return srp_udf


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 4096,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Spherical k-means centroids (unit vectors) on a DETERMINISTIC sample:
    the first `sample` rows by id — stable across runs and parallelism
    levels, unlike rand()-sampling.  Driver-side numpy Lloyd iterations:
    the sample is O(thousands) regardless of corpus size; only the (tiny)
    centroid matrix ships back out."""
    # hash-ordered sample: deterministic like "first N ids" but unbiased when
    # ids correlate with content (e.g. a corpus sorted by topic) — xxhash64
    # scrambles the order while staying stable across runs and parallelism
    pdf = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(sample)
        .toPandas()
    )
    if not len(pdf):
        return np.zeros((0, 0))
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_centroids = min(n_centroids, len(Xn))
    rng = np.random.Generator(np.random.PCG64(seed))
    C = Xn[rng.choice(len(Xn), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(n_centroids):
            members = Xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def make_ivf_cells_udf(centroids: np.ndarray, n_probe: int):
    """Arrow UDF: vector → struct(cell int, probes array<int>).  cell =
    nearest centroid (home cell, where the vector is indexed); probes =
    n_probe nearest cells (what a query scans)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    schema = StructType(
        [
            StructField("cell", IntegerType(), False),
            StructField("probes", ArrayType(IntegerType()), False),
        ]
    )
    C = centroids
    np_ = min(n_probe, len(C)) if len(C) else 0

    @pandas_udf(schema)
    def cells_udf(vecs: pd.Series) -> pd.DataFrame:
        if not len(vecs):
            return pd.DataFrame({"cell": [], "probes": []})
        M = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = Mn @ C.T  # (n, n_centroids)
        order = np.argsort(-sims, axis=1)[:, :np_]
        return pd.DataFrame(
            {
                "cell": order[:, 0].astype(np.int32),
                "probes": [row.astype(np.int32).tolist() for row in order],
            }
        )

    return cells_udf


def _grid_salt_bipartite(
    queries: DataFrame,
    members: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
) -> tuple[DataFrame, DataFrame]:
    """Bound hot join keys in a BIPARTITE join (queries × members) by grid
    decomposition: a key with qn queries / mn members gets a Gq × Gm grid
    (G = ceil(n / cap)); a query lands in row a = hash(id) mod Gq and is
    exploded across all Gm columns; a member lands in column b and is
    exploded across all Gq rows.  A (query, member) pair co-located on the
    key meets in EXACTLY one grid bucket, (a_q, b_m), so join output is
    unchanged while no bucket holds more than ~cap rows per side.  (The
    self-join analog is blocking.salt_hot_blocks' triangle decomposition;
    the grid form is needed here because the two sides have different
    memberships — a member lives in one home cell, a query probes several.)
    Deterministic: group assignment is xxhash64(id)."""
    qs = queries.groupBy(key_col).agg(F.count("*").alias("qn"))
    ms = members.groupBy(key_col).agg(F.count("*").alias("mn"))
    gq = F.ceil(F.col("qn") / F.lit(cap)).cast("int").alias("Gq")
    gm = F.ceil(F.col("mn") / F.lit(cap)).cast("int").alias("Gm")
    # inner join: keys absent from either side produce no pairs anyway
    sz = qs.join(ms, key_col).select(key_col, gq, gm)
    q2 = (
        queries.join(sz, key_col)
        .withColumn("__a", F.pmod(F.xxhash64(id_col), F.col("Gq")).cast("int"))
        .withColumn("__b", F.explode(F.sequence(F.lit(0), F.col("Gm") - 1)))
    )
    m2 = (
        members.join(sz, key_col)
        .withColumn("__b", F.pmod(F.xxhash64(id_col), F.col("Gm")).cast("int"))
        .withColumn("__a", F.explode(F.sequence(F.lit(0), F.col("Gq") - 1)))
    )
    newkey = F.concat_ws("#", key_col, "__a", "__b").alias(key_col)
    keep = [c for c in queries.columns if c != key_col]
    return (
        q2.select(*keep, newkey),
        m2.select(*[c for c in members.columns if c != key_col], newkey),
    )


def ivf_topk(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    sample: int = 4096,
    seed: int = 7,
    max_cell_size: int | None = 5000,
) -> DataFrame:
    """Approximate all-pairs top-k via an IVF coarse quantizer: each vector
    is indexed in its home cell; as a query it probes its n_probe nearest
    cells; exact cosine rerank within probed cells (JVM exprs, like
    lsh_bucket_topk).  The cell join shuffles on cell id only — cost
    Σ_cell |probing queries| × |members|, sub-quadratic when the quantizer
    spreads the corpus.  Dense cells (exactly the risk on the clustered
    corpora IVF is pitched for) are grid-salted to ≤ ~max_cell_size rows per
    join bucket with output provably unchanged (_grid_salt_bipartite)."""
    from pyspark import StorageLevel

    C = train_ivf_centroids(corpus, n_centroids, id_col, vec_col, sample, seed=seed)
    cells = make_ivf_cells_udf(C, n_probe)
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("c", cells("vec"))
    # members + queries (and, with salting, the cell-size aggs) all read
    # base: materialize once so the assignment UDF runs once per vector.
    # Cache ownership: the block lives for THIS plan; loop callers should
    # spark.catalog.clearCache() between invocations (bench.py does)
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    members = base.select("id", "vec", F.col("c.cell").alias("cell"))
    queries = base.select("id", "vec", F.explode(F.col("c.probes")).alias("cell"))
    if max_cell_size:
        queries, members = _grid_salt_bipartite(
            queries, members, key_col="cell", id_col="id", cap=max_cell_size
        )
    l = queries.alias("l")
    r = members.alias("r")
    pairs = (
        l.join(r, "cell")
        .where(F.col("l.id") != F.col("r.id"))
        .select(
            F.col("l.id").alias("query_id"),
            F.col("r.id").alias("neighbor_id"),
            F.round(cosine_expr("l.vec", "r.vec"), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int = 12,
    n_tables: int = 4,
    max_bucket_size: int | None = 5000,
) -> DataFrame:
    """Approximate all-pairs top-k: SRP-bucket the corpus, exact cosine
    rerank within each bucket, global per-id top-k across tables.  The
    self-join shuffles on bucket key only — sub-quadratic for spread-out
    corpora.  Hot buckets (a dense direction cluster collapses many vectors
    into one sign pattern) are rewritten by blocking.salt_hot_blocks'
    triangle decomposition: every pair still meets in exactly one salted
    bucket (both orderings, so per-query top-k is unchanged) while no join
    bucket exceeds ~2·max_bucket_size members.
    """
    from pyspark import StorageLevel

    from ..config import BlockingConfig
    from .blocking import salt_hot_blocks, salted_pair_predicate

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    srp = make_srp_bucket_udf(dim, n_planes=n_planes, n_tables=n_tables)
    v = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("bucket", F.explode(srp("vec")))
    if max_bucket_size:
        # salting reads v twice (bucket-size agg + join); materialize so the
        # SRP UDF runs once per vector.  Cache ownership: the block lives
        # for THIS plan; loop callers should clearCache() between calls
        v = v.persist(StorageLevel.MEMORY_AND_DISK)
        v = salt_hot_blocks(
            v, BlockingConfig(max_block_size=max_bucket_size), key_col="bucket"
        )
    l = v.alias("l")
    r = v.alias("r")
    joined = l.join(r, "bucket").where(F.col("l.id") != F.col("r.id"))
    if max_bucket_size:
        joined = joined.where(salted_pair_predicate())
    pairs = (
        joined.select(
            F.col("l.id").alias("query_id"),
            F.col("r.id").alias("neighbor_id"),
            F.round(cosine_expr("l.vec", "r.vec"), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
