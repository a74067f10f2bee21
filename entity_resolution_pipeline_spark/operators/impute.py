"""Vector hot-deck imputation for null fields.

Re-expresses the reference's imputation stage (src/batch_parallel_imputation
.py:444-541): for each record missing `provision`/`subjects`
(config.yml:67-69), find the k=10 nearest records BY COMPOSITE VECTOR that
do have the field (Weaviate `near_vector` + field_type filter,
imputation.py:458-487), keep candidates with cosine ≥ 0.30
(config.yml:70-72), and impute the missing field's vector by
`average | weighted_average | nearest` (imputation.py:493-541).

Spark-first: the Weaviate ANN server becomes SRP-LSH bucketing (ann.py) —
donors and targets are bucketed by their composite vector, the KNN join runs
per bucket, and the per-target top-k is a window.  The vector average is
pure JVM (posexplode → groupBy(pos) → collect sorted) — no UDF in the
aggregation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import ImputationConfig
from .ann import cosine_expr as _cosine_expr
from .ann import make_srp_bucket_udf


def knn_candidates(
    targets: DataFrame,
    donors: DataFrame,
    cfg: ImputationConfig = ImputationConfig(),
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """targets(record_id, query_vec) × donors(donor_id, query_vec,
    donor_vec[, donor_value]) → per-target top-k donors by composite cosine
    (reference J2/W1: near_vector + limit + similarity threshold)."""
    if dim is None:
        dim = len(targets.select("query_vec").first()[0])
    srp = make_srp_bucket_udf(dim, n_planes=n_planes, n_tables=n_tables)
    t = targets.select(
        "record_id",
        F.col("query_vec").cast("array<double>").alias("tv"),
    ).withColumn("bucket", F.explode(srp("tv")))
    d = donors.withColumn(
        "dv", F.col("query_vec").cast("array<double>")
    ).withColumn("bucket", F.explode(srp("query_vec")))
    joined = (
        t.join(d, "bucket")
        .where(F.col("record_id") != F.col("donor_id"))
        .withColumn("cosine", _cosine_expr("tv", "dv"))
        .where(F.col("cosine") >= cfg.vector_similarity_threshold)
        .select("record_id", "donor_id", "cosine", "donor_vec", *(
            ["donor_value"] if "donor_value" in donors.columns else []
        ))
        .dropDuplicates(["record_id", "donor_id"])
    )
    w = Window.partitionBy("record_id").orderBy(F.desc("cosine"), F.asc("donor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cfg.max_candidates)
    )


def impute_vectors(
    candidates: DataFrame, cfg: ImputationConfig = ImputationConfig()
) -> DataFrame:
    """top-k candidate rows → (record_id, imputed_vec, n_donors[, imputed_value]).

    average / weighted_average: element-wise (similarity-weighted) mean of
    donor field vectors via posexplode + groupBy(pos) — pure JVM, no UDF.
    nearest: rank-1 donor's vector (and value when present), reference
    imputation.py:494-501.
    """
    has_value = "imputed_value" if "donor_value" in candidates.columns else None
    if cfg.method == "nearest":
        sel = [
            "record_id",
            F.col("donor_vec").alias("imputed_vec"),
            F.lit(1).alias("n_donors"),
        ]
        if has_value:
            sel.append(F.col("donor_value").alias("imputed_value"))
        return candidates.where(F.col("rank") == 1).select(*sel)

    from pyspark import StorageLevel

    # persisted: the averaging path consumes candidates twice (per-position
    # mean + donor count) — without the persist the whole SRP-bucketed KNN
    # join (including its Arrow UDF stages) re-executes per consumer.
    # Cache ownership: lives for this plan; loop callers clearCache().
    candidates = candidates.persist(StorageLevel.MEMORY_AND_DISK)
    weight = F.col("cosine") if cfg.method == "weighted_average" else F.lit(1.0)
    exploded = candidates.select(
        "record_id",
        weight.alias("w"),
        F.posexplode("donor_vec").alias("pos", "x"),
    )
    per_pos = exploded.groupBy("record_id", "pos").agg(
        (F.sum(F.col("x") * F.col("w")) / F.sum("w")).alias("v")
    )
    n_donors = candidates.groupBy("record_id").agg(F.count("*").alias("n_donors"))
    vecs = (
        per_pos.groupBy("record_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
            ).alias("imputed_vec")
        )
    )
    return vecs.join(n_donors, "record_id")


def impute_missing_fields(
    rfh: DataFrame,
    vectors: DataFrame,
    unique_strings: DataFrame,
    cfg: ImputationConfig = ImputationConfig(),
) -> DataFrame:
    """End-to-end imputation over the record_field_hashes table: for each
    field in cfg.fields_to_impute, records whose field hash is the "NULL"
    sentinel get an imputed field vector from their composite-vector
    neighborhood.  Returns (record_id, field, imputed_vec, n_donors
    [, imputed_value])."""
    valid = lambda c: c.isNotNull() & (c != "NULL")  # noqa: E731
    vec = vectors.select("hash", "embedding")
    out: DataFrame | None = None
    for field in cfg.fields_to_impute:
        base = rfh.select("record_id", "composite", field).where(
            valid(F.col("composite"))
        )
        with_cvec = base.join(
            vec.withColumnRenamed("hash", "composite").withColumnRenamed(
                "embedding", "query_vec"
            ),
            "composite",
        )
        targets = with_cvec.where(~valid(F.col(field))).select("record_id", "query_vec")
        donors = (
            with_cvec.where(valid(F.col(field)))
            .join(
                vec.withColumnRenamed("hash", field).withColumnRenamed(
                    "embedding", "donor_vec"
                ),
                field,
            )
            .join(
                unique_strings.select(
                    F.col("hash").alias(field), F.col("value").alias("donor_value")
                ),
                field,
            )
            .select(
                F.col("record_id").alias("donor_id"),
                "query_vec",
                "donor_vec",
                "donor_value",
            )
        )
        if targets.isEmpty() or donors.isEmpty():
            continue
        cands = knn_candidates(targets, donors, cfg)
        imputed = impute_vectors(cands, cfg).withColumn("field", F.lit(field))
        out = imputed if out is None else out.unionByName(imputed, allowMissingColumns=True)
    if out is None:
        raise ValueError("nothing to impute: no targets or no donors")
    return out
