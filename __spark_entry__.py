"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship corpus-dedup pipeline on /root/testdata/sf0.001.
`queries()` — one entry per implemented operator family from SURVEY.md §2
plus the training-data-pipeline additions (dedup suite, ANN, text analysis).
`oracle_sql()` — DuckDB-equivalent ANSI SQL for every SQL-expressible query;
non-SQL-expressible ops (UDF cascades, LSH candidate generation, the trained
classifier) are rows-only by design and covered by unit/e2e tests instead.

Column-name + rounding discipline: every computed column is aliased
identically on both sides, and every float that crosses the engine boundary
is `round(x, 6)` (or exact-decimal summed) on both sides so the driver's
order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: corpus near-dup detection + transitive clustering over the
    sf0.001 documents table — MinHash-LSH blocking → exact-Jaccard verify →
    large-star/small-star connected components → per-cluster rollup.
    This is the engine's mainline (the candidate-generation path the
    reference designed but never shipped, SURVEY.md §3 EP3), on the driver's
    own testdata."""
    from entity_resolution_pipeline_spark.operators import cluster as G
    from entity_resolution_pipeline_spark.operators import dedup as D

    docs = _read(spark, "/root/testdata/sf0.001", "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.5)
    edges = pairs.select(
        F.col("left_id").cast("string").alias("src"),
        F.col("right_id").cast("string").alias("dst"),
    )
    assignments = G.connected_components(edges)
    sizes = assignments.groupBy("root").agg(F.count("*").alias("cluster_size"))
    return (
        assignments.join(sizes, "root")
        .select(
            F.col("entity_id").alias("doc_id"),
            F.col("root").alias("cluster_key"),
            "cluster_size",
        )
        .orderBy("cluster_key", "doc_id")
    )


# ------------------------------------------------------------------- queries

_STOPWORDS_SQL = "['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be']"

_FINGERPRINT_SQL = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"


def q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 at document granularity: hash-groupBy dedup dictionary."""
    from entity_resolution_pipeline_spark.functions.text_analysis import exact_fingerprint_col

    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        exact_fingerprint_col(F.col("text")).alias("fingerprint"), "doc_id"
    ).groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("dup_count")
    )


def q_distinct_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduped corpus: one row (min doc_id) per exact-duplicate group."""
    from entity_resolution_pipeline_spark.operators.dedup import distinct_documents

    return distinct_documents(_read(spark, sf_dir, "documents")).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace token counting per document."""
    from entity_resolution_pipeline_spark.functions.text_analysis import token_count_col

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count_col(F.col("text")).alias("n_tokens"))


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: quality-scoring battery (length / alpha / stopword /
    token-length ratios) as pure column expressions."""
    from entity_resolution_pipeline_spark.functions.text_analysis import quality_metrics_cols

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", *quality_metrics_cols(F.col("text")))


def q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (trigram profiles) → corpus distribution.
    Rows-only: the scoring UDF is not SQL-expressible."""
    from entity_resolution_pipeline_spark.functions.text_analysis import make_langid_udf

    docs = _read(spark, sf_dir, "documents")
    udf = make_langid_udf()
    return docs.select(udf("text").alias("lang_pred")).groupBy("lang_pred").agg(
        F.count("*").alias("n_docs")
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-3-gram Jaccard set-similarity join (≥ 0.12)."""
    from entity_resolution_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), n=3, threshold=0.12
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates + exact-Jaccard verify (≥ 0.5, the
    threshold the 16-band × 4-row S-curve is centered on: (1/16)^(1/4) = 0.5).
    Rows-only: LSH banding is not SQL-expressible."""
    from entity_resolution_pipeline_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_read(spark, sf_dir, "documents"), threshold=0.5)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup pairs (hamming ≤ 3). Rows-only."""
    from entity_resolution_pipeline_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_read(spark, sf_dir, "documents"))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine ≥ 0.35), pure JVM exprs."""
    from entity_resolution_pipeline_spark.operators.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(_read(spark, sf_dir, "embeddings"), threshold=0.35)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 10 (J2/W1: the
    reference's Weaviate near_vector + limit re-expressed)."""
    from entity_resolution_pipeline_spark.operators.ann import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.where("vec_id < 10").collect()
    ]
    return brute_force_topk(emb, queries, k=5)


def q_field_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-partition-key field statistics (count / distinct / mean len)."""
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W4: top-5 by value per event_type, deterministic tie-break."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("event_type", "event_id", F.round("value", 6).alias("value"), "rank")
    )


def q_agg_stats_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-class mean/median/min/max/stddev battery."""
    events = _read(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.round(F.stddev("value"), 6).alias("std_value"),
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/§2.6: resume-style anti-join — customers with no orders."""
    customer = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


def q_revenue_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3 + A1: three-way equi-join + grouped aggregate.  Money is summed
    as DECIMAL so the result is exact and order-independent across engines."""
    lineitem = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") *
           (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


def q_cluster_size_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: cluster-size distribution buckets, over per-user event counts."""
    events = _read(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(F.count("*").alias("size"))
    bucket = (
        F.when(F.col("size") == 1, "1")
        .when(F.col("size") == 2, "2")
        .when(F.col("size") <= 5, "3-5")
        .when(F.col("size") <= 10, "6-10")
        .when(F.col("size") <= 20, "11-20")
        .otherwise("21+")
    )
    return per_user.groupBy(bucket.alias("size_bucket")).agg(
        F.count("*").alias("num_clusters"), F.sum("size").alias("num_entities")
    )


def q_connected_components_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: large-star/small-star CC on per-lang doc_id chains (worst-case
    topology); ground truth is SQL-computable because each lang's chain is
    one component rooted at its lexicographic-min id."""
    from pyspark.sql import Window

    from entity_resolution_pipeline_spark.operators.cluster import connected_components

    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy("doc_id")
    edges = (
        docs.withColumn("prev", F.lag("doc_id").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            F.col("prev").cast("string").alias("src"),
            F.col("doc_id").cast("string").alias("dst"),
        )
    )
    return connected_components(edges).select("entity_id", "root")


def q_harmonic_product_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7-F9: interaction-feature column math (harmonic / product / ratio)."""
    li = _read(spark, sf_dir, "lineitem").where("l_orderkey % 20 = 0")
    a = F.col("l_discount")
    b = F.col("l_tax")
    harmonic = F.when((a > 0) & (b > 0), 2 * a * b / (a + b)).otherwise(0.0)
    ratio = F.when(b > 0, 2 / (1 + F.exp(-a / b)) - 1).otherwise(0.0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(harmonic, 6).alias("harmonic"),
        F.round(a * b, 6).alias("product"),
        F.round(ratio, 6).alias("ratio"),
    )


def q_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: levenshtein similarity 1 − dist/max_len over same-brand part-name
    pairs (JVM builtin levenshtein)."""
    part = _read(spark, sf_dir, "part").where("p_partkey < 150")
    l = part.alias("l")
    r = part.alias("r")
    sim = 1.0 - F.levenshtein(F.col("l.p_name"), F.col("r.p_name")) / F.greatest(
        F.length("l.p_name"), F.length("r.p_name")
    )
    return (
        l.join(r, F.col("l.p_brand") == F.col("r.p_brand"))
        .where(F.col("l.p_partkey") < F.col("r.p_partkey"))
        .select(
            F.col("l.p_partkey").alias("left_key"),
            F.col("r.p_partkey").alias("right_key"),
            F.round(sim, 6).alias("lev_sim"),
        )
    )


def q_jaro_winkler_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: Jaro-Winkler over the same pair set (Arrow pandas UDF)."""
    from entity_resolution_pipeline_spark.functions.similarity import make_jaro_winkler_udf

    part = _read(spark, sf_dir, "part").where("p_partkey < 150")
    jw = make_jaro_winkler_udf()
    l = part.alias("l")
    r = part.alias("r")
    return (
        l.join(r, F.col("l.p_brand") == F.col("r.p_brand"))
        .where(F.col("l.p_partkey") < F.col("r.p_partkey"))
        .select(
            F.col("l.p_partkey").alias("left_key"),
            F.col("r.p_partkey").alias("right_key"),
            F.round(jw(F.col("l.p_name"), F.col("r.p_name")), 6).alias("jw_sim"),
        )
    )


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: whitespace normalization as JVM exprs (byte-identity oracle)."""
    from entity_resolution_pipeline_spark.functions.normalize import normalize_ws_col

    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", normalize_ws_col(F.col("text")).alias("text_norm"))


def q_session_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-class lead/lag: per-user inter-event gap in exact microseconds
    (sub-second-precision timestamps make floor-of-seconds engine-dependent)."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        events.select(
            "user_id",
            "event_id",
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(prev.cast("timestamp"))
            ).alias("gap_micros"),
        )
        .where(F.col("gap_micros").isNotNull())
    )


def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate (batch form of the streaming rollup):
    per (hour, event_type) counts + decimal-exact value sums."""
    events = _read(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def q_birth_death_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: ordered 15-pattern birth/death cascade over synthetic person
    strings (rows-only: regex-cascade priority is not SQL-expressible)."""
    from entity_resolution_pipeline_spark import synth
    from entity_resolution_pipeline_spark.functions.birth_death import birth_death_udf
    from entity_resolution_pipeline_spark.operators.extract import extract_records

    pages = synth.pages_df(spark, 500)
    records = extract_records(pages)
    return records.select(
        "record_id", birth_death_udf("person").alias("bd")
    ).select("record_id", "bd.birth_year", "bd.death_year")


def q_srp_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate all-pairs top-3 neighbors via sign-random-projection LSH
    buckets + per-bucket exact rerank (the scale path of ann.py).
    Rows-only: bucket membership is algorithm-specific."""
    from entity_resolution_pipeline_spark.operators.ann import lsh_bucket_topk

    emb = _read(spark, sf_dir, "embeddings")
    return lsh_bucket_topk(emb, k=3, dim=64, n_planes=8, n_tables=4)


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate all-pairs top-3 neighbors via an IVF coarse quantizer
    (spherical k-means cells + n_probe probing, FAISS-IVF-Flat style).
    Rows-only: cell assignment is algorithm-specific."""
    from entity_resolution_pipeline_spark.operators.ann import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    return ivf_topk(emb, k=3, n_centroids=16, n_probe=4)


def q_winnow_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (winnowing, Schleimer et al.): near-dup
    candidates = documents sharing ≥ 25 fingerprints (k=16-grams keep the
    fingerprints selective on this small-vocabulary corpus). Rows-only."""
    from entity_resolution_pipeline_spark.config import python_stage_width
    from entity_resolution_pipeline_spark.functions.text_analysis import make_winnow_udf

    docs = _read(spark, sf_dir, "documents").repartition(python_stage_width(spark))
    w = make_winnow_udf(k=16, window=6)
    fps = docs.select("doc_id", F.explode(w("text")).alias("fp")).dropDuplicates()
    l = fps.alias("l")
    r = fps.alias("r")
    return (
        l.join(r, "fp")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("left_id"), F.col("r.doc_id").alias("right_id"))
        .agg(F.count("*").alias("shared_fingerprints"))
        .where(F.col("shared_fingerprints") >= 25)
    )


def q_impute_hotdeck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector hot-deck imputation (reference batch_parallel_imputation.py) on
    the synthetic fixture: records missing subjects get nearest-donor values
    by composite-vector similarity.  Rows-only: KNN + vector averaging."""
    from entity_resolution_pipeline_spark import synth
    from entity_resolution_pipeline_spark.config import DEFAULT_CONFIG, ImputationConfig
    from entity_resolution_pipeline_spark.operators import embedding as E
    from entity_resolution_pipeline_spark.operators import extract as X
    from entity_resolution_pipeline_spark.operators import preprocess as P
    from entity_resolution_pipeline_spark.operators.impute import impute_missing_fields

    pages = synth.pages_df(spark, 300)
    melted = P.melt_fields(X.extract_records(pages))
    rfh = P.record_field_hashes(melted)
    uniq = P.unique_strings(melted)
    vectors = (
        E.embed_unique_strings(melted, DEFAULT_CONFIG.embedding)
        .select("hash", "embedding")
        .dropDuplicates(["hash"])
    )
    out = impute_missing_fields(rfh, vectors, uniq, ImputationConfig(method="nearest"))
    return out.select("record_id", "field", "n_donors", "imputed_value")


def q_er_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ER flagship on the synthetic fixture: blocking → scoring →
    clustering → size-bucket stats (rows-only; pinned by e2e tests)."""
    from entity_resolution_pipeline_spark import synth
    from entity_resolution_pipeline_spark.operators.cluster import cluster_statistics
    from entity_resolution_pipeline_spark.plans import pipeline as PL
    from entity_resolution_pipeline_spark.schemas import LABELED_PAIRS

    pages = synth.pages_df(spark, 600)
    gt = spark.createDataFrame(synth.ground_truth_pdf(600), LABELED_PAIRS)
    res = PL.run_dedup(pages, labeled_pairs=gt)
    return cluster_statistics(res.clusters)


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4's 'overall' row generalized: ROLLUP(n_name, o_year) subtotal
    lattice over the 3-way join — per (nation, year), per nation, grand
    total.  Exercises grouping sets; money in DECIMAL then cast."""
    li = _read(spark, sf_dir, "lineitem")
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate"))
        .rollup("n_name", "o_year")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_supplier_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-class ranking: dense_rank of suppliers by revenue within nation,
    top 3 kept.  Ordering on the EXACT decimal sum (not the double cast) so
    rank ties break identically in Spark and the oracle."""
    from pyspark.sql import Window

    li = _read(spark, sf_dir, "lineitem")
    s = _read(spark, sf_dir, "supplier")
    n = _read(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")))
    per_supp = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(rev).alias("rev_d"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("rev_d"), F.asc("s_suppkey"))
    return (
        per_supp.withColumn("rnk", F.dense_rank().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "n_name",
            "s_suppkey",
            F.col("rev_d").cast("double").alias("revenue"),
            "rnk",
        )
    )


def q_repeat_customer_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 set ops: INTERSECT of the 1995 and 1996 customer-key sets."""
    o = _read(spark, sf_dir, "orders").withColumn("y", F.year("o_orderdate"))
    c95 = o.where(F.col("y") == 1995).select("o_custkey")
    c96 = o.where(F.col("y") == 1996).select("o_custkey")
    return c95.intersect(c96)


def q_order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per status × priority (A7's confusion-matrix
    shape generalized).  Explicit value list keeps the schema static."""
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o = _read(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .count()
        .na.fill(0, [p for p in prios])
    )
    renames = {p: f"p{p[0]}" for p in prios}  # p1..p5: oracle-safe names
    for old, new in renames.items():
        piv = piv.withColumnRenamed(old, new)
    return piv


def q_string_hash_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 string-level dedup dictionary: md5 → occurrence count over raw
    document text (the unique_strings/string_counts tables,
    preprocessing.py:279-295)."""
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("hash")).agg(F.count("*").alias("n"))


def q_media_features_by_kind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: deterministic synthetic media → binary-column
    feature extraction (mapInPandas) → per-kind stats.  Rows-only: media is
    synthesized (decode stubs documented in operators/multimodal.py)."""
    from entity_resolution_pipeline_spark.operators import multimodal as M

    media = M.synthetic_media_df(spark, 120)
    feats = M.extract_media_features(media, dim=16)
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("content_hash").alias("n_distinct"),
        )
    )


def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: decision-threshold sweep on the labeled fixture — (threshold,
    precision, recall, f1) per grid point.  Rows-only: model training."""
    import pandas as pd

    from entity_resolution_pipeline_spark import synth
    from entity_resolution_pipeline_spark.operators import classify as C
    from entity_resolution_pipeline_spark.operators import features as FE
    from entity_resolution_pipeline_spark.config import DEFAULT_CONFIG
    from entity_resolution_pipeline_spark.plans import pipeline as PL
    from entity_resolution_pipeline_spark.schemas import LABELED_PAIRS
    import numpy as np

    pages = synth.pages_df(spark, 600)
    gt = spark.createDataFrame(synth.ground_truth_pdf(600), LABELED_PAIRS)
    res = PL.run_labeled(pages, gt, DEFAULT_CONFIG)
    feature_cols = FE.selected_feature_names(
        DEFAULT_CONFIG.features, DEFAULT_CONFIG.feature_selection
    )
    pairs = gt.select(
        F.col("left").alias("left_id"), F.col("right").alias("right_id"), "match"
    )
    feats = PL.featurize_pairs(pairs, res, DEFAULT_CONFIG).toPandas()
    X = feats[feature_cols].to_numpy(dtype=float)
    y = feats["match"].to_numpy(dtype=int)
    m = res.model
    scaled = (X - np.array([m.scaler[c][0] for c in feature_cols])) / np.array(
        [m.scaler[c][1] for c in feature_cols]
    ) if getattr(m, "scaler", None) else X
    probs = C.sigmoid(scaled @ m.weights + m.bias)
    rows = []
    for t in np.linspace(0.1, 0.9, 9):
        ev = C.evaluate(y, probs, float(t))
        rows.append(
            {
                "threshold": round(float(t), 2),
                "precision": round(ev["precision"], 6),
                "recall": round(ev["recall"], 6),
                "f1": round(ev["f1"], 6),
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text mining: per-document top-3 TF-IDF terms (alpha-token split,
    ln(N/df), deterministic tie-break on term)."""
    from pyspark.sql import Window

    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf")
    )


def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (linear interpolation) of document length
    per language — percentile(), not approx_percentile, so the oracle can
    match bit-for-bit."""
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 6).alias("p99"),
    )


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session flag →
    running sum → per-session aggregates.  The batch form of the streaming
    session-window pattern."""
    from pyspark.sql import Window

    events = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
            > 1800 * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "session_idx",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def q_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: top-10 revenue among BUILDING-segment orders placed
    before / shipped after 1997-06-01 (3-way join, broadcastable dims)."""
    cutoff = "1997-06-01"
    customer = _read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _read(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    lineitem = _read(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus preparation: quality gate (token bounds + alpha
    ratio) + exact-dedup canonicalization in one declarative plan."""
    from entity_resolution_pipeline_spark.operators.dedup import clean_corpus

    return clean_corpus(_read(spark, sf_dir, "documents"))


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the events table's JSON `props`
    column (get_json_object pushdown-friendly path) and aggregate the
    extracted field per event type."""
    events = _read(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("double").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts, top-100 (n-gram construction via zip_with over
    adjacent token slices — no UDF)."""
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != "").alias(
            "t"
        )
    ).where(F.size("t") >= 2)
    bigrams = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(100)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dedup_groups": q_exact_dedup_groups,
        "distinct_documents": q_distinct_documents,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "lang_id_counts": q_lang_id_counts,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "embedding_neardup": q_embedding_neardup,
        "ann_topk": q_ann_topk,
        "field_stats": q_field_stats,
        "topk_per_group": q_topk_per_group,
        "agg_stats_by_class": q_agg_stats_by_class,
        "anti_join": q_anti_join,
        "revenue_per_nation": q_revenue_per_nation,
        "cluster_size_buckets": q_cluster_size_buckets,
        "connected_components_chain": q_connected_components_chain,
        "harmonic_product_features": q_harmonic_product_features,
        "levenshtein_pairs": q_levenshtein_pairs,
        "jaro_winkler_pairs": q_jaro_winkler_pairs,
        "normalize_text": q_normalize_text,
        "session_deltas": q_session_deltas,
        "hourly_rollup": q_hourly_rollup,
        "birth_death_extract": q_birth_death_extract,
        "srp_ann_topk": q_srp_ann_topk,
        "ivf_ann_topk": q_ivf_ann_topk,
        "winnow_candidates": q_winnow_candidates,
        "impute_hotdeck": q_impute_hotdeck,
        "er_cluster_stats": q_er_cluster_stats,
        "revenue_rollup": q_revenue_rollup,
        "supplier_rank_in_nation": q_supplier_rank_in_nation,
        "repeat_customer_intersect": q_repeat_customer_intersect,
        "order_priority_pivot": q_order_priority_pivot,
        "string_hash_counts": q_string_hash_counts,
        "media_features_by_kind": q_media_features_by_kind,
        "threshold_sweep": q_threshold_sweep,
        "tfidf_top_terms": q_tfidf_top_terms,
        "doc_length_quantiles": q_doc_length_quantiles,
        "sessionization": q_sessionization,
        "top_unshipped_orders": q_top_unshipped_orders,
        "bigram_counts": q_bigram_counts,
        "json_props_stats": q_json_props_stats,
        "clean_corpus": q_clean_corpus,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup_groups": f"""
            SELECT {_FINGERPRINT_SQL} AS fingerprint,
                   min(doc_id) AS canonical_id,
                   count(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "distinct_documents": f"""
            SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
            FROM documents d
            JOIN (SELECT min(doc_id) AS doc_id FROM documents
                  GROUP BY {_FINGERPRINT_SQL}) k USING (doc_id)
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
            FROM documents
        """,
        "quality_scores": rf"""
            WITH base AS (
              SELECT doc_id, text, trim(text) AS t,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
              FROM documents)
            SELECT doc_id,
                   length(text) AS n_chars,
                   n_tokens,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         / greatest(length(text), 1), 6) AS alpha_ratio,
                   round(len(list_filter(regexp_split_to_array(t, '\s+'),
                                         x -> list_contains({_STOPWORDS_SQL}, lower(x))))
                         / greatest(n_tokens, 1), 6) AS stopword_ratio,
                   round((length(t) - n_tokens + 1) / greatest(n_tokens, 1), 6) AS mean_token_len
            FROM base
        """,
        "ngram_jaccard_pairs": r"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
              FROM documents),
            pos AS (
              SELECT doc_id, t, generate_subscripts(t, 1) AS i FROM toks),
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
              FROM pos WHERE i + 2 <= len(t)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            common AS (
              SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS c
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
            SELECT l AS left_id, r AS right_id,
                   round(c / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = l
            JOIN sizes sb ON sb.doc_id = r
            WHERE c / (sa.sz + sb.sz - c) >= 0.12
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS left_id, b.vec_id AS right_id,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
            scored AS (
              SELECT qid, nid,
                     round(list_cosine_similarity(qv, cv), 6) AS cosine
              FROM q, c WHERE qid != nid)
            SELECT qid AS query_id, nid AS neighbor_id, cosine, rank FROM (
              SELECT qid, nid, cosine,
                     row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
              FROM scored) WHERE rank <= 5
        """,
        "field_stats": """
            SELECT lang, count(*) AS n_docs,
                   count(DISTINCT text) AS n_distinct_texts,
                   round(avg(n_chars), 6) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "topk_per_group": """
            SELECT event_type, event_id, round(value, 6) AS value, rank FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id) AS rank
              FROM events) WHERE rank <= 5
        """,
        "agg_stats_by_class": """
            SELECT event_type, count(*) AS n,
                   round(avg(value), 6) AS mean_value,
                   round(quantile_cont(value, 0.5), 6) AS median_value,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value,
                   round(stddev_samp(value), 6) AS std_value
            FROM events GROUP BY event_type
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "revenue_per_nation": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                            (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                        AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "cluster_size_buckets": """
            WITH per_user AS (SELECT user_id, count(*) AS size FROM events GROUP BY 1)
            SELECT CASE WHEN size = 1 THEN '1' WHEN size = 2 THEN '2'
                        WHEN size <= 5 THEN '3-5' WHEN size <= 10 THEN '6-10'
                        WHEN size <= 20 THEN '11-20' ELSE '21+' END AS size_bucket,
                   count(*) AS num_clusters, CAST(sum(size) AS BIGINT) AS num_entities
            FROM per_user GROUP BY 1
        """,
        "connected_components_chain": """
            WITH multi AS (SELECT lang FROM documents GROUP BY lang HAVING count(*) >= 2)
            SELECT CAST(doc_id AS VARCHAR) AS entity_id,
                   (SELECT min(CAST(d2.doc_id AS VARCHAR)) FROM documents d2
                    WHERE d2.lang = d.lang) AS root
            FROM documents d WHERE lang IN (SELECT lang FROM multi)
        """,
        "harmonic_product_features": """
            SELECT l_orderkey, l_linenumber,
                   round(CASE WHEN l_discount > 0 AND l_tax > 0
                              THEN 2 * l_discount * l_tax / (l_discount + l_tax)
                              ELSE 0.0 END, 6) AS harmonic,
                   round(l_discount * l_tax, 6) AS product,
                   round(CASE WHEN l_tax > 0
                              THEN 2 / (1 + exp(-l_discount / l_tax)) - 1
                              ELSE 0.0 END, 6) AS ratio
            FROM lineitem WHERE l_orderkey % 20 = 0
        """,
        "levenshtein_pairs": """
            SELECT a.p_partkey AS left_key, b.p_partkey AS right_key,
                   round(1.0 - levenshtein(a.p_name, b.p_name)
                         / greatest(length(a.p_name), length(b.p_name)), 6) AS lev_sim
            FROM part a JOIN part b ON a.p_brand = b.p_brand
            WHERE a.p_partkey < 150 AND b.p_partkey < 150
              AND a.p_partkey < b.p_partkey
        """,
        "jaro_winkler_pairs": """
            SELECT a.p_partkey AS left_key, b.p_partkey AS right_key,
                   round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim
            FROM part a JOIN part b ON a.p_brand = b.p_brand
            WHERE a.p_partkey < 150 AND b.p_partkey < 150
              AND a.p_partkey < b.p_partkey
        """,
        "normalize_text": r"""
            SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS text_norm
            FROM documents
        """,
        "session_deltas": """
            SELECT user_id, event_id, gap_micros FROM (
              SELECT user_id, event_id,
                     epoch_us(ts) - epoch_us(lag(ts) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_micros
              FROM events) WHERE gap_micros IS NOT NULL
        """,
        "hourly_rollup": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
                   event_type, count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "revenue_rollup": """
            SELECT n_name, o_year,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                            (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                        AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM (SELECT n_name, year(o_orderdate) AS o_year,
                         l_extendedprice, l_discount
                  FROM lineitem
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey)
            GROUP BY ROLLUP (n_name, o_year)
        """,
        "supplier_rank_in_nation": """
            WITH per_supp AS (
              SELECT n_name, s_suppkey,
                     sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                         (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS rev_d
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              GROUP BY 1, 2)
            SELECT n_name, s_suppkey, CAST(rev_d AS DOUBLE) AS revenue, rnk FROM (
              SELECT n_name, s_suppkey, rev_d,
                     dense_rank() OVER (PARTITION BY n_name
                                        ORDER BY rev_d DESC, s_suppkey) AS rnk
              FROM per_supp) WHERE rnk <= 3
        """,
        "repeat_customer_intersect": """
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
            INTERSECT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        """,
        "order_priority_pivot": """
            SELECT o_orderstatus,
                   sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS p1,
                   sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)::BIGINT AS p2,
                   sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)::BIGINT AS p3,
                   sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)::BIGINT AS p4,
                   sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)::BIGINT AS p5
            FROM orders GROUP BY o_orderstatus
        """,
        "string_hash_counts": """
            SELECT md5(text) AS hash, count(*) AS n FROM documents GROUP BY 1
        """,
        "tfidf_top_terms": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                        x -> x <> '')) AS term
              FROM documents),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
              SELECT doc_id, term, round(tf * ln(n.n / dfreq.df), 6) AS tfidf
              FROM tf JOIN dfreq USING (term) CROSS JOIN n),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY tfidf DESC, term ASC) AS rk
              FROM scored)
            SELECT doc_id, term, tfidf FROM ranked WHERE rk <= 3
        """,
        "doc_length_quantiles": """
            SELECT lang, count(*) AS n_docs,
                   round(quantile_cont(n_chars, 0.5), 6) AS p50,
                   round(quantile_cont(n_chars, 0.9), 6) AS p90,
                   round(quantile_cont(n_chars, 0.99), 6) AS p99
            FROM documents GROUP BY lang
        """,
        "sessionization": """
            WITH flagged AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT user_id, ts,
                     CAST(sum(new_sess) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS session_idx
              FROM flagged)
            SELECT user_id, session_idx,
                   count(*) AS n_events,
                   min(ts) AS session_start,
                   max(ts) AS session_end
            FROM sess GROUP BY 1, 2
        """,
        "top_unshipped_orders": """
            SELECT l.l_orderkey, o.o_orderdate,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1997-06-01'
              AND l.l_shipdate > TIMESTAMP '1997-06-01'
            GROUP BY 1, 2
            ORDER BY revenue DESC, l.l_orderkey ASC
            LIMIT 10
        """,
        "clean_corpus": rf"""
            WITH scored AS (
              SELECT doc_id, {_FINGERPRINT_SQL} AS fp,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
                     round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                           / greatest(length(text), 1), 6) AS alpha_ratio,
                     text, trim(text) AS t
              FROM documents),
            passed AS (
              SELECT doc_id, fp, n_tokens, alpha_ratio,
                     round(len(list_filter(regexp_split_to_array(t, '\s+'),
                                           x -> list_contains({_STOPWORDS_SQL}, lower(x))))
                           / greatest(n_tokens, 1), 6) AS stopword_ratio
              FROM scored
              WHERE n_tokens BETWEEN 10 AND 1000 AND alpha_ratio >= 0.5),
            keep AS (SELECT min(doc_id) AS doc_id FROM passed GROUP BY fp)
            SELECT p.doc_id, p.n_tokens, p.alpha_ratio, p.stopword_ratio
            FROM passed p JOIN keep USING (doc_id)
        """,
        "json_props_stats": """
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE) AS sum_k,
                   round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 6) AS avg_k,
                   min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
                   max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
            FROM events GROUP BY event_type
        """,
        "bigram_counts": """
            WITH toks AS (
              SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                 x -> x <> '') AS t
              FROM documents),
            bg AS (
              SELECT unnest(list_transform(range(1, len(t)),
                                           i -> t[i] || ' ' || t[i + 1])) AS bigram
              FROM toks WHERE len(t) >= 2)
            SELECT bigram, count(*) AS n FROM bg
            GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 100
        """,
    }
