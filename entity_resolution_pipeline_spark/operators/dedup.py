"""Document deduplication suite for training-data pipelines.

Five dedup families, each a first-class operator over a `documents`-shaped
table (id, text) — the corpus-scale generalization of the reference's
string-level dedup (preprocessing.py:279-295) and its designed-but-missing
candidate-pair stage (SURVEY.md §3 EP3):

* exact_duplicates        — hash-groupBy on a normalized fingerprint (A1 at
                            document granularity); one shuffle, map-side
                            combined; fully SQL-oracle-checkable.
* ngram_jaccard_pairs     — exact token-shingle Jaccard via explode +
                            self-join on shared shingles + group-count
                            (set-similarity join without any UDF in the join
                            itself); oracle-checkable at small SF, and the
                            shared-shingle prefilter IS the scale path (only
                            pairs sharing ≥1 shingle are ever materialized).
* minhash_lsh_pairs       — MinHash banding blocks → candidate pairs →
                            exact-Jaccard verify; the sub-quadratic scale
                            path for 10^12 docs.
* simhash_pairs           — 64-bit SimHash, banded into 4×16-bit keys
                            (Manku et al. '07): hamming distance ≤ 3 ⇒ some
                            16-bit band matches exactly; verify by popcount.
* embedding_neardup_pairs — cosine ≥ τ over an embedding column; brute-force
                            within LSH buckets (see ann.py for the top-k
                            variant).

All pair outputs are canonical (left_id < right_id) and deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_analysis import exact_fingerprint_col, make_simhash_udf


# --------------------------------------------------------------- exact dedup

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fingerprint, canonical_id, dup_count) for every duplicate group with
    ≥ 2 members.  canonical_id = min id (the row a pipeline would keep)."""
    fp = docs.select(
        F.col(id_col).alias("id"), exact_fingerprint_col(F.col(text_col)).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("dup_count"))
        .where(F.col("dup_count") >= 2)
    )


def distinct_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep exactly one row (min id) per exact-duplicate group — the
    'deduped corpus' a training pipeline feeds downstream."""
    fp = docs.withColumn("__fp", exact_fingerprint_col(F.col(text_col)))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return docs.join(keep, id_col, "left_semi")


# ------------------------------------------------------- exact n-gram Jaccard

def _token_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle, set_size): distinct word-n-gram shingles per doc.
    Pure JVM: split → sliding window via transform over index range."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    if n == 1:
        shingles = F.array_distinct(toks)
    else:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        shingles = F.array_distinct(
            F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
            )
        )
    out = docs.select(F.col(id_col).alias("id"), shingles.alias("sh"))
    return out.select(
        "id", F.size("sh").alias("set_size"), F.explode("sh").alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact token-n-gram Jaccard ≥ threshold, as a set-similarity join:

    explode shingles → self-equi-join on shingle → count common shingles per
    pair → jaccard = common / (|A| + |B| − common).  Only pairs sharing at
    least one shingle are ever materialized, so cost is Σ_shingle df² — the
    standard inverted-index prefilter; skew from stop-shingles is the hot-key
    problem LSH banding (minhash_lsh_pairs) solves at corpus scale.
    """
    sh = _token_shingles(docs, id_col, text_col, n)
    l = sh.alias("l")
    r = sh.alias("r")
    common = (
        l.join(r, "shingle")
        .where(F.col("l.id") < F.col("r.id"))
        .groupBy(
            F.col("l.id").alias("left_id"),
            F.col("r.id").alias("right_id"),
            F.col("l.set_size").alias("ls"),
            F.col("r.set_size").alias("rs"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common") / (F.col("ls") + F.col("rs") - F.col("common"))
    return (
        common.select("left_id", "right_id", F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- MinHash-LSH

def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Sub-quadratic near-dup pairs: MinHash signatures (char shingles) →
    band keys → block self-join → exact char-shingle Jaccard verify ≥
    threshold.  The verify runs in one Arrow pass over candidate pairs only.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from ..functions.minhash import jaccard, make_band_keys_udf, make_minhash_udf

    mh = make_minhash_udf(num_hashes=num_hashes, k=shingle_k)
    bk = make_band_keys_udf(bands=bands)
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    banded = base.withColumn("key", F.explode(bk(mh("text"))))
    l = banded.alias("l")
    r = banded.alias("r")
    cands = (
        l.join(r, "key")
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("left_id"),
            F.col("l.text").alias("lt"),
            F.col("r.id").alias("right_id"),
            F.col("r.text").alias("rt"),
        )
        .dropDuplicates(["left_id", "right_id"])
    )

    @pandas_udf(DoubleType())
    def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [jaccard(x or "", y or "", k=shingle_k) for x, y in zip(a, b)]
        )

    return (
        cands.withColumn("jaccard", F.round(jaccard_udf("lt", "rt"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )


# -------------------------------------------------------------------- SimHash

def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming (≤ 3 with 4
    bands: pigeonhole ⇒ at least one 16-bit band equal).  Block on each of
    the 4 bands, verify with bit_count(xor) — all JVM exprs after the one
    signature UDF."""
    sim = make_simhash_udf()
    base = docs.select(F.col(id_col).alias("id"), sim(F.col(text_col)).alias("sig"))
    bandcols = [
        F.concat(F.lit(f"{i}:"), F.shiftright("sig", 16 * i).bitwiseAND(F.lit(0xFFFF)).cast("string")).alias("band")
        for i in range(4)
    ]
    banded = base.select("id", "sig", F.explode(F.array(*bandcols)).alias("band"))
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(r, "band")
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("left_id"),
            F.col("r.id").alias("right_id"),
            F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["left_id", "right_id"])
    )


# ------------------------------------------------------- embedding near-dup

def embedding_neardup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine ≥ threshold.  Brute-force all-pairs formulation in
    pure JVM exprs (zip_with dot product over double-cast vectors) — correct
    and oracle-checkable; at corpus scale wrap it behind the LSH bucketing in
    ann.lsh_bucket_topk so the self-join is per-bucket, not global."""
    v = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    l = v.alias("l")
    r = v.alias("r")
    dot = F.aggregate(
        F.zip_with(F.col("l.vec"), F.col("r.vec"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(F.col(f"{side}.vec"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (norm("l") * norm("r"))
    return (
        l.crossJoin(r)
        .where(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("left_id"),
            F.col("r.id").alias("right_id"),
            F.round(cos, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
