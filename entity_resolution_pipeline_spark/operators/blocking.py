"""MinHash-LSH blocking + candidate-pair generation.

The candidate stage the reference designed but never shipped (pipeline.py:
334-388 calls `execute_candidate_queries`, absent from src/ — SURVEY.md §3
EP3).  Blocking keys come from MinHash band hashes over character shingles of
the *year-stripped, lowercased* person name (so records of one person whose
strings differ only in life-date formatting still collide; the classifier
separates true twins downstream), plus an exact normalized-name key.

Scale design (north rule: partitioning/shuffle/skew handled explicitly):
* band keys are computed in one Arrow UDF pass; explode → (block_key, id)
* frequent-bucket pruning: block keys with > max_block_size members are
  non-discriminative "stop keys" (power-law person names, SURVEY.md §7 risk
  3); they are dropped and *counted* — a recall/cost knob reported in stage
  metrics, never silent
* the block self-join shuffles on block_key; AQE skew-join splitting handles
  residual imbalance inside the cap
* pair dedup (same pair from multiple bands) is one exchange on
  (left_id, right_id)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BlockingConfig


def block_membership(
    records: DataFrame,
    cfg: BlockingConfig = BlockingConfig(),
    key_col: str = "person",
    id_col: str = "record_id",
) -> DataFrame:
    """records → (block_key, id).  Records with a missing key get no blocks
    (reference behavior: a record without a person string was never queried
    against Weaviate)."""
    from ..functions.birth_death import normalize_name_udf
    from ..functions.minhash import make_band_keys_udf, make_minhash_udf

    minhash_udf = make_minhash_udf(num_hashes=cfg.num_hashes, k=cfg.shingle_size)
    band_udf = make_band_keys_udf(bands=cfg.bands)

    from ..config import python_stage_width

    keyed = (
        records.where(F.col(key_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(key_col))
        # coalesce (no shuffle) to half-width before the Arrow UDF pass —
        # see config.python_stage_width
        .coalesce(python_stage_width(records.sparkSession))
        .withColumn("block_base", F.lower(normalize_name_udf(key_col)))
    )
    # Signatures are computed directly per record in ONE shuffle-free pass.
    # A dedup-before-compute variant (distinct names → signatures → join
    # membership back, the reference's unique-strings pattern,
    # embedding.py:106-119) was measured 3-15× SLOWER here: person names are
    # short, so the vectorized MinHash UDF costs less per record than the
    # two exchanges (distinct + join-back) the dedup needs — recompute beats
    # shuffle for cheap-per-row pure functions at any scale, since this
    # formulation ships zero bytes before the block-key exchange.
    keys = band_udf(minhash_udf("block_base"))
    if cfg.also_exact_name_key:
        keys = F.concat(
            keys,
            F.array(F.concat(F.lit("x:"), F.xxhash64("block_base").cast("string"))),
        )
    return keyed.select("id", F.explode(keys).alias("block_key"))


def prune_hot_blocks(
    membership: DataFrame, cfg: BlockingConfig = BlockingConfig()
) -> tuple[DataFrame, DataFrame]:
    """Split membership into (kept, dropped_block_stats).  dropped stats =
    (block_key, size) for keys over the cap — surfaced as stage metrics."""
    sizes = membership.groupBy("block_key").agg(F.count("*").alias("size"))
    hot = sizes.where(F.col("size") > cfg.max_block_size)
    kept = membership.join(F.broadcast(hot.select("block_key")), "block_key", "left_anti")
    return kept, hot


def salt_hot_blocks(
    membership: DataFrame, cfg: BlockingConfig = BlockingConfig()
) -> DataFrame:
    """Triangle-decomposition salting: rewrite each over-cap block into
    bounded join buckets WITHOUT losing any pair.

    A hot block of size s gets G = ceil(s / cap) salt groups; a member in
    group g is exploded into one bucket key per unordered group pair
    involving g — (i, g) for i ≤ g and (g, j) for j > g.  A pair whose
    members fall in groups (ga, gb) then meets in exactly ONE bucket,
    (min, max), so the downstream self-join enumerates every pair exactly
    once while no bucket holds more than ~2·cap members.  Salt assignment
    is deterministic (xxhash64 of the id) — stable across runs and
    parallelism levels.

    Returns membership with block_key rewritten to the salted bucket key.
    """
    sizes = membership.groupBy("block_key").agg(F.count("*").alias("size"))
    groups = F.ceil(F.col("size") / F.lit(cfg.max_block_size)).cast("int").alias("G")
    # no broadcast hint: the sizes side is one row per distinct block key —
    # small here, but unbounded at corpus scale; AQE picks the strategy
    sized = membership.join(sizes.select("block_key", groups), "block_key")
    g = F.pmod(F.xxhash64("id"), F.col("G")).cast("int")
    # bucket keys for member in group g: (i, g) for i in [0, g] and (g, j)
    # for j in (g, G)
    buckets = F.concat(
        F.transform(F.sequence(F.lit(0), g), lambda i: F.struct(i.alias("a"), g.alias("b"))),
        F.when(
            g + 1 < F.col("G"),
            F.transform(
                F.sequence(g + 1, F.col("G") - 1),
                lambda j: F.struct(g.alias("a"), j.alias("b")),
            ),
        ).otherwise(F.array()),
    )
    return sized.select(
        "id",
        F.explode(buckets).alias("bk"),
        "block_key",
    ).select(
        "id",
        F.concat_ws("#", "block_key", F.col("bk.a"), F.col("bk.b")).alias("block_key"),
    )


def candidate_pairs(
    membership: DataFrame, cfg: BlockingConfig = BlockingConfig()
) -> DataFrame:
    """Block self-join → distinct (left_id, right_id), left < right.

    The l.id < r.id predicate halves the join output before the exchange;
    dropDuplicates collapses multi-band duplicates.  Hot keys are handled
    per cfg.hot_block_strategy (dropped-and-counted, or salted into
    complete-enumeration triangle buckets) so no single block key dominates
    a shuffle partition; AQE skew-join handles the rest.
    """
    from pyspark import StorageLevel

    # membership is consumed four times (size agg, anti-join, both join
    # sides); materialize once so the signature UDFs run once per record
    membership = membership.persist(StorageLevel.MEMORY_AND_DISK)
    if cfg.hot_block_strategy == "salt":
        kept = salt_hot_blocks(membership, cfg)
    else:
        kept, _ = prune_hot_blocks(membership, cfg)
    l = kept.alias("l")
    r = kept.alias("r")
    pairs = (
        l.join(r, "block_key")
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("left_id"), F.col("r.id").alias("right_id"))
    )
    return pairs.dropDuplicates(["left_id", "right_id"])
