"""Round-6 optimization internals: the width guard and the shared LSH
pairability rule (the two new cross-operator contracts this round)."""

import numpy as np
import pytest

from entity_resolution_pipeline_spark.config import (
    ensure_min_width,
    python_stage_width,
)
from entity_resolution_pipeline_spark.functions.minhash import shingle_set
from entity_resolution_pipeline_spark.operators.dedup import (
    MINHASH_SHINGLE_K,
    pairable_text_predicate,
)


def test_ensure_min_width_repartitions_only_narrow_inputs(spark):
    w = python_stage_width(spark)
    narrow = spark.range(0, 1000, numPartitions=1)
    assert ensure_min_width(narrow).rdd.getNumPartitions() == w
    wide = spark.range(0, 1000, numPartitions=w + 4)
    # already at/above width: the SAME plan comes back, no repartition
    assert ensure_min_width(wide) is wide


def test_ensure_min_width_preserves_rows(spark):
    df = spark.range(0, 257, numPartitions=1)
    out = ensure_min_width(df)
    assert sorted(r["id"] for r in out.collect()) == list(range(257))


@pytest.mark.parametrize(
    "text",
    ["", " ", "a", "ab", "abc", "İ", "İİ", "é", "éé", "hello world"],
)
def test_pairable_predicate_matches_shingle_kernel(spark, text):
    """The SQL pairability rule must agree with the Python shingle kernel's
    emptiness on every edge string (the pre-collapse correctness
    contract): pairable ⟺ shingle_set yields ≥ 1 window."""
    df = spark.createDataFrame([(text,)], "text string")
    sql_pairable = df.where(pairable_text_predicate("text")).count() == 1
    kernel_pairable = len(shingle_set(text, MINHASH_SHINGLE_K)) > 0
    assert sql_pairable == kernel_pairable, text


def test_minhash_default_shingle_k_is_shared():
    import inspect

    from entity_resolution_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    sig = inspect.signature(minhash_lsh_pairs)
    assert sig.parameters["shingle_k"].default == MINHASH_SHINGLE_K


def test_int32_sig_shingle_columns_exact(spark):
    """The int32 narrowing contract (round-6 late change): the sig/sh
    columns are array<int> — every value is a hash mod p = 2³¹−1 (or the
    −1 sentinel), so the narrowing is EXACT — and the column values,
    band keys, and pairable-set Jaccards are identical to the pure-Python
    int64 kernels they mirror."""
    from pyspark.sql import functions as F

    from entity_resolution_pipeline_spark.functions.minhash import (
        band_keys,
        jaccard,
        make_sig_shingle_band_udf,
        minhash_signature,
    )

    texts = ["the quick brown fox", "the quick brown fax", "", "ab",
             "the quick brown fox"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    ssu = make_sig_shingle_band_udf(num_hashes=64, k=MINHASH_SHINGLE_K)
    out = df.select("id", ssu("text").alias("f")).select(
        "id", F.col("f.sig").alias("sig"), F.col("f.sh").alias("sh"),
        F.col("f.keys").alias("keys"),
    )
    # declared column types are int32 arrays
    dt = dict(out.dtypes)
    assert dt["sig"] == "array<int>" and dt["sh"] == "array<int>"
    rows = {r["id"]: r for r in out.collect()}
    for i, t in enumerate(texts):
        ref_sig = minhash_signature(t, num_hashes=64, k=MINHASH_SHINGLE_K)
        assert list(rows[i]["sig"]) == ref_sig.tolist(), t
        ref_sh = shingle_set(t, MINHASH_SHINGLE_K)
        assert list(rows[i]["sh"]) == ref_sh.astype(np.int64).tolist(), t
        # band keys byte-identical to the int64-era computation
        assert list(rows[i]["keys"]) == band_keys(ref_sig, bands=16), t
    # exact Jaccard through the int32 columns matches the Python kernel
    from entity_resolution_pipeline_spark.functions.minhash import (
        make_intersect_size_udf,
        sorted_intersect_size,
    )

    isz = make_intersect_size_udf()
    pair = (
        out.where(F.col("id") == 0).select(F.col("sh").alias("lsh"))
        .crossJoin(out.where(F.col("id") == 1).select(F.col("sh").alias("rsh")))
        .select(isz("lsh", "rsh").alias("c")).collect()[0]
    )
    a = shingle_set(texts[0], MINHASH_SHINGLE_K)
    b = shingle_set(texts[1], MINHASH_SHINGLE_K)
    assert pair["c"] == sorted_intersect_size(a, b)
    want_j = jaccard(texts[0], texts[1], MINHASH_SHINGLE_K)
    got_j = pair["c"] / (len(a) + len(b) - pair["c"])
    assert abs(got_j - want_j) < 1e-12
