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
