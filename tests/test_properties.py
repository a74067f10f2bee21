"""Property-based tests (hypothesis) over the deterministic pure-function
core — the invariants every distributed stage silently relies on.  No Spark
session needed; these run in milliseconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_pipeline_spark.functions.birth_death import (
    extract_birth_death_years,
    normalize_name,
)
from entity_resolution_pipeline_spark.functions.hashing import (
    compute_string_hash,
    normalize_string,
)
from entity_resolution_pipeline_spark.functions.minhash import (
    minhash_signature,
    shingle_set,
)
from entity_resolution_pipeline_spark.functions.similarity import (
    jaro_winkler_similarity,
    levenshtein_similarity,
)

text = st.text(max_size=200)
name = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=80
)


@given(text)
@settings(max_examples=200)
def test_normalize_idempotent(s):
    once = normalize_string(s)
    assert normalize_string(once) == once


@given(text)
@settings(max_examples=200)
def test_normalized_hash_is_whitespace_invariant(s):
    """hash∘normalize keys the dedup dictionary: any whitespace variant of
    a string must map to the same entry.  (The raw hash itself is
    reference-parity raw-md5 — normalization happens upstream.)"""
    variant = " " + s.replace(" ", "  ").replace("\t", " \n ") + " "
    assert compute_string_hash(normalize_string(variant)) == compute_string_hash(
        normalize_string(s)
    )


@given(st.one_of(st.none(), st.just(""), st.sampled_from([" ", "\t\n", "  "])))
def test_hash_empty_sentinel(s):
    from entity_resolution_pipeline_spark.config import EMPTY_STRING_HASH

    assert compute_string_hash(s) == EMPTY_STRING_HASH


@given(name, name)
@settings(max_examples=300)
def test_similarity_bounds_and_symmetry(a, b):
    for fn in (levenshtein_similarity, jaro_winkler_similarity):
        v = fn(a, b)
        assert 0.0 <= v <= 1.0
        assert fn(b, a) == v
    if a:
        assert levenshtein_similarity(a, a) == 1.0
        assert jaro_winkler_similarity(a, a) == 1.0


@given(name)
@settings(max_examples=300)
def test_normalize_name_idempotent_and_year_free(s):
    n1 = normalize_name(s)
    assert normalize_name(n1) == n1  # idempotent
    # a name with planted life dates normalizes identically to the bare name
    bare = normalize_name(s)
    with_years = normalize_name(f"{s}, 1797-1858") if s.strip() else bare
    if s.strip() and not s.strip().endswith(","):
        assert with_years == bare


@given(name)
@settings(max_examples=200)
def test_birth_death_never_crashes_and_types(s):
    b, d = extract_birth_death_years(s)
    for y in (b, d):
        assert y is None or (isinstance(y, int) and 0 <= y <= 9999)


@given(st.text(max_size=100), st.integers(min_value=2, max_value=8))
@settings(max_examples=200)
def test_shingles_deterministic_sorted_distinct(s, k):
    a = shingle_set(s, k)
    b = shingle_set(s, k)
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == len(a)
    assert np.all(np.diff(a.astype(np.int64)) > 0)  # sorted distinct


@given(st.text(min_size=1, max_size=100))
@settings(max_examples=100)
def test_minhash_signature_shape_and_determinism(s):
    sig1 = minhash_signature(s, num_hashes=32, k=3)
    sig2 = minhash_signature(s, num_hashes=32, k=3)
    assert sig1.shape == (32,)
    assert np.array_equal(sig1, sig2)
    # a permuted min can never exceed the modulus
    assert sig1.max() < (1 << 31) - 1


@given(st.text(min_size=5, max_size=60))
@settings(max_examples=100)
def test_minhash_identical_strings_estimate_one(s):
    """J(s, s) = 1 ⇒ signatures must agree in every position."""
    assert np.array_equal(
        minhash_signature(s, num_hashes=32, k=3), minhash_signature(s, num_hashes=32, k=3)
    )


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=1, max_size=200))
@settings(max_examples=200)
def test_mod_mersenne_matches_hardware_mod(vals):
    """The shift-add Mersenne reduction must be bit-identical to % over the
    FULL uint64 range (the fold identity 2³¹ ≡ 1 (mod p) holds for any v)."""
    from entity_resolution_pipeline_spark.functions.minhash import (
        _MERSENNE_P,
        _mod_mersenne,
    )

    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(_mod_mersenne(v), v % np.uint64(_MERSENNE_P))


@given(
    st.lists(st.text(max_size=120), min_size=1, max_size=40),
    st.integers(min_value=2, max_value=6),
)
@settings(max_examples=50, deadline=None)
def test_batched_signature_kernel_matches_per_doc(texts, k):
    """The blocked minimum.reduceat signature kernel (what the UDF runs)
    must equal the per-doc formulation for every doc, including empty /
    too-short texts (sentinel rows) interleaved with real ones."""
    from entity_resolution_pipeline_spark.functions.minhash import (
        _coeffs,
        _sig_from_shingles,
        _sigs_batched,
    )

    a, b = _coeffs(16)
    sets = [shingle_set(t, k) for t in texts]
    got = _sigs_batched(sets, a, b, 16)
    for g, sh in zip(got, sets):
        if len(sh):
            assert g == _sig_from_shingles(sh, a, b).tolist()
        else:
            assert g == [-1] * 16


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=80),
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=80),
)
@settings(max_examples=200, deadline=None)
def test_sorted_intersect_size_matches_set_semantics(xs, ys):
    """The Arrow verify kernel's searchsorted merge must equal
    |set(A) ∩ set(B)| for any sorted-distinct inputs — including empty
    sides, disjoint sets, full overlap, and length-swapped pairs (the
    kernel probes the shorter into the longer)."""
    import numpy as np

    from entity_resolution_pipeline_spark.functions.minhash import (
        sorted_intersect_size,
    )

    a = np.array(sorted(set(xs)), dtype=np.int64)
    b = np.array(sorted(set(ys)), dtype=np.int64)
    want = len(set(xs) & set(ys))
    assert sorted_intersect_size(a, b) == want
    assert sorted_intersect_size(b, a) == want
