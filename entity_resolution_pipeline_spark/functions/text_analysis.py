"""Text-analysis primitives for large-scale training-data pipelines.

Beyond the reference's record-linkage battery, a 100 TB corpus pipeline needs
per-document text metrics: token counts, quality scores, language ID, and
content fingerprints.  Everything here is either pure JVM column expressions
(whole-stage codegen; SQL-oracle-checkable) or one Arrow pandas UDF pass.

Column-expression ops (oracle-checkable against DuckDB):
* token_count_col       — whitespace tokenization
* char_count_col        — raw length
* quality metrics       — alpha ratio, stopword ratio, mean word length
* exact_fingerprint_col — md5 of the whitespace-normalized lowercased text

UDF ops (deterministic, rows-only checks):
* langid_udf            — character-trigram profile scoring
* winnow_fingerprint    — rolling-hash winnowing (Schleimer et al., MOSS)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StringType

# ---------------------------------------------------------------- column ops

def token_count_col(c: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def exact_fingerprint_col(c: Column) -> Column:
    """md5 hex of lower(whitespace-collapsed trimmed text) — the exact-dedup
    key.  (The reference's decimal-MD5 parity hash lives in hashing.py; hex
    is used here because both Spark and DuckDB expose it natively.)"""
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


# Small function-word list: language-agnostic "quality" signal (a real corpus
# pipeline ships per-language lists; the mechanism is what matters here).
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
)


def quality_metrics_cols(c: Column) -> list[Column]:
    """Quality-scoring battery as pure column expressions:
    n_chars, n_tokens, alpha_ratio, stopword_ratio, mean_token_len.
    Mirrors the common Gopher/C4-style heuristics (length bounds, symbol
    ratios, stopword presence) in codegen-friendly form."""
    trimmed = F.trim(c)
    tokens = F.split(trimmed, r"\s+")
    n_tokens = token_count_col(c)
    n_chars = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    stop_arr = F.array([F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            (F.length(trimmed) - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)), 6
        ).alias("mean_token_len"),
    ]


# ------------------------------------------------------------------- lang-ID

# Tiny deterministic trigram profiles (top function-word trigrams per
# language).  A production pipeline would train profiles over a labeled
# corpus; the *operator* (profile scoring in one Arrow pass) is identical.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", " to"),
    "de": ("der", "ie ", " de", "die", "und", " un", "nd ", "sch", "ein", "ich"),
    "fr": (" de", "es ", "de ", " le", "le ", "ent", " la", "la ", "ion", "que"),
    "es": (" de", "de ", "os ", " la", "la ", "as ", "el ", " el", "que", " qu"),
    "it": (" di", "di ", " de", "to ", "la ", " la", "re ", "one", "che", " ch"),
    "pl": ("ie ", "nie", " ni", "em ", " po", "ch ", "ych", "prz", "rze", "ego"),
}


def make_langid_udf(profiles: dict[str, tuple[str, ...]] | None = None):
    """Arrow pandas UDF: text → best-scoring language code ('und' if no
    trigram hits).  Deterministic; ties broken by language-code sort order."""
    profs = profiles or _LANG_PROFILES
    langs = sorted(profs)
    # one combined trigram → weight-vector map: a single text pass scores all
    # languages at once.  INTEGER rank weights (len .. 1) — same monotone
    # ranking signal as 1/(i+1), but integer sums are order-independent and
    # therefore bit-identical between engines, which makes the scoring
    # SQL-oracle-checkable (float accumulation order would risk argmax flips
    # on near-ties).
    tri_weights: dict[str, np.ndarray] = {}
    for li, lang in enumerate(langs):
        for i, t in enumerate(profs[lang]):
            vec = tri_weights.setdefault(t, np.zeros(len(langs)))
            vec[li] += float(len(profs[lang]) - i)

    @pandas_udf(StringType())
    def langid_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if not t:
                out.append("und")
                continue
            s = f" {t.lower()} "
            scores = np.zeros(len(langs))
            for i in range(len(s) - 2):
                w = tri_weights.get(s[i : i + 3])
                if w is not None:
                    scores += w
            best = int(scores.argmax())  # argmax takes first max → sorted-code tie-break
            out.append(langs[best] if scores[best] > 0 else "und")
        return pd.Series(out)

    return langid_udf


# ------------------------------------------------------ winnowing fingerprint

def _poly_hashes(s: str, k: int) -> np.ndarray:
    """Rolling polynomial hash over the k-BYTE windows of the UTF-8 text, in
    position order WITH duplicates (minhash.shingle_set's hash, minus the
    space padding and the distinct step) — one sliding_window_view + one
    uint64 matvec.  The polynomial form (vs crc32) is reproducible as plain
    integer arithmetic in ANY engine, which makes winnowing oracle-checkable
    in DuckDB SQL."""
    from .minhash import _MERSENNE_P, _POW_CACHE, _pows

    data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    pw = _POW_CACHE.get(k)
    if pw is None:
        pw = _pows(k)
        _POW_CACHE[k] = pw
    if len(data) < k:
        padded = np.zeros(k, dtype=np.uint8)
        padded[: len(data)] = data
        w = padded[None, :]
    else:
        w = np.lib.stride_tricks.sliding_window_view(data, k)
    return ((w.astype(np.uint64) * pw[None, :]).sum(axis=1) % np.uint64(_MERSENNE_P)).astype(np.int64)


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing (Schleimer/Wilkerson/Aiken '03): rolling polynomial hash
    over k-grams, keep the min hash of each sliding window (rightmost min),
    dedup while preserving order.  Output = the document's robust
    fingerprint set; two documents sharing any fingerprint are near-dup
    candidates."""
    s = re.sub(r"\s+", " ", text.lower()).strip()
    if not s or len(s) < k:
        # no full k-gram window → no fingerprints (matches the SQL oracle's
        # windowing; micro-docs are excluded from candidacy, and could never
        # reach the shared-fingerprint floor anyway)
        return []
    hashes = _poly_hashes(s, k)
    if len(hashes) < window:
        # fewer k-grams than the winnow window: same oracle semantics
        # (`i <= nh - (window-1)` selects nothing) — no fingerprints
        return []
    picks = []
    for i in range(len(hashes) - window + 1):
        w = hashes[i : i + window]
        # rightmost minimum (standard winnowing tie-break)
        j = int(len(w) - 1 - w[::-1].argmin())
        picks.append(int(w[j]))
    seen: set[int] = set()
    out = []
    for p in picks:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def make_winnow_udf(k: int = 8, window: int = 4):
    @pandas_udf(ArrayType(LongType()))
    def winnow_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: winnow_fingerprints(t, k, window) if t else [])

    return winnow_udf


# ---------------------------------------------------------------- simhash

def simhash64(text: str, n: int = 3) -> int:
    """64-bit SimHash (Charikar '02 / Manku et al. '07) over character
    n-grams: each gram votes ±1 per bit of its 64-bit hash; sign of the vote
    sum gives the fingerprint bit.  Near-dups differ in few bits.  The gram
    hash is the first 8 md5 bytes (big-endian) — md5 is available verbatim
    in DuckDB, so the whole signature (and therefore simhash_pairs, whose
    4×16 banding is COMPLETE for hamming ≤ 3 by pigeonhole) is
    value-checkable against an independent SQL engine."""
    import hashlib

    # blank text hashes the single EMPTY gram (md5('')) — exactly what the
    # SQL oracle's substr('',1,3)='' computes, so blank docs pair with each
    # other (they are exact dups) and never drift between engines
    s = re.sub(r"\s+", " ", text.lower()).strip()
    grams = [s[i : i + n] for i in range(max(len(s) - n + 1, 1))]
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big")
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )
    # (n_grams, 64) bit matrix → per-bit vote sums, one numpy pass
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(grams)
    fp = int(np.bitwise_or.reduce((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)))
    # keep within signed int64 for Spark LongType
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def make_simhash_udf(n: int = 3):
    @pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        # NULL text → NULL signature (the oracle's md5(NULL) chain yields
        # NULL, excluding the doc from pairing); blank text is a real value
        return texts.map(lambda t: simhash64(t, n) if t is not None else None)

    return simhash_udf
