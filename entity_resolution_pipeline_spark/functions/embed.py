"""Deterministic local embeddings: hashed character-n-gram projection.

Replaces the reference's OpenAI `text-embedding-3-small` client (rate-limited
batch API, src/batch_parallel_embedding.py:300-386) with a local,
deterministic, seed-free feature-hashing embedding, per the north rule
("locally-computed embedding cosine similarity").

Construction: character n-grams of the lowercased ' '-padded string are
hashed with crc32; each n-gram adds ±1 (sign bit from the hash) into
`hash % dim` of a float accumulator; the vector is L2-normalized.  This is
the classic feature-hashing / SimHash-style projection (Weinberger et al.,
"Feature Hashing for Large Scale Multitask Learning") — same inner-product
geometry contract the pipeline needs: near-identical strings ⇒ cosine ≈ 1.

Runs as ONE numpy pass per Arrow batch inside a pandas UDF, over *distinct*
strings only (dedup-before-embed, the reference's own key optimization at
embedding.py:106-119).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType


def char_ngrams(text: str, n: int) -> list[str]:
    """Lowercased, single-space-padded character n-grams; shorter-than-n
    strings yield the padded string itself."""
    padded = f" {text.lower()} "
    if len(padded) <= n:
        return [padded]
    return [padded[i : i + n] for i in range(len(padded) - n + 1)]


def embed_string(text: str | None, dim: int = 256, n: int = 3) -> np.ndarray:
    """Deterministic hashed-n-gram embedding, L2-normalized float32[dim].
    Empty/None → zero vector (cosine treats it as 0-similarity, matching the
    reference's empty-vector guard, feature_engineering.py:694-700)."""
    vec = np.zeros(dim, dtype=np.float64)
    if not text:
        return vec.astype(np.float32)
    for gram in char_ngrams(text, n):
        h = zlib.crc32(gram.encode("utf-8"))
        sign = 1.0 if (h >> 31) & 1 else -1.0
        vec[h % dim] += sign
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec /= norm
    return vec.astype(np.float32)


def make_embed_udf(dim: int = 256, n: int = 3):
    """Factory for an Arrow pandas UDF: string column → array<float> column."""

    @pandas_udf(ArrayType(FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_string(t, dim=dim, n=n).tolist())

    return embed_udf
