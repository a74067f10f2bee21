"""Vectorized Bloom filter over md5-hex fingerprints.

Built for `dedup.incremental_dedup`: a new crawl snapshot is deduped
against a 10^12-document corpus WITHOUT joining new x corpus — the corpus
side is compressed into an m-bit Bloom filter (built distributively, one
pass), broadcast to every executor, and only the bloom-POSITIVE sliver of
the new snapshot (true duplicates + the ~FPR false-positive tail) ever
reaches the exact verify join.  The final output is exact; the bloom only
prunes the join input.

k is fixed at 4: an md5 digest is 16 bytes = four independent big-endian
uint32 words, so the four bit indices come straight out of the fingerprint
with zero extra hashing (`np.frombuffer` view, no per-row Python).  FPR at
load n into m bits is (1 - e^(-4n/m))^4 — size m at ~16 bits/key for
FPR ~= 2.4e-3, ~32 bits/key for ~1e-5.  At 10^12 keys that is a 2-4 TB
filter: shard it by `crc32(fingerprint) % n_shards` into
executor-memory-sized pieces and run one probe pass per shard (the
operator's `m_bits`/`fanout` knobs express the same construction at any
scale); at the sandbox's synthetic sizes one broadcast shard suffices.

No reference counterpart (the reference dedups in-memory per batch,
preprocessing.py:279-295); this is the standard scale construction
(e.g. Spark's own runtime-filter bloom joins use the identical shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["bloom_index_matrix", "build_bloom", "merge_blooms", "probe_bloom"]


def bloom_index_matrix(fps: pd.Series | list, m_bits: int) -> np.ndarray:
    """(n, 4) int64 bit indices from 32-hex-char md5 fingerprints: the four
    big-endian uint32 words of the digest, each reduced mod m_bits.  One
    `bytes.fromhex` + one `frombuffer` for the whole batch — no per-row
    loop."""
    joined = "".join(fps)
    if len(joined) != 32 * len(fps):
        raise ValueError("every fingerprint must be a 32-hex-char md5 digest")
    words = np.frombuffer(bytes.fromhex(joined), dtype=">u4").reshape(-1, 4)
    return (words % np.uint32(m_bits)).astype(np.int64)


def build_bloom(fps: pd.Series | list, m_bits: int, into: np.ndarray | None = None) -> np.ndarray:
    """Set the 4 bits of every fingerprint in an m_bits-bit filter
    (uint8[ceil(m_bits/8)]).  Pass `into` to accumulate across Arrow batches
    without reallocating (the per-partition builder does).

    m_bits should be a power of two: the four digest words are reduced
    `mod m_bits`, so a non-power-of-two m adds modulo bias across them
    (harmless to exactness — the filter only prunes — but it skews the FPR
    math in the module docstring).  Any m_bits >= 8 is accepted; the byte
    allocation rounds up so no bit index can fall outside the array."""
    if m_bits < 8:
        raise ValueError(f"m_bits must be >= 8, got {m_bits}")
    arr = into if into is not None else np.zeros((m_bits + 7) >> 3, dtype=np.uint8)
    if len(fps):
        idx = bloom_index_matrix(fps, m_bits).ravel()
        np.bitwise_or.at(arr, idx >> 3, (np.uint8(1) << (idx & 7).astype(np.uint8)))
    return arr


def merge_blooms(blooms: list[bytes | np.ndarray]) -> np.ndarray:
    """OR a list of equal-size filters (bytes or uint8 arrays) into one."""
    arrs = [np.frombuffer(b, dtype=np.uint8) if isinstance(b, (bytes, bytearray)) else b for b in blooms]
    return np.bitwise_or.reduce(arrs)


def probe_bloom(fps: pd.Series | list, bloom: np.ndarray, m_bits: int) -> np.ndarray:
    """bool[n]: True where ALL 4 bits are set (possible member).  False is
    definite non-membership — those rows skip the verify join entirely."""
    if not len(fps):
        return np.zeros(0, dtype=bool)
    idx = bloom_index_matrix(fps, m_bits)
    bits = (bloom[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)
