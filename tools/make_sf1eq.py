#!/usr/bin/env python
"""Generate an sf1-equivalent fixture: every sf0.1 table replicated
REPLICAS× (default 10) with structure-preserving transforms, so the
28-query headline bench can run at 10× the data without changing its
workload shape (r4 verdict ask #7 — make the steady-state capacity
extrapolation load-bearing at a corpus where janino compile no longer
dominates).

Per-replica transforms (replica 0 is verbatim; i > 0):
- every join-key column gets + i·10^7, so the star-schema join structure
  (orders↔lineitem↔part/supplier, customer↔nation↔region) replicates
  exactly — same selectivities, same fan-outs, 10× the rows;
- documents: every whitespace token prefixed with a 7-char replica tag
  ``md5(f"sf1eq-tag:{i}")[:6] + "~"`` — the tag characters share no
  common substring between replicas, so at k=5 char-shingles only the
  windows fully inside a word survive across replicas and cross-replica
  Jaccard measures ≈0.15: below the LSH estimate-gate floor (0.31 at
  threshold 0.5), so replicas behave like NEW documents.  Two earlier
  cuts taught the design rule the hard way: the webtext benches' 3-char
  ``r{i}~`` tag leaves J≈0.25 (every doc gets 9 near-miss twins above
  the band-collision floor → pair volume grows with replicas²; measured
  minhash_lsh_pairs 280 s), and a 6-char ``r{i:02d}xq~`` tag — differing
  from its siblings in ONE character — SHARES most tag windows and
  pushes J to 0.607, ABOVE the dedup threshold (every doc gains 9 true
  duplicate twins).  A real 10× crawl adds mostly unrelated content;
  intra-replica dup structure still replicates linearly, which is the
  honest scaling shape.  n_chars recomputed;
- embeddings: multiplied elementwise by a replica-specific deterministic
  ±1 (Rademacher) diagonal — pairwise cosines WITHIN a replica are exactly
  preserved (so ANN/SemDeDup group structure replicates) while
  cross-replica cosines collapse to near-orthogonal noise instead of
  10-way exact duplicates;
- events: ids offset, timestamps kept (10× concurrent users, same
  session shapes).

Usage: python tools/make_sf1eq.py [target_dir] [replicas]
Default target /dev/shm/erx-sf1eq.  Deterministic byte-for-byte.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFF = 10_000_000

KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def _keyed_table(name: str, out_dir: str, replicas: int) -> None:
    cols = [
        r[0]
        for r in duckdb.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{name}.parquet')"
        ).fetchall()
    ]
    parts = []
    for i in range(replicas):
        sel = ", ".join(
            f"CAST({c} + {i * OFF} AS {'BIGINT' if c not in ('n_nationkey', 'n_regionkey', 'c_nationkey', 's_nationkey') else 'INTEGER'}) AS {c}"
            if c in KEYS[name]
            else c
            for c in cols
        )
        parts.append(f"SELECT {sel} FROM read_parquet('{SRC}/{name}.parquet')")
    q = " UNION ALL ".join(parts)
    duckdb.sql(
        f"COPY ({q}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)"
    )


def _documents(out_dir: str, replicas: int) -> None:
    parts = []
    for i in range(replicas):
        if i == 0:
            parts.append(
                f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"
            )
        else:
            tag = hashlib.md5(f"sf1eq-tag:{i}".encode()).hexdigest()[:6] + "~"
            # prefix every token; preserve leading/trailing whitespace
            # semantics well enough for the tokenizers (split on \s+)
            parts.append(f"""
                SELECT doc_id + {i * OFF} AS doc_id,
                       list_aggregate(
                         list_transform(regexp_split_to_array(text, '\\s+'),
                                        w -> '{tag}' || w),
                         'string_agg', ' ') AS text,
                       lang, source,
                       CAST(length(list_aggregate(
                         list_transform(regexp_split_to_array(text, '\\s+'),
                                        w -> '{tag}' || w),
                         'string_agg', ' ')) AS BIGINT) AS n_chars
                FROM read_parquet('{SRC}/documents.parquet')
            """)
    q = " UNION ALL ".join(parts)
    duckdb.sql(f"COPY ({q}) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)")


def _embeddings(out_dir: str, replicas: int) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    V = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
    dim = V.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for i in range(replicas):
        if i == 0:
            signs = np.ones(dim, dtype=np.float32)
        else:
            signs = np.array(
                [
                    1.0
                    if int(
                        hashlib.md5(f"sf1eq:{i}:{j}".encode()).hexdigest()[:8],
                        16,
                    )
                    % 2
                    == 0
                    else -1.0
                    for j in range(dim)
                ],
                dtype=np.float32,
            )
        out_ids.append(ids + i * OFF)
        out_vecs.append(V * signs[None, :])
        out_labels.append(labels)
    allv = np.concatenate(out_vecs)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(allv.reshape(-1), pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
            "embedding": arr,
            "label": pa.array(np.concatenate(out_labels), pa.int32()),
        }
    )
    pq.write_table(out, f"{out_dir}/embeddings.parquet")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/erx-sf1eq"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    for name in KEYS:
        _keyed_table(name, out_dir, replicas)
        print(f"{name}: done", flush=True)
    _documents(out_dir, replicas)
    print("documents: done", flush=True)
    _embeddings(out_dir, replicas)
    print("embeddings: done", flush=True)
    for f in sorted(os.listdir(out_dir)):
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{f}')"
        ).fetchone()[0]
        print(f"{f}: {n} rows")


if __name__ == "__main__":
    main()
