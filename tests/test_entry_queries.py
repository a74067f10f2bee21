"""Driver-contract queries: every oracle-checkable entry is diffed against
DuckDB on the sf0.001 tables (the same comparison the driver runs at
sf0.01), and rows-only entries are executed for shape/determinism.

This keeps the `__spark_entry__.queries()` ⇄ `oracle_sql()` contract
self-testing: a column rename or rounding drift fails HERE, not in the
driver's CORRECTNESS gate.
"""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as e

    return e


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _diff(sdf, odf) -> None:
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), (cols, sorted(odf.columns))
    assert len(sdf) == len(odf), (len(sdf), len(odf))
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        # normalize datetime unit (Spark→pandas = ns, DuckDB→pandas = us)
        for df in (s, o):
            if np.issubdtype(df[c].dtype, np.datetime64):
                df[c] = df[c].astype("datetime64[ns]")
        a, b = s[c].to_numpy(), o[c].to_numpy()
        try:
            af, bf = a.astype(float), b.astype(float)
            assert np.allclose(af, bf, atol=1e-9, equal_nan=True), c
        except (TypeError, ValueError):
            mism = ~((a == b) | ((a != a) & (b != b)))
            assert not mism.any(), (c, a[mism][:3], b[mism][:3])


def test_oracle_queries_match_duckdb(spark, entry_mod, duck):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    for name, sql in oracles.items():
        sdf = qs[name](spark, SF_DIR).toPandas()
        odf = duck.execute(sql).fetchdf()
        try:
            _diff(sdf, odf)
        except AssertionError as exc:  # attach the query name
            raise AssertionError(f"{name}: {exc}") from exc


def test_rows_only_queries_execute(spark, entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    rows_only = sorted(set(qs) - set(oracles))
    # these are covered by op-level tests; here: they run and are non-trivial
    for name in rows_only:
        df = qs[name](spark, SF_DIR)
        assert len(df.columns) > 0, name
        df.limit(5).collect()


def test_entry_runs_and_is_deterministic(spark, entry_mod):
    a = sorted(map(tuple, entry_mod.entry(spark).collect()))
    b = sorted(map(tuple, entry_mod.entry(spark).collect()))
    assert a == b and len(a) > 0
