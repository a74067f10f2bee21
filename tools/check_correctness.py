#!/usr/bin/env python
"""Driver-style correctness harness: run every queries() entry at sf0.01 and
compare rows/schema/values against its oracle_sql() DuckDB result (column
sort + 6dp float rounding, order-insensitive), mirroring the per-round
CORRECTNESS_r{N}.json gate so oracle drift is caught before round end."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = argv
    results: dict[str, dict] = {}
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {e!r}"[:300])
            results[name] = {"status": "FAIL", "err": repr(e)[:200]}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            results[name] = {"status": "rows-only", "rows_spark": len(sdf)}
            n_rowsonly += 1
            spark.catalog.clearCache()
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e!r}"[:300])
            results[name] = {"status": "FAIL", "err": repr(e)[:200]}
            n_fail += 1
            continue
        s, o = canon(sdf), canon(odf)
        ok_rows = len(s) == len(o)
        ok_schema = list(s.columns) == list(o.columns)
        # Driver-style strict check: the external driver hashes the EXACT
        # string rendering of each cell after column sort, so an int64 vs
        # float64 dtype mismatch ("264" vs "264.0") is red there even when
        # allclose passes.  Replicate that here so the FULL artifact can't
        # be greener than the driver (the r4 quality_roc lesson).
        ok_render = False
        if ok_rows and ok_schema:
            try:
                ok_render = all(
                    s[c].astype(str).equals(o[c].astype(str)) for c in s.columns
                )
            except Exception:
                ok_render = False
        ok_vals = False
        if ok_rows and ok_schema:
            try:
                ok_vals = True
                for c in s.columns:
                    a, b = s[c], o[c]
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        same = np.allclose(
                            a.astype(float), b.astype(float), atol=1e-9, equal_nan=True
                        )
                    else:
                        same = a.astype(str).equals(b.astype(str))
                    if not same:
                        ok_vals = False
                        print(f"  col {c} differs; sample:\n{pd.concat([a, b], axis=1).head(3)}")
            except Exception as e:
                print(f"  compare error {e!r}")
        status = "PASS" if (ok_rows and ok_schema and ok_vals and ok_render) else "FAIL"
        results[name] = {
            "status": status,
            "rows_spark": len(s),
            "rows_oracle": len(o),
            "schema_ok": bool(ok_schema),
            "vals_ok": bool(ok_vals),
            "render_ok": bool(ok_render),
            "sec": round(time.time() - t0, 2),
        }
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(
            f"{status} {name}: spark={len(s)} oracle={len(o)} schema={ok_schema} "
            f"vals={ok_vals} render={ok_render} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL" and ok_rows and not ok_schema:
            print(f"  spark cols: {list(s.columns)}\n  oracle cols: {list(o.columns)}")
        spark.catalog.clearCache()
    print(f"\nsummary: {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "summary": {"pass": n_pass, "fail": n_fail, "rows_only": n_rowsonly},
                    "queries": results,
                },
                f,
                indent=1,
            )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
