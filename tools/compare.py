#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir parquet
tables, and compares: column names (sorted), row count, and exact values.
Reports per-query PASS/FAIL with first diffs. Exit 1 if any FAIL.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # numpy SCALARS (ndim == 0) also expose tolist(); unbox them to Python
    # scalars first or the tuple() branch below would crash on them
    if getattr(v, "ndim", None) == 0:
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # list/array cells (numpy arrays from parquet) -> plain tuples so the
    # != comparison stays scalar
    if hasattr(v, "tolist") and not hasattr(v, "upper"):
        return tuple(v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(v)
    return v


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    result_dirs = sorted(p for p in out_dir.iterdir() if p.is_dir())
    # parity sweep: every oracle must have a Spark result to judge — a gate
    # that crashed inside Verify would otherwise vanish from this report
    # and read as "0 failures". Verify filters oracle_sql.json by the same
    # SPARK_GRAFT_VERIFY_ONLY set it filters results by, so this holds
    # exactly on every dump, full or filtered.
    present = {p.name for p in result_dirs}
    for name in sorted(set(oracle) - present):
        print(f"✗ {name}: oracle present but NO SPARK RESULT (query crashed?)")
        failures.append(name)
    for qdir in result_dirs:
        name = qdir.name
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        if name not in oracle:
            # every judged gate ships an oracle (RegistrySpec pins this);
            # a result without one is a contract break, not a weaker check
            print(f"✗ {name}: NO-ORACLE rows={len(spark_df)}")
            failures.append(name)
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: oracle SQL error: {e}")
            failures.append(name)
            continue
        ok = True
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"✗ {name}: columns differ spark={sc} duck={dc}")
            ok = False
        elif len(spark_df) != len(duck_df):
            print(f"✗ {name}: rows differ spark={len(spark_df)} duck={len(duck_df)}")
            ok = False
        else:
            s = spark_df[sc].map(norm_cell)
            k = duck_df[sc].map(norm_cell)
            for c in sc:
                a, b = s[c].tolist(), k[c].tolist()
                bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
                if bad:
                    i, x, y = bad[0]
                    extra = ""
                    if isinstance(x, float) and isinstance(y, float):
                        extra = f" absdiff={abs(x-y):.3e}"
                    print(f"✗ {name}: col {c}: {len(bad)}/{len(a)} cells differ; "
                          f"first at row {i}: spark={x!r} duck={y!r}{extra} "
                          f"(types {type(x).__name__}/{type(y).__name__})")
                    ok = False
        if ok:
            print(f"✓ {name}: rows={len(spark_df)}")
        else:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
