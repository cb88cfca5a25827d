#!/usr/bin/env python3
"""Local oracle-parity checker mirroring the driver's t2 gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads each Spark result parquet written by graft.Verify, runs the declared
DuckDB oracle SQL on the same tables, and compares: column names (sorted),
row count, and cell-exact values in stored row order.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm_cell(x) for x in v)
    return v


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok, fails = [], []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output")
                fails.append(name); continue
            s = pd.read_parquet(files)
        except Exception as e:
            print(f"FAIL {name}: spark read error {e}")
            fails.append(name); continue
        try:
            d = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            fails.append(name); continue
        s = s[sorted(s.columns)]
        d = d[sorted(d.columns)]
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}")
            fails.append(name); continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            fails.append(name); continue
        # dtype-strict: the driver hashes materialized values, so an int64
        # column vs a float64 column (DuckDB HUGEINT/DOUBLE widening) hash-
        # mismatches even when every cell compares equal in Python. Compare
        # numpy dtype *kind* (i/u/f/b/M/O) per column and fail on any drift.
        kind_fail = None
        for c in s.columns:
            sk, dk = s[c].dtype.kind, d[c].dtype.kind
            if sk in ("i", "u") and dk in ("i", "u"):
                continue  # width differences (int32 vs int64) hash alike
            if sk != dk:
                kind_fail = (c, s[c].dtype, d[c].dtype)
                break
        if kind_fail:
            c, st, dt = kind_fail
            print(f"FAIL {name}: dtype col={c} spark={st} duck={dt}")
            fails.append(name); continue
        mismatch = None
        for ci, c in enumerate(s.columns):
            sv = [norm_cell(x) for x in s[c].tolist()]
            dv = [norm_cell(x) for x in d[c].tolist()]
            for ri, (a, b) in enumerate(zip(sv, dv)):
                if a != b:
                    mismatch = (c, ri, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, ri, a, b = mismatch
            print(f"FAIL {name}: col={c} row={ri} spark={a!r} duck={b!r}")
            # dtype context
            print(f"     dtypes spark={dict(s.dtypes.astype(str))}")
            print(f"     dtypes duck ={dict(d.dtypes.astype(str))}")
            fails.append(name)
        else:
            ok.append(name)
            print(f"ok   {name} ({len(s)} rows)")
    print(f"\n{len(ok)}/{len(oracle)} queries match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
