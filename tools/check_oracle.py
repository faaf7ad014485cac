#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the
same parquet tables, then compares: column names (sorted), row counts, and
values (rows sorted by all columns, exact equality; floats compared exactly
since queries are engineered to be bit-deterministic).

Mirrors two driver-comparator strictnesses learned in round 1:
- dtype-sensitive: pandas dtypes must match between the Spark parquet and
  the DuckDB result (int64 vs float64, object/Decimal vs float64 all FAIL
  even when values are numerically equal);
- array-typed cells are a hard FAIL (the driver's pandas sort_values
  raises "unhashable type: numpy.ndarray" on them — serialize arrays to
  strings in the verified projection instead).

Dev tooling only — not part of the shipped library.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def key(v):
        if isinstance(v, list):
            return str(list(v))
        try:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return "\x00NULL"
        except Exception:
            pass
        return str(v)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.map(key))
    return df.reset_index(drop=True)


def cell_eq(a, b):
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        return str(a) == str(b)
    a_nan = isinstance(a, float) and math.isnan(a)
    b_nan = isinstance(b, float) and math.isnan(b)
    if a_nan or b_nan:
        return a_nan and b_nan
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return str(a) == str(b)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1
            continue
        arr_cols = [c for c in g.columns if any(
            isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
            for side in (g, e) if len(side) > 0
            for v in (side[c].iloc[0],))]
        if arr_cols:
            print(f"FAIL {name}: array-typed cols {arr_cols} break the driver comparator")
            n_fail += 1
            continue
        def family(s):
            k = s.dtype.kind
            if k in "iu":
                return "int"
            if k == "f":
                return "float"
            if k == "M":
                return "datetime"
            if k == "b":
                return "bool"
            if k == "O" and len(s) > 0 and type(s.iloc[0]).__name__ == "Decimal":
                return "decimal"
            return str(s.dtype) if k != "O" else "object"
        dt_bad = [(c, family(g[c]), family(e[c])) for c in g.columns
                  if family(g[c]) != family(e[c])]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(g)):
            for c in g.columns:
                if not cell_eq(g[c].iloc[i], e[c].iloc[i]):
                    bad = (i, c, g[c].iloc[i], e[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            i, c, gv, ev = bad
            print(f"FAIL {name}: row {i} col {c}: spark={gv!r} oracle={ev!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
