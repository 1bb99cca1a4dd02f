#!/usr/bin/env python3
"""Dev-only local oracle check, mimicking the driver's t2 lane.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet,
and compares: schema (sorted column names), row count, and value hash over
rows sorted by all columns. NOT shipped library code.
"""
import json, sys, math
import duckdb
import pandas as pd
from pathlib import Path

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # The driver does NOT normalize list/ndarray cells before its
    # sort_values — an array-typed output column crashes its compare
    # (TypeError: unhashable type). Fail loudly here so no catalog query
    # ever ships one (cost: p30/q37 silently broken in rounds 2-3).
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     type(v).__name__ == "ndarray").any():
            raise TypeError(f"array-typed output column '{c}' — the "
                            "driver compare cannot sort this; emit scalars")
    # normalize values for stable compare
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v): return "NaN"
            return repr(v)
        if isinstance(v, bytes): return v.hex()
        if isinstance(v, list): return tuple(norm(x) for x in v)
        try:
            import numpy as np
            if isinstance(v, np.ndarray): return tuple(norm(x) for x in v.tolist())
            if isinstance(v, (np.integer,)): return int(v)
            if isinstance(v, (np.floating,)): return repr(float(v))
        except ImportError:
            pass
        return v
    out = df.map(norm)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_path = Path(out_dir, name)
        if not res_path.exists():
            print(f"FAIL {name}: no spark result"); n_fail += 1; continue
        got = canon(pd.read_parquet(res_path))
        want = canon(con.execute(oracle[name]).df())
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        elif not got.equals(want):
            diff = (got != want).any(axis=1)
            i = diff.idxmax()
            status.append(f"values differ at row {i}:\n  spark: {got.iloc[i].to_dict()}\n  duck : {want.iloc[i].to_dict()}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
