#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB oracle check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, run its oracle SQL in DuckDB over
the same parquet tables, then compare: column names (sorted), row count,
and a hash of the value matrix (rows sorted by all columns, doubles
rendered at 9 significant digits — canon()'s %.9g; keep the two in
sync). Mismatches print a diff sample.
Queries without oracle SQL get a rows>0 check only.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "null" if pd.isna(v) else f"{v:.9g}")
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        else:
            out[c] = s.astype(str)
    r = pd.DataFrame(out)
    return r.sort_values(by=list(r.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        if name not in oracles:
            ok = len(got) > 0
            print(f"{'pass' if ok else 'FAIL'} {name}: rows-only ({len(got)} rows)")
            n_pass += ok
            n_fail += not ok
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        cg, ce = canon(got), canon(exp)
        if list(cg.columns) != list(ce.columns):
            print(f"FAIL {name}: columns {list(cg.columns)} vs {list(ce.columns)}")
            n_fail += 1
            continue
        if len(cg) != len(ce):
            print(f"FAIL {name}: rows {len(cg)} vs {len(ce)}")
            n_fail += 1
            continue
        neq = (cg.values != ce.values)
        if neq.any():
            i, j = np.argwhere(neq)[0]
            print(f"FAIL {name}: value mismatch at row {i} col {cg.columns[j]}: "
                  f"spark={cg.values[i, j]!r} duckdb={ce.values[i, j]!r} "
                  f"({neq.sum()} cells differ)")
            n_fail += 1
            continue
        print(f"pass {name}: {len(cg)} rows hash-match")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
