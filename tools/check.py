#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB oracle check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [resultJsonPath]

With a third argument, also writes a per-query result map (the
CORRECTNESS_r{N}.json shape) so a full local pass can be committed as
an auditable artifact.

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
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}

    def record(name, ok, msg, spark_rows=None, oracle_rows=None,
               rows_match=None, schema_match=None, hash_match=None, err=None):
        print(f"{'pass' if ok else 'FAIL'} {name}: {msg}")
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }
        return ok

    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            n_fail += not record(name, False, "no parquet output",
                                 err="no parquet output")
            continue
        got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        if name not in oracles:
            ok = len(got) > 0
            record(name, ok, f"rows-only ({len(got)} rows)",
                   spark_rows=len(got), rows_match=ok,
                   err=None if ok else "empty result")
            n_pass += ok
            n_fail += not ok
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            n_fail += not record(name, False, f"oracle SQL error: {e}",
                                 spark_rows=len(got), err=str(e))
            continue
        cg, ce = canon(got), canon(exp)
        if list(cg.columns) != list(ce.columns):
            n_fail += not record(
                name, False, f"columns {list(cg.columns)} vs {list(ce.columns)}",
                spark_rows=len(cg), oracle_rows=len(ce), rows_match=None,
                schema_match=False, err="schema mismatch")
            continue
        if len(cg) != len(ce):
            n_fail += not record(
                name, False, f"rows {len(cg)} vs {len(ce)}",
                spark_rows=len(cg), oracle_rows=len(ce), rows_match=False,
                schema_match=True, err="row count mismatch")
            continue
        neq = (cg.values != ce.values)
        if neq.any():
            i, j = np.argwhere(neq)[0]
            n_fail += not record(
                name, False,
                f"value mismatch at row {i} col {cg.columns[j]}: "
                f"spark={cg.values[i, j]!r} duckdb={ce.values[i, j]!r} "
                f"({neq.sum()} cells differ)",
                spark_rows=len(cg), oracle_rows=len(ce), rows_match=True,
                schema_match=True, hash_match=False, err="value mismatch")
            continue
        record(name, True, f"{len(cg)} rows hash-match",
               spark_rows=len(cg), oracle_rows=len(ce), rows_match=True,
               schema_match=True, hash_match=True)
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": results}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
