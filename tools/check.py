#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB oracle check.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [resultJsonPath]

With a third argument, also writes a per-query result map (the
CORRECTNESS_r{N}.json shape) so a full local pass can be committed as
an auditable artifact.

For each query dumped by graft.Verify, run its oracle SQL in DuckDB over
the same parquet tables, then compare: column names (sorted), per-column
dtype KINDS (int/float/datetime/bool/other — the round-9 lesson: DuckDB
materializes HUGEINT sums as float64 while Spark dumps int64, and a
names-only schema check plus %.9g canon rendered 123.0 == 123, hiding
exactly the class the driver rejects), row count, and a hash of the
value matrix (rows sorted by all columns, doubles rendered at 9
significant digits — canon()'s %.9g; keep the two in sync). Mismatches
print a diff sample.
Queries without oracle SQL get a rows>0 check only.

`python3 tools/check.py --selftest` plants an uncast-sum fixture (Spark
int64 vs DuckDB HUGEINT-sum float64, identical values) and asserts the
dtype-kind check FAILS it — run after any edit to this file.
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


def dtype_kind(s: pd.Series) -> str:
    """Collapse a dtype to the kind class the driver's canon
    distinguishes. int-vs-float is the class that shipped 10 red gates
    in round 9; bool/datetime kept separate for the same reason.
    Spark DATE columns read back as object-of-datetime.date while
    DuckDB DATE fetches as datetime64 — the driver accepts that pair
    (8 date-keyed queries green since r3), so both map to 'datetime'
    here; the local mirror must not invent reds the driver won't."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if s.dtype == object:
        import datetime
        nn = s.dropna()
        if len(nn) and isinstance(nn.iloc[0],
                                  (datetime.date, datetime.datetime)):
            return "datetime"
    return "other"


def kind_mismatches(got: pd.DataFrame, exp: pd.DataFrame):
    """Per-column dtype-kind diffs (column name -> (spark, oracle))
    over the shared columns, order-insensitive."""
    bad = {}
    for c in sorted(set(got.columns) & set(exp.columns)):
        kg, ke = dtype_kind(got[c]), dtype_kind(exp[c])
        if kg != ke:
            bad[c] = (kg, ke)
    return bad


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


def selftest():
    """Planted round-9 fixture: a Spark dump whose column is int64 while
    the oracle exposes an uncast sum(BIGINT) (HUGEINT -> float64 in
    fetchdf), identical VALUES. The old names-only schema check + %.9g
    canon passed this; the dtype-kind check must fail it."""
    import tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as tmp:
        spark = pd.DataFrame({"grp": ["a", "b"],
                              "n": np.array([3, 7], dtype="int64")})
        os.makedirs(f"{tmp}/q_planted")
        spark.to_parquet(f"{tmp}/q_planted/part-0.parquet")
        exp = con.execute(
            "SELECT grp, sum(n) AS n FROM (VALUES ('a', 1::BIGINT), "
            "('a', 2::BIGINT), ('b', 7::BIGINT)) t(grp, n) "
            "GROUP BY 1").fetchdf()
        assert dtype_kind(exp["n"]) == "float", \
            f"fixture lost its point: oracle n is {exp['n'].dtype}"
        got = pd.read_parquet(f"{tmp}/q_planted/part-0.parquet")
        bad = kind_mismatches(got, exp)
        assert bad == {"n": ("int", "float")}, f"detector missed: {bad}"
        # canon alone (the old check) renders them identical — proves
        # the kind check is load-bearing, not redundant
        cg, ce = canon(got), canon(exp)
        assert (cg.values == ce.values).all(), "canon no longer hides it?"
        # and a true kind AGREEMENT passes clean
        assert kind_mismatches(got, got.copy()) == {}
    print("selftest pass: planted uncast-sum fixture rejected by "
          "dtype-kind check (and invisible to canon, as in round 9)")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        return
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
        kinds = kind_mismatches(got, exp)
        if kinds:
            detail = ", ".join(f"{c}: spark={g} oracle={e}"
                               for c, (g, e) in kinds.items())
            n_fail += not record(
                name, False, f"dtype-kind mismatch ({detail})",
                spark_rows=len(cg), oracle_rows=len(ce), rows_match=None,
                schema_match=False, err=f"dtype kind mismatch: {detail}")
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
