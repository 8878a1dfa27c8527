#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB against the same
parquet tables, loads the Spark result parquet, sorts columns by name
and rows by all values, and compares. Usage:

    python3 tools/check.py /root/testdata/sf0.01 /tmp/vout [query ...]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written directory (e.g. SynthGen)
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = canon(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = canon(con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: spark result missing/unreadable: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {list(exp.columns)}\n  spark:  {list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows differ oracle={len(exp)} spark={len(got)}")
            n_fail += 1
            continue
        # dtype-tolerant exact value compare
        mism = None
        for c in exp.columns:
            a, b = exp[c], got[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mism = (c, i, a.iloc[i], b.iloc[i])
                break
        if mism:
            c, i, av, bv = mism
            print(f"FAIL {name}: value mismatch col={c} row={i} oracle={av!r} spark={bv!r}")
            n_fail += 1
        else:
            # flag dtype drift (schema-hash risk even when values match)
            drift = [(c, str(exp[c].dtype), str(got[c].dtype))
                     for c in exp.columns if str(exp[c].dtype) != str(got[c].dtype)]
            tag = f"  [dtype drift: {drift}]" if drift else ""
            print(f"PASS {name} ({len(exp)} rows){tag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
