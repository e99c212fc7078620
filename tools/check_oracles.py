#!/usr/bin/env python3
"""Local DuckDB oracle-parity checker mimicking the round driver's compare:
for each query parquet written by graft.Verify, run the matching SQL from
oracle_sql.json in DuckDB over the same testdata parquet tables, sort columns
by name and rows by all columns, and diff.

Usage: check_oracles.py <verify_out_dir> <sf_dir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64")
        elif k == "M":
            df[c] = df[c].astype("datetime64[us]")
        else:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  [NODATA] {name}")
            continue
        got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        if name not in oracles:
            print(f"  [ROWS-ONLY] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"  [SQL-ERR] {name}: {ex}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"  [COLS] {name}: spark={list(g.columns)} duck={list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"  [NROWS] {name}: spark={len(g)} duck={len(w)}")
            n_fail += 1
        elif not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            print(f"  [DIFF] {name}: {bad.sum()} differing rows; first:")
            print(pd.concat([g[bad].head(3).add_suffix("_spark"),
                             w[bad].head(3).add_suffix("_duck")], axis=1).to_string())
            n_fail += 1
        else:
            print(f"  [PASS] {name}: {len(g)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
