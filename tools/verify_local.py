#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT shipped library
code — dev tooling only): reads the parquet dumps written by
`graft.Verify`, runs each oracle SQL in DuckDB against the same sf dir,
and compares values with rows/columns sorted.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def load_result(con, path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return pd.DataFrame()
    return con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # normalize away dtype differences that stringify identically
    return df.astype(str)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = load_result(con, qdir)
        if name not in oracle:
            print(f"[rows-only ] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[oracle-ERR] {name}: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        cols_ok = list(g.columns) == list(w.columns)
        rows_ok = len(g) == len(w)
        vals_ok = cols_ok and rows_ok and g.equals(w)
        if vals_ok:
            print(f"[PASS      ] {name}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"[FAIL      ] {name}: cols_ok={cols_ok} rows {len(g)} vs {len(w)}")
            if not cols_ok:
                print(f"   got cols : {list(g.columns)}\n   want cols: {list(w.columns)}")
            elif rows_ok:
                neq = (g != w).any(axis=1)
                print(pd.concat([g[neq].head(3).add_prefix("got_"),
                                 w[neq].head(3).add_prefix("want_")], axis=1))
    missing = sorted(set(oracle) - set(os.listdir(out_dir)))
    for m in missing:
        print(f"[NO-OUTPUT ] {m}")
    print(f"\n{n_pass} pass / {n_fail} fail / {len(missing)} missing")
    return 1 if (n_fail or missing) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
