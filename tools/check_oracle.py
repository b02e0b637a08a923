#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, and compares schema + values (column-name-sorted, row-sorted,
like the driver). Dev tool only — not part of the Scala library.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(outdir: str, sfdir: str) -> int:
    out = Path(outdir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_pass = n_fail = 0
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        got = pd.read_parquet(qdir)
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY?"
            print(f"  {name}: {status} ({len(got)} rows)")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"  {name}: COLUMN-MISMATCH spark={list(g.columns)} duckdb={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  {name}: ROWCOUNT-MISMATCH spark={len(g)} duckdb={len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
            print(f"  {name}: OK ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            msg = str(ex).splitlines()
            print(f"  {name}: VALUE-MISMATCH {' | '.join(msg[:6])}")
            # show first differing rows for debugging
            neq = (g != e) & ~(g.isna() & e.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"    first diff row {i}:\n      spark : {g.loc[i].to_dict()}\n      duckdb: {e.loc[i].to_dict()}")
            n_fail += 1
    print(f"PASS={n_pass} FAIL={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
