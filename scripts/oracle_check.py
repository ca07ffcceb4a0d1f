#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

For each query dumped by Verify: load <out>/<name> parquet, run the oracle
SQL from oracle_sql.json in DuckDB with views named after the tables, sort
columns by name + rows by all columns, compare values exactly.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if list(got.columns) != list(want.columns):
            ok = False
            msgs.append(f"columns {list(got.columns)} != {list(want.columns)}")
        elif [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
            ok = False
            msgs.append(f"dtypes {list(map(str, got.dtypes))} != {list(map(str, want.dtypes))}")
        elif len(got) != len(want):
            ok = False
            msgs.append(f"rows {len(got)} != {len(want)}")
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    same = (a.astype(object).where(pd.notna(a), None).tolist() ==
                            b.astype(object).where(pd.notna(b), None).tolist())
                except Exception:
                    same = a.tolist() == b.tolist()
                if not same:
                    ok = False
                    diff_idx = [i for i, (x, y) in
                                enumerate(zip(a.tolist(), b.tolist())) if x != y][:3]
                    ex = [(i, a.iloc[i], b.iloc[i]) for i in diff_idx]
                    msgs.append(f"col {c} differs, e.g. {ex}")
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(msgs)}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
