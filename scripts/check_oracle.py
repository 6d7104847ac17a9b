#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Usage:
  sbt "runMain graft.Verify <sfDir> <outDir> [name,name,...]"
  python3 scripts/check_oracle.py <sfDir> <outDir> [comma-names]

Reads <outDir>/oracle_sql.json, runs each oracle in DuckDB against the
parquet tables in <sfDir>, and compares column-sorted stringified values
against the Verify parquet dumps in <outDir>/<name>/.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if not os.path.isdir(f"{out}/{name}"):
            print(f"MISSING  {name} (no Verify output)")
            n_fail += 1
            continue
        spark = pd.read_parquet(f"{out}/{name}")
        duck = con.execute(oracle[name]).df()

        def canon(df: pd.DataFrame) -> pd.DataFrame:
            # List-valued cells arrive as numpy arrays (parquet) or Python
            # lists (DuckDB) with different str() forms ('[1 2]' vs
            # '[1, 2]') and are unhashable in pandas sort paths —
            # canonicalize to a plain-list JSON string before compare.
            df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
            for c in df.columns:
                if df[c].map(lambda v: hasattr(v, "__len__")
                             and not isinstance(v, (str, bytes))).any():
                    # .item() unwraps numpy scalars (int64/float64) that
                    # json.dumps otherwise rejects for integer lists.
                    df[c] = df[c].map(lambda v: json.dumps(
                                          [x.item() if hasattr(x, "item") else x
                                           for x in v])
                                      if hasattr(v, "__len__")
                                      and not isinstance(v, (str, bytes)) else v)
            return df.astype(str)

        s = canon(spark)
        d = canon(duck)
        if list(s.columns) != list(d.columns):
            print(f"SCHEMA   {name}: spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
        elif len(s) != len(d):
            print(f"ROWS     {name}: spark={len(s)} duck={len(d)}")
            n_fail += 1
        elif not s.equals(d):
            diff = (s != d).any(axis=1)
            print(f"VALUES   {name}: {int(diff.sum())} differing rows; first:")
            print(s[diff].head(2).to_string())
            print(d[diff].head(2).to_string())
            n_fail += 1
        else:
            print(f"OK       {name} ({len(s)} rows)")
    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
