#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify.scala output.

Mimics the driver's t2 gate: for each query, load the Spark-written
parquet and run the oracle SQL in DuckDB over the same sf dir, then
compare after sorting columns by name and rows by all columns.
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes to strings for hashing parity
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if col.dtype == object:
            out[c] = col.astype(str)
        elif "float" in str(col.dtype):
            out[c] = col.round(6)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main(sf_dir: str, out_dir: str, skip: set | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        if skip and name in skip:
            print(f"SKIP {name}")
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.sql(sql).df()
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} vs "
                      f"{list(b.columns)}")
                n_fail += 1
            elif len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
                n_fail += 1
            elif not a.equals(b):
                neq = (a != b).any(axis=1)
                print(f"FAIL {name}: value mismatch on {neq.sum()} rows")
                print("spark:", a[neq].head(3).to_dict("records"))
                print("duck :", b[neq].head(3).to_dict("records"))
                n_fail += 1
            else:
                print(f"OK   {name}: {len(a)} rows")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_fail += 1
    return n_fail


if __name__ == "__main__":
    # Optional third arg: comma-separated query names to skip — used for
    # the sf0.1 cross-check, where a few ORACLES are quadratic SQL that
    # DuckDB cannot finish at 5k docs/vectors (the Spark side is fine;
    # those queries stay gated at sf0.01 plus their design-regime specs).
    skip_names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    sys.exit(1 if main(sys.argv[1], sys.argv[2], skip_names) else 0)
