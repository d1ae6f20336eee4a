#!/usr/bin/env python3
"""Local differential-parity harness (dev loop only — NOT shipped code).

Mimics the driver's t2 gate: runs graft.Verify output against DuckDB on the
same parquet tables and diffs per query. Usage:

    python3 scripts/parity.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        # Driver sorts columns by name before hashing; row order preserved.
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            failures += 1
            continue
        # Value compare on normalized string rendering (like a hash would).
        sv = s.astype(str).reset_index(drop=True)
        ov = o.astype(str).reset_index(drop=True)
        neq = (sv != ov).any(axis=1)
        if neq.any():
            i = neq.idxmax()
            print(f"FAIL {name}: first diff at row {i}:")
            print("  spark :", dict(sv.iloc[i]))
            print("  oracle:", dict(ov.iloc[i]))
            # dtypes help debugging
            print("  spark dtypes :", dict(spark_df.dtypes.astype(str)))
            print("  oracle dtypes:", dict(oracle_df.dtypes.astype(str)))
            failures += 1
            continue
        print(f"OK   {name} ({len(s)} rows)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
