#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a view, runs every oracle_sql.json
query, and compares it (column-name-sorted, row-sorted) against the
engine's parquet dump for that query. Dev tool only — not part of the
library.
"""
import os, sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = skipped = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):  # filtered dev run
            skipped += 1
            continue
        try:
            mine = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            ref = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        mine = mine[sorted(mine.columns)]
        ref = ref[sorted(ref.columns)]
        schema_ok = [str(t) for t in mine.dtypes] == [str(t) for t in ref.dtypes] \
            and list(mine.columns) == list(ref.columns)
        if len(mine) != len(ref) or list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}, cols {list(mine.columns)} vs {list(ref.columns)}")
            failures += 1
            continue
        ms = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
        rs = ref.sort_values(by=list(ref.columns)).reset_index(drop=True)
        eq = ms.equals(rs)
        if not eq:
            neq = (ms != rs) & ~(ms.isna() & rs.isna())
            bad = neq.any()[neq.any()].index.tolist()
            # dtype-only mismatches show as equals()==False with empty bad cols
            print(f"FAIL {name}: value diff in {bad} (schema_match={schema_ok})")
            print("  mine:", dict(mine.dtypes.astype(str)))
            print("  ref :", dict(ref.dtypes.astype(str)))
            failures += 1
        else:
            flag = "" if schema_ok else "  [dtype drift]"
            print(f"ok   {name}: {len(mine)} rows{flag}")
    ran = len(oracle) - skipped
    note = f" ({skipped} not dumped, skipped)" if skipped else ""
    print(f"\n{ran - failures}/{ran} oracle queries match{note}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
