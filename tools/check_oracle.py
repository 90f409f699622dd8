#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--only a,b] [--skip a,b]

Registers each testdata parquet as a view, runs every oracle_sql.json
query, and compares it (column-name-sorted, row-sorted) against the
engine's parquet dump for that query. Dev tool only — not part of the
library.

Each query runs on a FRESH DuckDB connection with an explicit memory
limit: a long 257-query batch on one connection accumulates buffer-pool
state until a heavy oracle (q_pca_power-class) trips "bad allocation"
for every query after it — observed on the round-12 generated-fixture
runs; per-query connections make each verdict independent. --only/--skip
restrict the run for triage of heavy tails at large SFs.
"""
import os, sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir: str):
    con = duckdb.connect()
    # Wide-aggregate oracles (q_pca_power inlines a 64x64 covariance =
    # 4096 sum() expressions) allocate executor state per thread; at 32
    # threads that peaked past 24GB on the mult-1 generated fixture.
    # Fewer threads bound the peak; the limit is a backstop, env-tunable
    # for larger SFs.
    con.sql(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '48GB')}'")
    con.sql(f"SET threads TO {os.environ.get('ORACLE_THREADS', '16')}")
    for tbl in TABLES:
        # driver fixtures are single parquet FILES; MakeSf-generated
        # fixtures are Spark-written DIRECTORIES of part files
        path = f"{sf_dir}/{tbl}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{pat}')")
    return con


def main(sf_dir: str, out_dir: str, only=None, skip=None) -> int:
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # A typo in --only/--skip must not silently skip everything and
    # print a false-green "0/0 match": reject names not in the map.
    for flag, vals in (("--only", only), ("--skip", skip)):
        unknown = sorted(vals - oracle.keys()) if vals else []
        if unknown:
            print(f"ERROR: {flag} names not in oracle_sql.json: {unknown}")
            return 2
    failures = skipped = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            skipped += 1
            continue
        if skip is not None and name in skip:
            skipped += 1
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):  # filtered dev run
            skipped += 1
            continue
        con = None
        try:
            con = connect(sf_dir)
            mine = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            ref = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True)
            failures += 1
            if con is not None:
                con.close()
            continue
        con.close()
        mine = mine[sorted(mine.columns)]
        ref = ref[sorted(ref.columns)]
        schema_ok = [str(t) for t in mine.dtypes] == [str(t) for t in ref.dtypes] \
            and list(mine.columns) == list(ref.columns)
        if len(mine) != len(ref) or list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}, cols {list(mine.columns)} vs {list(ref.columns)}", flush=True)
            failures += 1
            continue
        ms = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
        rs = ref.sort_values(by=list(ref.columns)).reset_index(drop=True)
        eq = ms.equals(rs)
        if not eq:
            neq = (ms != rs) & ~(ms.isna() & rs.isna())
            bad = neq.any()[neq.any()].index.tolist()
            # dtype-only mismatches show as equals()==False with empty bad cols
            print(f"FAIL {name}: value diff in {bad} (schema_match={schema_ok})", flush=True)
            print("  mine:", dict(mine.dtypes.astype(str)))
            print("  ref :", dict(ref.dtypes.astype(str)))
            failures += 1
        else:
            flag = "" if schema_ok else "  [dtype drift]"
            print(f"ok   {name}: {len(mine)} rows{flag}", flush=True)
    ran = len(oracle) - skipped
    note = f" ({skipped} not dumped or filtered, skipped)" if skipped else ""
    print(f"\n{ran - failures}/{ran} oracle queries match{note}")
    if ran == 0:
        # "0/0 match" is not a pass — nothing was actually compared
        # (e.g. Verify dumped to a different dir, or filters excluded all).
        print("ERROR: zero queries ran — nothing was verified")
        return 2
    return 1 if failures else 0


def parse_listarg(argv, flag):
    if flag in argv:
        i = argv.index(flag)
        if i + 1 >= len(argv):
            sys.exit(f"ERROR: {flag} requires a comma-separated value")
        vals = set(argv[i + 1].split(","))
        del argv[i:i + 2]
        return vals
    return None


if __name__ == "__main__":
    argv = sys.argv[1:]
    only = parse_listarg(argv, "--only")
    skip = parse_listarg(argv, "--skip")
    sys.exit(main(argv[0], argv[1], only=only, skip=skip))
