#!/usr/bin/env python3
"""Reference-engine side of the merge microbench (dev tool): replays the
reference's exact merge query (kompactor.ts:107-111) — DuckDB, threads=4,
SELECT * ORDER BY time, ZSTD, ROW_GROUP_SIZE 100000 — over the fixture
written by `runMain graft.bench.MergeBench`.
Usage: python3 tools/merge_bench_duckdb.py <fixture_dir>"""
import sys, time, glob, json, os
import duckdb

root = sys.argv[1]
files = sorted(glob.glob(
    os.path.join(root, "edge0/dbs/db-0/table-0/2025-01-26/22-00/0*.parquet")))
assert files, "no fixture files — run graft.bench.MergeBench first"
out = os.path.join(root, "duckdb_merged.parquet")
con = duckdb.connect(":memory:", config={"threads": "4"})  # kompactor.ts:150
flist = ", ".join(f"'{f}'" for f in files)
t0 = time.time()
con.execute(f"""
    COPY (SELECT * FROM read_parquet([{flist}]) ORDER BY time)
    TO '{out}' (FORMAT 'parquet', COMPRESSION 'ZSTD', ROW_GROUP_SIZE 100000)
""")
sec = time.time() - t0
rows = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
print(json.dumps({"duckdb_sec": sec, "rows": rows,
                  "out_bytes": os.path.getsize(out)}))
