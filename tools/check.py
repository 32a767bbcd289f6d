#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (dev tool only —
the Scala library has no Python dependency). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name>/ parquet (Spark result) and replays
<outDir>/oracle_sql.json in DuckDB over the same sf tables; compares
row counts, sorted-by-name schemas, and value hashes."""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def canon(rel):
    df = rel.df()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
names = sorted(d for d in os.listdir(out)
               if os.path.isdir(os.path.join(out, d)))
for name in names:
    files = glob.glob(os.path.join(out, name, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})"))
    if name not in oracle:
        print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
    try:
        want = canon(con.sql(oracle[name]))
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
    import pandas as pd
    eq = got.equals(want)
    if not eq:
        # locate first mismatching cell for debugging
        for c in got.columns:
            gc, wc = got[c], want[c]
            bad = ~((gc == wc) | (gc.isna() & wc.isna()))
            if bad.any():
                i = bad.idxmax()
                print(f"FAIL {name}: col {c} row {i}: {gc[i]!r} != {wc[i]!r} "
                      f"({bad.sum()} cells differ)")
                break
        else:
            print(f"FAIL {name}: frames differ (dtype?) "
                  f"{got.dtypes.to_dict()} vs {want.dtypes.to_dict()}")
        fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(names)} queries")
sys.exit(1 if fails else 0)
