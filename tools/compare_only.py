#!/usr/bin/env python3
"""Selective re-run of tools/compare.py logic.

Usage:
  python3 tools/compare_only.py <outDir> <sfDir> [--skip n1,n2 | --only n1,n2]

Same row/schema/hash gate as compare.py, but over a subset — the
iteration loop when a full-corpus compare at a big SF would repay
hours for one suspect. Prints each result unbuffered, failures with
the same diagnostics.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple("NULL" if pd.isna(v) else (f"{v:.6g}" if isinstance(v, float) else str(v))
              for v in row)
        for row in df.itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()

def main(out_dir, sf_dir, args):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracles)
    if "--skip" in args:
        skip = set(args[args.index("--skip") + 1].split(","))
        names = [n for n in names if n not in skip]
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))
        names = [n for n in names if n in only]
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    for name in names:
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in glob.glob(f"{out_dir}/{name}/*.parquet")],
                ignore_index=True)
            ora_df = con.execute(oracles[name]).fetchdf()
            rows_ok = len(spark_df) == len(ora_df)
            schema_ok = sorted(spark_df.columns) == sorted(ora_df.columns)
            hash_ok = schema_ok and canon(spark_df) == canon(ora_df)
            if rows_ok and schema_ok and hash_ok:
                print(f"{name}: OK ({len(spark_df)} rows)", flush=True)
            else:
                fails += 1
                print(f"{name}: FAIL rows={len(spark_df)}/{len(ora_df)} "
                      f"schema={schema_ok} hash={hash_ok}", flush=True)
        except Exception as e:
            fails += 1
            print(f"{name}: ERROR {e}", flush=True)
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
