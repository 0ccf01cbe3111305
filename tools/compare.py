#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py /tmp/verify_r2 /root/testdata/sf0.01
         [--skip=q1,q2] [--dump-diff[=N]]

Reads <outDir>/<name>/ parquet (Spark result) and <outDir>/oracle_sql.json,
runs each oracle in DuckDB against the sf tables, and compares rowcount,
schema (column names, sorted) and a value hash (columns sorted by name,
rows sorted, floats rounded via repr).

--dump-diff: on a hash mismatch, print the first N (default 5)
differing cells after canonical sort as
(row, column, spark_repr, oracle_repr, spark_dtype, oracle_dtype) —
names the offending column in one run instead of a round of cross-box
forensics (the r14 events_survival HUGEINT hunt).
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

def canon_rows(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    return sorted(
        tuple("NULL" if pd.isna(v) else (f"{v:.6g}" if isinstance(v, float) else str(v))
              for v in row)
        for row in df.itertuples(index=False, name=None))

def canon(df: pd.DataFrame) -> str:
    return hashlib.md5(repr(canon_rows(df)).encode()).hexdigest()

def dump_diff(spark_df, ora_df, limit):
    cols = sorted(spark_df.columns)
    dt_s = {c: str(spark_df[c].dtype) for c in cols}
    dt_o = {c: str(ora_df[c].dtype) for c in cols}
    a, b = canon_rows(spark_df), canon_rows(ora_df)
    shown = 0
    for i in range(max(len(a), len(b))):
        ra = a[i] if i < len(a) else None
        rb = b[i] if i < len(b) else None
        if ra == rb:
            continue
        for j, c in enumerate(cols):
            va = ra[j] if ra is not None else "<missing row>"
            vb = rb[j] if rb is not None else "<missing row>"
            if va != vb:
                print(f"  diff row {i} col {c}: spark={va!r} "
                      f"oracle={vb!r} dtype={dt_s[c]}/{dt_o[c]}")
                shown += 1
                if shown >= limit:
                    return
    if shown == 0:
        print("  (no cell-level diff after canonical sort — "
              "row-count mismatch only)")

def main(out_dir, sf_dir, skip=(), diff_limit=0):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    # Verify-side crash record: covers rows-only queries (no oracle
    # entry) whose failure would otherwise be invisible here. Oracle'd
    # queries that crashed also show below as ERROR (missing parquet).
    try:
        for name, err in sorted(json.load(open(f"{out_dir}/errors.json")).items()):
            if name not in oracles:
                fails += 1
                print(f"{name}: CRASHED {err}")
    except FileNotFoundError:
        pass  # pre-round-10 Verify output
    for name in sorted(oracles):
        if name in skip:
            # the caller certifies this query by other exact means
            # (e.g. semantic_clusters at sf1: DuckDB 1.0's recursive-
            # reach CTE needs O(component^2) temp on the percolated
            # graph; tools/check_clusters.py is the gate there)
            print(f"{name}: SKIPPED (certify separately)")
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in glob.glob(f"{out_dir}/{name}/*.parquet")],
                ignore_index=True)
            ora_df = con.execute(oracles[name]).fetchdf()
            rows_ok = len(spark_df) == len(ora_df)
            schema_ok = sorted(spark_df.columns) == sorted(ora_df.columns)
            hash_ok = schema_ok and canon(spark_df) == canon(ora_df)
            status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
            if status == "FAIL":
                fails += 1
                print(f"{name}: {status} rows={len(spark_df)}/{len(ora_df)} "
                      f"schema={schema_ok} hash={hash_ok}")
                if not schema_ok:
                    print(f"  spark cols: {sorted(spark_df.columns)}")
                    print(f"  oracle cols: {sorted(ora_df.columns)}")
                elif not hash_ok and diff_limit:
                    dump_diff(spark_df, ora_df, diff_limit)
            else:
                print(f"{name}: OK ({len(spark_df)} rows)")
        except Exception as e:
            fails += 1
            print(f"{name}: ERROR {e}")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0

if __name__ == "__main__":
    skip, diff_limit = (), 0
    for arg in sys.argv[3:]:
        if arg.startswith("--skip="):
            skip = tuple(arg[len("--skip="):].split(","))
        elif arg == "--dump-diff":
            diff_limit = 5
        elif arg.startswith("--dump-diff="):
            diff_limit = int(arg[len("--dump-diff="):])
    sys.exit(main(sys.argv[1], sys.argv[2], skip, diff_limit))
