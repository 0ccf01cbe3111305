#!/usr/bin/env python3
"""Blanket oracle output-type contract (VERDICT r14 Next #2).

Every oracle output column must be a portable type — one whose
DuckDB->pandas materialization is stable across DuckDB/pandas
versions. The r14 driver-red events_survival row was exactly this
class: an un-cast `sum(bigint) OVER ()` is HUGEINT, whose Python
rendering changed across versions (float64 vs object int), flipping
the value hash with zero numeric drift. This gate makes the class
unrepresentable: DESCRIBE every oracle against the sf views and fail
on any column outside the allowlist.

Usage: python3 tools/check_oracle_types.py <oracle_sql.json> <sf_dir>
  (oracle_sql.json comes from any graft.Verify run's outDir; run
  Verify at sf0.001 first if you don't have one.)
"""
import sys, json
import duckdb

ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN",
           "DATE", "TIMESTAMP"}

def main(oracle_json, sf_dir):
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad, errs = [], []
    for name in sorted(oracles):
        try:
            rows = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:  # a DESCRIBE failure is a gate failure
            errs.append((name, str(e).splitlines()[0]))
            continue
        for col, typ, *_ in rows:
            if typ not in ALLOWED:
                bad.append((name, col, typ))
    for name, col, typ in bad:
        print(f"TYPE VIOLATION {name}.{col}: {typ} (allowed: "
              f"{'/'.join(sorted(ALLOWED))})")
    for name, err in errs:
        print(f"DESCRIBE ERROR {name}: {err}")
    n = len(oracles)
    if bad or errs:
        print(f"\n{len(bad)} violations, {len(errs)} errors / {n} oracles")
        return 1
    print(f"ALL PORTABLE ({n} oracles, every output column in "
          f"{'/'.join(sorted(ALLOWED))})")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
