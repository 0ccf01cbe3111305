#!/usr/bin/env python3
"""Independent exact k-core check for graph_kcore (no SQL oracle: the
converging fixpoint is the recursive-CTE shape DuckDB 1.0 can't run —
the check_clusters.py precedent). Rebuilds the co-purchase graph from
lineitem.parquet, runs the textbook O(E) bucket-queue peel (a DIFFERENT
algorithm than the engine's h-index fixpoint), and diffs coreness
row-for-row against the Spark output parquet.

Usage: check_kcore.py <sf_dir> <kcore_output_dir_or_parquet>
"""
import sys
import collections

import duckdb


def main() -> int:
    sf_dir, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    edges = con.execute(f"""
        WITH li AS (SELECT l_orderkey k, l_partkey p
                    FROM '{sf_dir}/lineitem.parquet')
        SELECT DISTINCT a.p, b.p FROM li a
        JOIN li b ON a.k = b.k AND a.p < b.p""").fetchall()
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)

    # bucket-queue peel: process nodes in nondecreasing current-degree
    # order; coreness(v) = max degree bound seen when v is removed
    deg = {v: len(n) for v, n in adj.items()}
    maxd = max(deg.values())
    buckets = [set() for _ in range(maxd + 1)]
    for v, d in deg.items():
        buckets[d].add(v)
    core = {}
    removed = set()
    k = 0
    for d in range(maxd + 1):
        if d > k:
            k = d
        stack = list(buckets[d])
        while stack:
            v = stack.pop()
            if v in removed or deg[v] > d:
                continue
            core[v] = k
            removed.add(v)
            for u in adj[v]:
                if u in removed:
                    continue
                du = deg[u]
                deg[u] = du - 1
                buckets[du].discard(u)
                buckets[du - 1].add(u)
                if du - 1 <= d:
                    stack.append(u)

    got = dict(con.execute(
        f"SELECT node, coreness FROM '{out}/*.parquet'").fetchall())
    if set(got) != set(core):
        print(f"FAIL: node sets differ (got {len(got)}, want {len(core)})")
        return 1
    bad = [(n, got[n], core[n]) for n in core if got[n] != core[n]]
    if bad:
        print(f"FAIL: {len(bad)} coreness mismatches; first 5: {bad[:5]}")
        return 1
    kmax = max(core.values())
    print(f"MATCH: {len(core)} nodes, k_max={kmax}, "
          f"{len(edges)} edges — exact peel == engine output")
    return 0


if __name__ == "__main__":
    sys.exit(main())
