#!/usr/bin/env python3
"""Exact cross-implementation check for semantic_clusters.

At sf1 the refined knn_graph_ivf edge set PERCOLATES on the uniform
synthetic vectors (one component holds ~99% of the corpus), and
DuckDB 1.0's recursive-reach CTE oracle — the sf0.01/sf0.1 hash gate —
needs O(component^2) temp state there (measured: >79 GB spill, IO
error). Spark's large-star/small-star contraction is O(log d) rounds
and unaffected; only the ORACLE formulation hits a wall, because a
recursive CTE cannot express min-label-keyed state (DuckDB grows the
UNION-dedup'd set of every (node, label) pair ever seen; the
`USING KEY` form that fixes this landed after 1.0).

This script is the replacement oracle for that regime: an exact
union-find over the SAME τ-filtered edges of an already-hash-certified
knn_graph_ivf parquet — a fully independent implementation of the
clustering semantics (path-compressed DSU vs star-contraction), not a
re-run of the Spark code. Usage:

    python3 tools/check_clusters.py <verify_out_dir> [tau]

Reads <dir>/knn_graph_ivf/*.parquet and <dir>/semantic_clusters/
*.parquet, recomputes components + min-rep + sizes from scratch, and
diffs against the Spark output row-for-row. Exit 0 iff identical.

tau defaults to graft.operators.Dedup.SemTau's value (0.4), compared
on the ROUNDED cosine exactly as the query does.
"""
import sys

import duckdb


def main():
    out_dir = sys.argv[1]
    tau = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4

    con = duckdb.connect()
    edges = con.execute(
        f"SELECT q_id, n_id FROM '{out_dir}/knn_graph_ivf/*.parquet' "
        f"WHERE cos >= {tau}").fetchall()
    got = con.execute(
        f"SELECT vec_id, cluster_rep, n_members FROM "
        f"'{out_dir}/semantic_clusters/*.parquet' ORDER BY vec_id"
    ).fetchall()

    # path-compressed + rank-union DSU over the undirected edge set
    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so reps match the query's convention
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    expect = []
    for rep, members in comp.items():
        rep_min = min(members)  # find-root is already the min by union rule
        assert rep_min == rep, f"union-by-min broken: {rep} vs {rep_min}"
        for m in members:
            expect.append((m, rep, len(members)))
    expect.sort()

    if expect == [tuple(r) for r in got]:
        sizes = sorted((len(m) for m in comp.values()), reverse=True)
        print(f"MATCH: {len(expect)} rows, {len(comp)} components, "
              f"largest {sizes[0] if sizes else 0}")
        return 0
    print(f"MISMATCH: union-find says {len(expect)} rows, "
          f"spark wrote {len(got)}")
    for e, g in list(zip(expect, got))[:10]:
        if e != tuple(g):
            print(f"  first diff: expect {e} got {tuple(g)}")
            break
    return 1


if __name__ == "__main__":
    sys.exit(main())
