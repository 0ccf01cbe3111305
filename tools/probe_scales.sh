#!/bin/bash
# Two-decade scaling probe: isolated per-query timings for a
# scale-shape-diverse registry subset at a given SF dir. Used to
# substantiate the BASELINE decade-up table across sf0.1 / sf1 / sf10
# (gen_sf.py makes the data). Run on a QUIET box — these numbers feed
# scaling-ratio claims.
#
#   tools/probe_scales.sh /tmp/sf10 /tmp/probe_sf10.json [runs]
#
# Query set: one representative per scale shape — linear scan/agg
# (q1_agg), pushdown filter (q6_filter_agg), multi-join (q5_multijoin),
# hash-dedup (dedup_exact), token-linear shuffle (dedup_substring),
# banded LSH (dedup_minhash_lsh), Theta(n^1.5) bucketed pairs
# (knn_graph_ivf), fixpoint iteration (graph_pagerank), session window
# (events_sessionize), single-scan chained windows (events_funnel),
# per-row codegen (text_quality), contraction + fate (sample_leakage_split).
set -euo pipefail
SF_DIR=$1
OUT=$2
RUNS=${3:-2}
QS=q1_agg,q6_filter_agg,q5_multijoin,dedup_exact,dedup_substring,dedup_minhash_lsh,knn_graph_ivf,graph_pagerank,events_sessionize,events_funnel,text_quality,sample_leakage_split
cd "$(dirname "$0")/.."
SPARK_GRAFT_BENCH_ONLY=$QS SPARK_GRAFT_BENCH_RUNS=$RUNS \
  SPARK_GRAFT_SF_DIR=$SF_DIR SPARK_GRAFT_BENCH_OUT=$OUT \
  sbt -batch "runMain graft.Bench" | grep -E '^\[info\] \{' || true
echo "wrote $OUT"
