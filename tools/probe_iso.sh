#!/bin/bash
# Scaling probe with PER-QUERY JVM ISOLATION.
#
# Why not one graft.Bench pass: running many heavy queries in ONE JVM
# accumulates cached/checkpointed blocks across queries, and at sf>=1
# that inflates later queries up to ~7x (knn_graph_ivf measured 56.9 s
# in-suite vs 8.4 s isolated at sf1). The committed sf0.1 BENCH_FULL is
# unaffected (working set fits), but any cross-SCALE ratio must come
# from fresh-JVM timings or the "decade-up" reads as a regression that
# isn't there. Each query here gets its own JVM with the same heap and
# core count at every scale, so ratios across scales are clean.
#
# Usage: tools/probe_iso.sh <sf_dir> <out_dir> [runs=3]
#   for q in ...: java graft.Bench  (SPARK_GRAFT_BENCH_ONLY=$q)
# Per-query full artifacts land in <out_dir>/<q>.json; summarize with
#   python3 tools/probe_summary.py <out_dir>
set -u
SF_DIR=$1; OUT=$2; RUNS=${3:-3}
QUERIES=${PROBE_QUERIES:-"q1_agg dedup_minhash_lsh text_quality graph_pagerank events_sessionize dedup_exact events_funnel q6_filter_agg sample_leakage_split q5_multijoin knn_graph_ivf dedup_substring"}
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADDOPENS="$ADDOPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
for q in $QUERIES; do
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_ONLY="$q" \
  SPARK_GRAFT_BENCH_RUNS="$RUNS" SPARK_GRAFT_BENCH_OUT="$OUT/$q.json" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  java $ADDOPENS -Xmx"${PROBE_HEAP:-16g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench > "$OUT/$q.stdout" 2> "$OUT/$q.stderr"
  echo "$q rc=$? $(date +%H:%M:%S)"
done
echo "PROBE DONE $SF_DIR"
