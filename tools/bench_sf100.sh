#!/bin/bash
# Chunked sf100 bench recording (attempt 4). Each chunk runs in its OWN
# JVM so a mid-chunk failure leaves every earlier chunk's artifact on
# disk, and JVM exit frees that chunk's shuffle/checkpoint scratch before
# the next disk-heavy chunk starts. Chunks are merged into one
# shape-identical BENCH record by tools/merge_bench.py.
#
# Chunk layout is by DISK footprint, the resource that killed attempts
# 1-3: q21 (double lineitem self-join, ~3x the fact table live) and d2
# (corpus-sized shingle/bucket staging) each get a dedicated JVM; the
# streaming pair runs last (RocksDB state, heavy but self-cleaning).
#
# Usage: tools/bench_sf100.sh [outPrefix]   (run from /root/repo)
set -e
SF_DIR="${SPARK_GRAFT_SF_DIR:-/tmp/graft_sf100}"
PREFIX="${1:-/tmp/bench_sf100}"
export SPARK_GRAFT_SF_DIR="$SF_DIR"
export SPARK_GRAFT_BENCH_REPS="${SPARK_GRAFT_BENCH_REPS:-2}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-64g}"

run_chunk() { # name, query list
  local name="$1" queries="$2"
  echo "=== chunk $name: $queries (disk: $(df -h / | awk 'NR==2{print $4}') free)"
  SPARK_GRAFT_BENCH_ONLY="$queries" ./run_tool.sh graft.Bench \
    > "${PREFIX}_${name}.log" 2>&1
  cp bench_out.json "${PREFIX}_${name}.json"
  tail -1 "${PREFIX}_${name}.log"
}

run_chunk a "q1_pricing_summary,q3_shipping_priority,q5_local_revenue,q6_forecast_revenue,q9_profit_by_nation,q10_returned_items,q18_large_orders,d1_dedup_exact,d8_near_dup_tight,sim2_ivf_knn,sim6_ivfpq,t5_tfidf,st1_tumbling_window,w5_topk_per_key,rj1_range_join,aj1_asof_join"
run_chunk b "q21_sole_blame"
run_chunk c "d2_minhash_lsh"
run_chunk d "st5_stream_session_window,st6_stream_interval_join"

python3 tools/merge_bench.py "${PREFIX}_a.json" "${PREFIX}_b.json" "${PREFIX}_ab.json"
python3 tools/merge_bench.py "${PREFIX}_ab.json" "${PREFIX}_c.json" "${PREFIX}_abc.json"
python3 tools/merge_bench.py "${PREFIX}_abc.json" "${PREFIX}_d.json" "${PREFIX}_merged.json"
echo "merged -> ${PREFIX}_merged.json"
