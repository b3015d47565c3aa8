#!/bin/bash
# Chunked sf100 bench recording (attempt 5). Each chunk runs in its OWN
# JVM so a mid-chunk failure leaves every earlier chunk's artifact on
# disk, and JVM exit frees that chunk's shuffle/checkpoint scratch before
# the next disk-heavy chunk starts. Chunks are merged into one
# shape-identical BENCH record by tools/merge_bench.py.
#
# Chunk layout is by DISK footprint, the resource that killed attempts
# 1-3: q21 (per-order census plan) and d2 (corpus-sized shingle/bucket
# staging — hash-staged since round 15) each get a dedicated JVM; the
# streaming pair runs last (RocksDB state, heavy but self-cleaning).
#
# Usage: tools/bench_sf100.sh [outPrefix] [chunks]   (run from /root/repo)
#   chunks: space-free list like "acd" — default all of "abcd". Reusing a
#   prior chunk's JSON is legitimate only when the code that chunk measures
#   is unchanged (merge_bench is the audit trail either way).
set -e
SF_DIR="${SPARK_GRAFT_SF_DIR:-/tmp/graft_sf100}"
PREFIX="${1:-/tmp/bench_sf100}"
CHUNKS="${2:-abcd}"
export SPARK_GRAFT_SF_DIR="$SF_DIR"
export SPARK_GRAFT_BENCH_REPS="${SPARK_GRAFT_BENCH_REPS:-2}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-64g}"
# Scratch-pressure mitigations (both exist FOR this recording — attempt 4
# ran without them and d2 ENOSPC'd on exactly the documented failure mode):
# 20s shuffle-reclaim lag instead of 1min, and no untimed tier-scale
# warm-up pass whose dead shuffle would dwell into rep 1's disk budget.
export SPARK_GRAFT_GC_INTERVAL="${SPARK_GRAFT_GC_INTERVAL:-20s}"
export SPARK_GRAFT_SKIP_TIER_WARMUP="${SPARK_GRAFT_SKIP_TIER_WARMUP:-1}"

# Concurrency guard: a second graft JVM on the box poisons BOTH timings
# (round 14: the sf0.1 round bench overlapped sf100 chunk d and every
# query read 1.2-1.8x slow with zero plan changes). flock fails fast
# instead of recording garbage.
exec 9>/tmp/graft_bench.lock
flock -n 9 || { echo "another graft bench holds /tmp/graft_bench.lock — refusing"; exit 1; }
if jps | grep -qE 'Bench|Verify|GenScale|Probe'; then
  echo "another graft JVM is running ($(jps | grep -E 'Bench|Verify|GenScale|Probe')) — refusing"
  exit 1
fi

run_chunk() { # name, query list
  local name="$1" queries="$2"
  # the scratch that fills is /tmp (shuffle local dirs, checkpoints, and
  # the tier itself), not necessarily / — probe the mount that matters
  echo "=== chunk $name: $queries (disk: $(df -h "${TMPDIR:-/tmp}" | awk 'NR==2{print $4}') free on ${TMPDIR:-/tmp})"
  # stale-artifact guard: Bench swallows bench_out.json write failures
  # (ENOSPC-safe by design), so a leftover file would silently republish
  # the PREVIOUS chunk under this chunk's name — remove it so a missing
  # write makes the cp below fail loudly under set -e
  rm -f bench_out.json
  SPARK_GRAFT_BENCH_ONLY="$queries" ./run_tool.sh graft.Bench \
    > "${PREFIX}_${name}.log" 2>&1
  cp bench_out.json "${PREFIX}_${name}.json"
  tail -1 "${PREFIX}_${name}.log"
}

case "$CHUNKS" in *a*) run_chunk a "q1_pricing_summary,q3_shipping_priority,q5_local_revenue,q6_forecast_revenue,q9_profit_by_nation,q10_returned_items,q18_large_orders,d1_dedup_exact,d8_near_dup_tight,sim2_ivf_knn,sim6_ivfpq,t5_tfidf,st1_tumbling_window,w5_topk_per_key,rj1_range_join,aj1_asof_join";; esac
case "$CHUNKS" in *b*) run_chunk b "q21_sole_blame";; esac
case "$CHUNKS" in *c*) run_chunk c "d2_minhash_lsh";; esac
case "$CHUNKS" in *d*) run_chunk d "st5_stream_session_window,st6_stream_interval_join";; esac

python3 tools/merge_bench.py "${PREFIX}_a.json" "${PREFIX}_b.json" "${PREFIX}_ab.json"
python3 tools/merge_bench.py "${PREFIX}_ab.json" "${PREFIX}_c.json" "${PREFIX}_abc.json"
python3 tools/merge_bench.py "${PREFIX}_abc.json" "${PREFIX}_d.json" "${PREFIX}_merged.json"
echo "merged -> ${PREFIX}_merged.json"
