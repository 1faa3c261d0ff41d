#!/bin/bash
# 327k-face single-chip ablation table (VERDICT r4 next #1 "done" bar).
# Each row: full train step, bench.py --worker, BENCH_SUBDIV=7 B=1.
# Run with the TPU otherwise idle; rows with non-default build knobs
# rebuild the host cache (minutes) and compile cold.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name ==="
  env "$@" BENCH_SUBDIV=7 BENCH_BATCH=1 BENCH_STEPS=3 \
    timeout 1800 python bench.py --worker 2>&1 | grep -v WARNING | tail -1
}
run default
run no-jband      GBN_NO_JBAND=1      # compact-table boundary correction
run no-hybrid     GBN_NO_HYBRID=1     # block-sparse fallback for wide levels
run mbt768        GBN_MAX_BAND_TILE=768  # r4 default: wide contiguous bands
run f32-heads     GBN_FC_BF16=0       # f32 fc heads
run no-tf         GBN_NO_TF=1         # aggregate-first kernel schedule
