#!/bin/bash
# Kernel-config sweep: full train step at [subdiv] faces, batch [batch].
# Run AFTER any TPU-holding process exits (exclusive chip).
# Usage: bash examples/sweep_large.sh [subdiv] [batch]
set -u
cd "$(dirname "$0")/.."
SUB=${1:-7}
BATCH=${2:-1}
export PYTHONPATH=/root/repo:/root/.axon_site
# order by predicted win (host-side window-area model: bs128 total window
# area 1121M vs 1740M for the default band/bs256 mix at subdiv 7)
for cfg in "bs128:GBN_BS_TILE=128:GBN_FORCE_BS=1" "default::" \
           "bs256:GBN_BS_TILE=256:GBN_FORCE_BS=1" \
           "bs512:GBN_BS_TILE=512:GBN_FORCE_BS=1"; do
  name=${cfg%%:*}; rest=${cfg#*:}
  e1=${rest%%:*}; e2=${rest#*:}
  echo "=== $name ==="
  # -u: the 'default' row must not inherit sweep knobs from the calling
  # shell (ADVICE r2); --worker: measure directly, no orchestrator/fallback
  env -u GBN_BS_TILE -u GBN_FORCE_BS $e1 $e2 \
    BENCH_SUBDIV=$SUB BENCH_BATCH=$BATCH BENCH_STEPS=3 \
    timeout 900 python bench.py --worker 2>&1 | grep -v WARNING | tail -2
done
