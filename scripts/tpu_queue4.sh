#!/bin/bash
# Fourth TissueNet queue: the pooled 4-tissue model with every lever the
# per-tissue studies found (per-panel contrast normalization, 10k
# iterations with lr/10 milestones at 6k/8k, quantile-90 threshold) at the
# paper's 3x-resolution regime. The round-2 pooled run (tissuenet_all,
# scale 2, 5k, raw panels) scored 0.427 best vs the paper's printed 0.598
# "all" mean; this measures how much of that gap was recipe.
# Run after tpu_queue3.sh finishes.
#
# Usage: setsid bash scripts/tpu_queue4.sh > /tmp/tpu_queue4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data

log() { echo "[$(date +%H:%M:%S)] $*"; }

queues_active() {
  for c in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$c" 2>/dev/null \
        | grep -qE "tpu_queue\.sh|tpu_queue2\.sh|tpu_queue3\.sh"; then
      return 0
    fi
  done
  return 1
}

log "waiting for earlier queues to finish"
while queues_active; do sleep 60; done
log "earlier queues done"

run() { log "RUN $*"; "$@"; log "DONE (exit $?) $*"; }

run python -u scripts/run_real_tissuenet.py --tissue all --scale 3 \
    --iters 10000 --fast --threshold-quantile 90 --normalize-per-panel \
    --lr-milestones 6000 8000 --workdir "$RD/tissuenet_all_s3n"

VARIANTS="baseline,thr-q90,greedy,greedy+thr-q90,greedy+thr-q95"
run python -u scripts/sweep_detect_tissuenet.py \
    --workdir "$RD/tissuenet_all_s3n" --tissue all --scale 3 \
    --variants "$VARIANTS"

run python -u scripts/tissuenet_report.py
log "queue4 complete"
