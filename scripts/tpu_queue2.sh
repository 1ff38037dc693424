#!/bin/bash
# Follow-up to scripts/tpu_queue.sh: wait for the main TissueNet queue to
# finish, then re-train skin with per-panel contrast normalization (every
# recovered skin panel is dim: membrane p99.5 = 0.19-0.43 vs ~0.97 for the
# other tissues — the display-dimming case --normalize-per-panel exists
# for), sweep its detect variants, and refresh the study report.
#
# Usage: setsid bash scripts/tpu_queue2.sh > /tmp/tpu_queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data

log() { echo "[$(date +%H:%M:%S)] $*"; }

main_queue_active() {
  for c in /proc/[0-9]*/cmdline; do
    # NUL-separated cmdline; match the main queue script only (this
    # script's own name does not contain "tpu_queue.sh")
    if tr '\0' ' ' < "$c" 2>/dev/null | grep -q "tpu_queue\.sh"; then
      return 0
    fi
  done
  return 1
}

log "waiting for the main TissueNet queue to finish"
while main_queue_active; do sleep 60; done
log "main queue done"

run() { log "RUN $*"; "$@"; log "DONE (exit $?) $*"; }

run python -u scripts/run_real_tissuenet.py --tissue skin --scale 3 \
    --iters 5000 --fast --threshold-quantile 90 --normalize-per-panel \
    --workdir "$RD/tissuenet_skin_s3n"

# the sweep re-clusters the SAVED embeddings (normalization is already
# baked in at predict time), so it takes no --normalize-per-panel flag
run python -u scripts/sweep_detect_tissuenet.py \
    --workdir "$RD/tissuenet_skin_s3n" --tissue skin --scale 3 --cpu \
    --variants "baseline,thr-q90,greedy,greedy+thr-q90,greedy+thr-q95"

log "follow-up complete; report:"
python scripts/tissuenet_report.py
