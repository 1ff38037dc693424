#!/bin/bash
# CPU-fallback TissueNet queue: trains the remaining tissues on the host
# CPU while the TPU is wedged (~1.8 h per tissue at 2500 iters on the
# 1-core host), then runs the greedy/quantile sweeps. Stands down the
# moment scripts/tpu_queue.sh signals device health (/tmp/tpu_queue_active)
# — the TPU queue resumes each tissue from the CPU checkpoints via
# --resume, so no work is lost either way.
#
# Usage: setsid bash scripts/cpu_queue.sh > /tmp/cpu_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data

log() { echo "[$(date +%H:%M:%S)] $*"; }
tpu_took_over() { [ -f /tmp/tpu_queue_active ]; }

run() {
  if tpu_took_over; then log "TPU queue active: standing down"; exit 0; fi
  log "RUN $*"; "$@"; log "DONE (exit $?) $*"
}

run nice -n 19 python -u scripts/run_real_tissuenet.py --tissue lung \
    --scale 3 --iters 2500 --cpu --resume --threshold-quantile 90 \
    --workdir "$RD/tissuenet_lung_s3"
run nice -n 19 python -u scripts/run_real_tissuenet.py --tissue pancreas \
    --scale 3 --iters 2500 --cpu --resume --threshold-quantile 90 \
    --workdir "$RD/tissuenet_pancreas_s3"

VARIANTS="baseline,thr-q90,thr-q95,greedy,greedy+thr-q90,greedy+thr-q95"
run nice -n 19 python -u scripts/sweep_detect_tissuenet.py \
    --workdir "$RD/tissuenet_skin_s3" --tissue skin --scale 3 --cpu \
    --variants "$VARIANTS"
run nice -n 19 python -u scripts/sweep_detect_tissuenet.py \
    --workdir "$RD/tissuenet_lung_s3" --tissue lung --scale 3 --cpu \
    --variants "$VARIANTS"
run nice -n 19 python -u scripts/sweep_detect_tissuenet.py \
    --workdir "$RD/tissuenet_pancreas_s3" --tissue pancreas --scale 3 --cpu \
    --variants "$VARIANTS"

log "cpu queue complete; report:"
python scripts/tissuenet_report.py
