#!/bin/bash
# Third TissueNet queue: the 10k-iteration paper-style schedule (lr/10 at
# 6k/8k) lifted immune 0.566 -> 0.609 (validation.md finding 5); extend it
# to the other tissues by RESUMING their 5k checkpoints, and try immune at
# the paper's 64-fmap width. Run after tpu_queue2.sh finishes.
#
# Usage: setsid bash scripts/tpu_queue3.sh > /tmp/tpu_queue3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data

log() { echo "[$(date +%H:%M:%S)] $*"; }

queues_active() {
  for c in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$c" 2>/dev/null \
        | grep -qE "tpu_queue\.sh|tpu_queue2\.sh"; then
      return 0
    fi
  done
  return 1
}

log "waiting for earlier queues to finish"
while queues_active; do sleep 60; done
log "earlier queues done"

run() { log "RUN $*"; "$@"; log "DONE (exit $?) $*"; }

# resume each 5k run to 10k with the milestone schedule (resuming changes
# the optimizer structure — unpack_opt_state warns and resets schedule
# state, which is exactly the intent here)
run python -u scripts/run_real_tissuenet.py --tissue lung --scale 3 \
    --iters 10000 --resume --fast --threshold-quantile 90 \
    --lr-milestones 6000 8000 --workdir "$RD/tissuenet_lung_s3"
run python -u scripts/run_real_tissuenet.py --tissue pancreas --scale 3 \
    --iters 10000 --resume --fast --threshold-quantile 90 \
    --lr-milestones 6000 8000 --workdir "$RD/tissuenet_pancreas_s3"
run python -u scripts/run_real_tissuenet.py --tissue skin --scale 3 \
    --iters 10000 --resume --fast --threshold-quantile 90 \
    --normalize-per-panel --lr-milestones 6000 8000 \
    --workdir "$RD/tissuenet_skin_s3n"

# immune at the paper's width (Appendix A: num_fmaps 64) on the winning
# 10k/milestone schedule — fresh workdir, fresh model
run python -u scripts/run_real_tissuenet.py --tissue immune --scale 3 \
    --iters 10000 --fast --threshold-quantile 90 \
    --lr-milestones 6000 8000 --num-fmaps 64 \
    --workdir "$RD/tissuenet_immune_s3c"

VARIANTS="baseline,thr-q90,greedy,greedy+thr-q90,greedy+thr-q95"
for w in lung_s3 pancreas_s3 skin_s3n immune_s3c; do
  t="${w%%_*}"
  # provenance: the workdir's embeddings now come from the 10k model —
  # archive the 5k-model sweep instead of mixing entries (NOTES.md
  # stale-comparison lesson)
  if [ -f "$RD/tissuenet_${w}/detect_sweep.json" ]; then
    mv "$RD/tissuenet_${w}/detect_sweep.json" \
       "$RD/tissuenet_${w}/detect_sweep_5k.json"
  fi
  run python -u scripts/sweep_detect_tissuenet.py \
      --workdir "$RD/tissuenet_${w}" --tissue "$t" --scale 3 --cpu \
      --variants "$VARIANTS"
done

log "queue3 complete; report:"
python scripts/tissuenet_report.py
