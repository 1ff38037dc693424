#!/bin/bash
# Round-4c follow-on queue — idempotent + reboot-survivable like r4/r4b.
#
# Steps:
#   A  relaunch the idempotent r4 master queue: every completed step
#      skips on its committed done-condition; what actually runs is the
#      remainder the reboot killed — the pooled model's final-checkpoint
#      score, the pooled detect-knob sweep, and the Q5 3D lr x density
#      collapse-grid cells (VERDICT item 5's second half).
#   B  pooled early-stop curve: the pooled 10k retrain scored 0.300 at
#      best_loss selection (round-2's pooled best was 0.427) while the
#      round-4 per-tissue curves show F1 peaking at 1-2k iterations and
#      declining after. Retrain pooled to 4k with 500-cadence
#      checkpoints, score EVERY checkpoint with the fixed single-bw +
#      q90 protocol, and persist all stripped checkpoints — this answers
#      whether measured selection rescues the pooled recipe.
#
# Usage: setsid bash scripts/tpu_queue_r4c.sh > /tmp/tpu_queue_r4c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data

log() { echo "[$(date +%H:%M:%S)] $*"; }
run() { log "RUN $*"; "$@"; log "DONE (exit $?) $*"; }

commit_paths() {
  local msg="$1"; shift
  local existing=()
  for p in "$@"; do [ -e "$p" ] && existing+=("$p"); done
  [ ${#existing[@]} -eq 0 ] && { log "commit skipped (nothing exists): $msg"; return; }
  git add -- "${existing[@]}"
  if ! git diff --cached --quiet -- "${existing[@]}"; then
    git commit -q -m "$msg" -- "${existing[@]}" && log "COMMITTED: $msg"
  else
    log "commit skipped (no changes): $msg"
  fi
}

should_stop() { [ -f .queue_stop ] && { log "STOP sentinel found; exiting"; return 0; }; return 1; }

# ---- A: r4 leftovers (idempotent re-launch) -------------------------------
should_stop && exit 0
log "launching r4 master queue (completed steps self-skip)"
QUEUE_MAX_HOURS=${QUEUE_MAX_HOURS:-4} bash scripts/tpu_queue_r4.sh

# ---- B: pooled early-stop curve -------------------------------------------
WD=$RD/tissuenet_all_s3e
[ -d "$WD/ckpt" ] && python scripts/ckpt_tools.py restore "$WD"
should_stop && exit 0
need=1
if [ -f "$WD/results.json" ] && [ -f "$WD/models/best_loss.ckpt" ]; then
  python3 -c "import json,sys; sys.exit(0 if json.load(open('$WD/results.json')).get('iters')==4000 else 1)" && need=0
fi
if [ "$need" = 1 ]; then
  run python -u scripts/run_real_tissuenet.py --iters 4000 --resume --fast \
      --threshold-quantile 90 --save-every 500 \
      --workdir "$WD" --tissue all --scale 3 --normalize-per-panel
  python scripts/ckpt_tools.py persist "$WD"
  commit_paths "r4c pooled early-stop study: 4k retrain + stripped checkpoints" \
      "$WD/results.json" "$WD/ckpt" "$WD"/*_overlay.png
fi

prev=-1000
for ck in "$WD"/models/[0-9]*.ckpt; do
  [ -e "$ck" ] || continue
  stem=$(basename "$ck" .ckpt)
  it=$((10#$stem))
  [ "$it" -lt 400 ] && continue
  [ $((it - prev)) -lt 100 ] && continue
  prev=$it
  tag="ckpt${stem}"
  [ -f "$WD/results_${tag}.json" ] && { log "SKIP $tag (scored)"; continue; }
  should_stop && exit 0
  run python -u scripts/run_real_tissuenet.py --skip-train \
      --checkpoint "models/${stem}.ckpt" --results-tag "$tag" \
      --num-bandwidths 1 --workdir "$WD" --tissue all --scale 3 \
      --normalize-per-panel --threshold-quantile 90
done
commit_paths "r4c pooled early-stop study: checkpoint-vs-F1 curve scores" \
    "$WD"/results_ckpt*.json

log "queue r4c complete"
