#!/bin/bash
# Round-5d queue — runs after r5b: 3D train roofline (VERDICT item 4)
# first (short, informs NOTES), then the r5c sweep cells (reboot-safe
# checkpoint fallback landed in run_real_tissuenet.py).
# Usage: WAIT_PID=<r5b pid> setsid bash scripts/tpu_queue_r5d.sh > /tmp/tpu_queue_r5d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
MAX_S=$(python3 -c "import os; print(int(float(os.environ.get('QUEUE_MAX_HOURS','3'))*3600))")
RD=examples/real-data
log() { echo "[$(date +%H:%M:%S)] $*"; }
run() { log "RUN $*"; "$@"; log "DONE (exit $?) $*"; }
commit_paths() {
  local msg="$1"; shift
  local existing=()
  for p in "$@"; do [ -e "$p" ] && existing+=("$p"); done
  [ ${#existing[@]} -eq 0 ] && { log "commit skipped: $msg"; return; }
  git add -- "${existing[@]}"
  if ! git diff --cached --quiet -- "${existing[@]}"; then
    git commit -q -m "$msg" -- "${existing[@]}" && log "COMMITTED: $msg"
  else
    log "commit skipped (no changes): $msg"
  fi
}
should_stop() {
  [ -f .queue_stop ] && { log "STOP sentinel"; return 0; }
  [ $(( $(date +%s) - START_TS )) -ge "$MAX_S" ] && { log "deadline"; return 0; }
  return 1
}
if [ -n "${WAIT_PID:-}" ]; then
  log "waiting for PID $WAIT_PID to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
START_TS=$(date +%s)

# ---- 3D train-step roofline (results land in the log; NOTES gets the
# writeup next session) ----
run python -u scripts/diag_step_3d.py 2>&1 | tee /tmp/diag_step_3d.out

sweep() {
  local wd="$1" tissue="$2"; shift 2
  should_stop && return
  run python -u scripts/sweep_detect_tissuenet.py \
      --workdir "$RD/$wd" --tissue "$tissue" --scale 3 "$@"
  commit_paths "r5d detect sweep: $wd $*" \
      "$RD/$wd"/detect_sweep*.json "$RD/$wd"/results_*.json
}
sweep tissuenet_pancreas_s3h pancreas
sweep tissuenet_pancreas_s3h pancreas --checkpoint models/001003.ckpt
sweep tissuenet_skin_s3n skin --tag best10k
sweep tissuenet_immune_s3c immune --tag best10k
log "queue r5d complete"
