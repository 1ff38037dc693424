#!/bin/bash
# Round-5e: final prioritized chip cells with an ABSOLUTE deadline
# (END_BY_TS, unix seconds) so the driver's end-of-round bench gets the
# chip back. Runs after r5b's leader exits (WAIT_PID).
# Priority order: 3D train roofline (VERDICT item 4) > pancreas 10k
# sweeps > skin/immune best10k sweeps > 3D seed-stat cells.
# Usage: WAIT_PID=<pid> END_BY_TS=<unix> setsid bash scripts/tpu_queue_r5e.sh > /tmp/tpu_queue_r5e.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data
END_BY_TS=${END_BY_TS:-$(( $(date +%s) + 7200 ))}

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
  [ "$(date +%s)" -ge "$END_BY_TS" ] && { log "absolute deadline reached"; return 0; }
  return 1
}
if [ -n "${WAIT_PID:-}" ]; then
  log "waiting for PID $WAIT_PID to exit (deadline $END_BY_TS)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do
    [ "$(date +%s)" -ge "$END_BY_TS" ] && { log "deadline while waiting"; exit 0; }
    sleep 20
  done
fi

should_stop && exit 0
run python -u scripts/diag_step_3d.py 2>&1 | tee /tmp/diag_step_3d.out
commit_paths "r5e: 3D roofline raw numbers" /tmp/.nonexistent  # log only

sweep() {
  local wd="$1" tissue="$2"; shift 2
  should_stop && return
  run python -u scripts/sweep_detect_tissuenet.py \
      --workdir "$RD/$wd" --tissue "$tissue" --scale 3 "$@"
  commit_paths "r5e detect sweep: $wd $*" \
      "$RD/$wd"/detect_sweep*.json "$RD/$wd"/results_*.json
}
sweep tissuenet_pancreas_s3h pancreas
sweep tissuenet_pancreas_s3h pancreas --checkpoint models/001003.ckpt

# scale-factor cells at the paper's PEAK regions (lung peaks at paper
# scale 0.8 = our k 1.6; immune spans 1.0-1.1 = our k 2): lung k1.5 and
# immune k1 complete 3-point trends for both tissues
scale_cell() {
  local tissue="$1" k="$2"; shift 2
  local wd="$RD/tissuenet_${tissue}_k${k/./p}"
  should_stop && return
  [ -f "$wd/results.json" ] && { log "SKIP scale $tissue k=$k"; return; }
  run python -u scripts/run_real_tissuenet.py --tissue "$tissue"       --scale "$k" --iters 5000 --fast --resume --workdir "$wd" "$@"
  commit_paths "r5e scale sweep: $tissue k=$k" "$wd/results.json"
}
scale_cell lung 1.5
scale_cell immune 1 --threshold-quantile 90
sweep tissuenet_skin_s3n skin --tag best10k
sweep tissuenet_immune_s3c immune --tag best10k
scale_cell lung 1
scale_cell immune 1.5 --threshold-quantile 90

DIAG=examples/precision_ab/diagnostics.jsonl
diag_done() { [ -f "$DIAG" ] && grep -q "\"tag\": \"$1\"" "$DIAG"; }
run_tagged() {
  local tag="$1"; shift
  if diag_done "$tag"; then log "SKIP $tag"; return; fi
  should_stop && return
  run python -u scripts/validate_quality.py "$@" --results-json "$DIAG" \
      || { log "FAILED $tag"; return; }
  python3 - "$tag" <<'EOF'
import json, sys
path = "examples/precision_ab/diagnostics.jsonl"
rows = [json.loads(l) for l in open(path)]
rows[-1]["tag"] = sys.argv[1]
with open(path, "w") as fh:
    fh.writelines(json.dumps(r) + "\n" for r in rows)
EOF
  commit_paths "r5e 3D stability: $tag" "$DIAG"
}
C3D=(--ndim 3 --fast --pair-count-mode all_dims --density 0.025)
run_tagged r5_spd1_seed3_1500 "${C3D[@]}" --iters 1500 --seed 3 \
    --workdir .bench_work/r5/wd_spd1_s3
run_tagged r5_spd1_seed4_1500 "${C3D[@]}" --iters 1500 --seed 4 \
    --workdir .bench_work/r5/wd_spd1_s4
run_tagged r5_spd1_seed1_lr2e4_2500 "${C3D[@]}" --iters 2500 --seed 1 \
    --lr 2e-4 --workdir .bench_work/r5/wd_spd1_s1_lr2
log "queue r5e complete"
