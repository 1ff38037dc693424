#!/bin/bash
# Round-5b queue — VERDICT r4 item 5 (tissue levers) + item 2 follow-ups.
#
# A. Detect-recipe sweeps on the round-4 10k retrains that never got one
#    (pancreas_s3h lr 2e-4, skin_s3n, immune_s3c 64-fmap) at best_loss AND
#    at each run's measured-best checkpoint (the selection-study curves:
#    pancreas 1k, skin 1k, immune 6k) — measured selection × detect recipe
#    composition, inference-only.
# B. Pooled 10k + lr milestones retrain (+normalize), then its sweep.
# C. Paper Table-2 scale-factor sweep (BASELINE.md:28): immune & lung at
#    k ∈ {1, 1.5, 2.5} (2 and/or 3 already committed); recovered panels
#    are ~0.5x TissueNet native, so k = 2 x paper scale.
# D. 3D stability stats: spd1 seeds 3,4 (success-rate estimate) + the
#    lr-halving rescue of the diverged seed 1.
#
# Usage: setsid bash scripts/tpu_queue_r5b.sh > /tmp/tpu_queue_r5b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
MAX_S=$(python3 -c "import os; print(int(float(os.environ.get('QUEUE_MAX_HOURS','6'))*3600))")
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

should_stop() {
  [ -f .queue_stop ] && { log "STOP sentinel found; exiting"; return 0; }
  if [ $(( $(date +%s) - START_TS )) -ge "$MAX_S" ]; then
    log "deadline (QUEUE_MAX_HOURS) reached; stopping"
    return 0
  fi
  return 1
}

if [ -n "${WAIT_PID:-}" ]; then
  log "waiting for PID $WAIT_PID to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
START_TS=$(date +%s)

sweep() {  # $1=workdir $2=tissue $3=extra-args... ; sweeps + commits
  local wd="$1" tissue="$2"; shift 2
  should_stop && return
  run python -u scripts/sweep_detect_tissuenet.py \
      --workdir "$RD/$wd" --tissue "$tissue" --scale 3 "$@"
  commit_paths "r5b detect sweep: $wd $*" \
      "$RD/$wd"/detect_sweep*.json "$RD/$wd"/results_*.json
}

# ---- A: sweeps on existing 10k retrains -------------------------------------
sweep tissuenet_pancreas_s3h pancreas
sweep tissuenet_pancreas_s3h pancreas --checkpoint models/001003.ckpt
sweep tissuenet_skin_s3n skin --tag best10k
sweep tissuenet_skin_s3n skin --checkpoint models/001003.ckpt
sweep tissuenet_immune_s3c immune --tag best10k
sweep tissuenet_immune_s3c immune --checkpoint models/006003.ckpt

# ---- B: pooled 10k + milestones + normalize ---------------------------------
if ! should_stop && [ ! -f "$RD/tissuenet_all_r5/results.json" ]; then
  run python -u scripts/run_real_tissuenet.py --tissue all --scale 3 \
      --iters 10000 --lr-milestones 6000 8000 --normalize-per-panel \
      --threshold-quantile 90 --fast --save-every 1000 --resume \
      --workdir "$RD/tissuenet_all_r5"
  commit_paths "r5b pooled 10k+milestones retrain" \
      "$RD/tissuenet_all_r5/results.json" "$RD/tissuenet_all_r5/loss.png"
fi
sweep tissuenet_all_r5 all
sweep tissuenet_all_r5 all --checkpoint models/002003.ckpt

# ---- C: scale-factor sweep (paper Table 2) ----------------------------------
scale_cell() {  # $1=tissue $2=scale $3+... extra flags
  local tissue="$1" k="$2"; shift 2
  local wd="$RD/tissuenet_${tissue}_k${k/./p}"
  should_stop && return
  [ -f "$wd/results.json" ] && { log "SKIP scale $tissue k=$k (results exist)"; return; }
  run python -u scripts/run_real_tissuenet.py --tissue "$tissue" \
      --scale "$k" --iters 5000 --fast --resume --workdir "$wd" "$@"
  commit_paths "r5b scale sweep: $tissue k=$k" "$wd/results.json" "$wd/loss.png"
}
for k in 1 1.5 2.5; do
  scale_cell immune "$k" --threshold-quantile 90
done
for k in 1 1.5 2 2.5; do
  scale_cell lung "$k"
done

# ---- D: 3D stability stats --------------------------------------------------
DIAG=examples/precision_ab/diagnostics.jsonl
diag_done() { [ -f "$DIAG" ] && grep -q "\"tag\": \"$1\"" "$DIAG"; }
run_tagged() {
  local tag="$1"; shift
  if diag_done "$tag"; then log "SKIP $tag (recorded)"; return; fi
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
  commit_paths "r5b 3D stability: $tag" "$DIAG"
}
C3D=(--ndim 3 --fast --pair-count-mode all_dims --density 0.025)
run_tagged r5_spd1_seed3_1500 "${C3D[@]}" --iters 1500 --seed 3 \
    --workdir .bench_work/r5/wd_spd1_s3
run_tagged r5_spd1_seed4_1500 "${C3D[@]}" --iters 1500 --seed 4 \
    --workdir .bench_work/r5/wd_spd1_s4
run_tagged r5_spd1_seed1_lr2e4_2500 "${C3D[@]}" --iters 2500 --seed 1 \
    --lr 2e-4 --workdir .bench_work/r5/wd_spd1_s1_lr2

log "queue r5b complete"
