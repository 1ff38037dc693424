#!/bin/bash
# Round-5a queue — close the 3D fast-path discrepancy (VERDICT r4 item 1).
#
# Evidence so far: scripts/probe_spd_tpu.py (3D bf16, 200 iters, on-chip)
# shows spd=1 vs spd=4 per-iteration losses agree to bf16 noise
# (max rel 1.03%, median 0.07%) but DIVERGE measurably from iter 37 —
# the K-step scan is not mathematically wrong, yet in bf16 the two
# dispatch shapes are chaotic-trajectory-distinct over 2500 iters.
# So the open question splits:
#   (a) does spd=4 systematically degrade outcomes at the stable point
#       (0.025, lr 4e-4), or
#   (b) is that point itself high-variance and the sweep's 0.9565 x2
#       (same seed, shared 1500-iter prefix) a lucky draw?
# Cells (all: validate_quality 3D all_dims d=0.025 lr=4e-4 bf16 --fast):
#   D    spd=1 seed=0 2500 iters — seed-matched replica of the sweep's
#        1408s cell (F1 0.9565). Reproduces => protocol equivalence holds
#        and spd=4 is the outcome lever. Poor => neither knob explains it.
#   V*   spd in {1,4} x seed in {1,2} at 1500 iters — variance
#        distributions per dispatch shape.
#   P    f32 spd=1 seed=0 2500 iters — the clean 3D precision A/B row
#        (VERDICT item 2) against D.
#
# Usage: setsid bash scripts/tpu_queue_r5a.sh > /tmp/tpu_queue_r5a.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PAB=examples/precision_ab
DIAG=$PAB/diagnostics.jsonl
MAX_S=$(python3 -c "import os; print(int(float(os.environ.get('QUEUE_MAX_HOURS','4'))*3600))")

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

diag_done() { [ -f "$DIAG" ] && grep -q "\"tag\": \"$1\"" "$DIAG"; }

run_tagged() {  # $1=tag, rest = validate_quality args
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
  commit_paths "r5a 3D spd discrimination: $tag" "$DIAG"
}

if [ -n "${WAIT_PID:-}" ]; then
  log "waiting for PID $WAIT_PID (previous queue) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  log "PID $WAIT_PID gone; starting"
fi
START_TS=$(date +%s)

C3D=(--ndim 3 --fast --pair-count-mode all_dims --density 0.025)

# ---- D: the decisive seed-matched spd=1 replica -----------------------------
run_tagged r5_spd1_seed0_2500 "${C3D[@]}" --iters 2500 \
    --precision bfloat16 --steps-per-dispatch 1 \
    --workdir .bench_work/r5/wd_spd1_s0

# ---- V: variance cells, 1500 iters, spd x seed ------------------------------
for seed in 1 2; do
  run_tagged "r5_spd4_seed${seed}_1500" "${C3D[@]}" --iters 1500 \
      --precision bfloat16 --seed "$seed" \
      --workdir ".bench_work/r5/wd_spd4_s${seed}"
  run_tagged "r5_spd1_seed${seed}_1500" "${C3D[@]}" --iters 1500 \
      --precision bfloat16 --steps-per-dispatch 1 --seed "$seed" \
      --workdir ".bench_work/r5/wd_spd1_s${seed}"
done

# ---- P: clean 3D precision A/B against D ------------------------------------
run_tagged r5_f32_spd1_seed0_2500 "${C3D[@]}" --iters 2500 \
    --precision float32 --steps-per-dispatch 1 \
    --workdir .bench_work/r5/wd_f32_spd1_s0

log "queue r5a complete"
