#!/bin/bash
# Round-4e follow-on queue — runs after r4d drains (pass the r4d bash PID
# as WAIT_PID to serialize on the single chip). Idempotent + reboot-
# survivable: every step self-skips when its artifact already exists.
#
# Steps, in value order:
#   A  lr x density invariant CONFIRMATION cell: density 0.05 at lr 2e-4
#      (product 1e-5). The round-4 grid separates all measured cells at
#      lr*density = 2e-5; this cell tests the rule's *predictive* power
#      at a density whose 1500-iter fast-path history is noisy (0.17-0.61
#      at lr 4e-4, product 2e-5). Prediction: F1 >= 0.91.
#   B  detect-knob sweep on the pancreas lr-2e-4 10k model (s3h) — the
#      stable retrain never got best-variant scoring; round-3's pancreas
#      headline (0.498, greedy, 5k run) is the number to beat.
#   C  detect-knob sweep on the immune flat-lr 10k model (s3c) — tests
#      whether the lr/10-milestone schedule (s3b, 0.609) mattered or just
#      the longer budget.
#   D  re-sweep lung_s3 + skin_s3n on their round-4 10k retrains, with the
#      round-3 5k sweep files preserved as detect_sweep_5k.json. The
#      early-stop study predicts flat-to-declining quality past 1-2k, so
#      the 10k best-variant numbers should NOT beat the 5k ones — a
#      falsifiable check at the headline-recipe level.
#   E  3D f32 variance probe at density 0.05 (second run) — the f32
#      counterpart of r4d step C, completing a 2x2 run matrix at the
#      boundary point.
#
# Controls: touch .queue_stop to stop between steps; QUEUE_MAX_HOURS
# (default 3.5) stops launching new steps past the deadline.
#
# Usage: WAIT_PID=<r4d bash pid> setsid bash scripts/tpu_queue_r4e.sh \
#            > /tmp/tpu_queue_r4e.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data
PAB=examples/precision_ab
MAX_S=$(python3 -c "import os; print(int(float(os.environ.get('QUEUE_MAX_HOURS','3.5'))*3600))")

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

# serialize on the single chip: wait for the previous queue to exit
if [ -n "${WAIT_PID:-}" ]; then
  log "waiting for PID $WAIT_PID (previous queue) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  log "PID $WAIT_PID gone; starting"
fi
# deadline clock starts when the chip becomes ours, not at launch
START_TS=$(date +%s)

for wd in "$RD"/tissuenet_*; do
  [ -d "$wd/ckpt" ] && python scripts/ckpt_tools.py restore "$wd"
done

# ---- A: invariant confirmation cell (density 0.05, lr 2e-4) ----------------
grid_cell_done() {  # $1=density $2=lr
  [ -f scripts/sweep_3d_density.csv ] || return 1
  python3 - "$1" "$2" <<'EOF'
import sys
d, lr = float(sys.argv[1]), float(sys.argv[2])
for line in open("scripts/sweep_3d_density.csv"):
    f = line.strip().split(",")
    if len(f) >= 3 and abs(float(f[0]) - d) < 1e-9 and abs(float(f[1]) - lr) < 1e-12:
        sys.exit(0)
sys.exit(1)
EOF
}
should_stop || {
  if grid_cell_done 0.05 2e-4; then
    log "SKIP invariant confirmation cell (recorded)"
  else
    run python -u scripts/sweep_3d_density.py --iters 1500 \
        --densities 0.05 --lrs 2e-4
    commit_paths "r4e 3D grid: invariant-confirmation cell (density 0.05, lr 2e-4)" \
        scripts/sweep_3d_density.csv
  fi
}

# ---- B/C/D: detect-knob sweeps on the round-4 10k models -------------------
sweep_wd() {  # $1=workdir $2=tissue $3=extra commit-msg tag
  local wd="$RD/$1" tissue="$2" tag="$3"
  [ -d "$wd" ] || { log "SKIP $1 (no workdir)"; return; }
  [ -d "$wd/ckpt" ] && python scripts/ckpt_tools.py restore "$wd"
  if [ -f "$wd/detect_sweep.json" ]; then
    log "SKIP $1 sweep (recorded)"
    return
  fi
  should_stop && return
  run python -u scripts/sweep_detect_tissuenet.py \
      --workdir "$wd" --tissue "$tissue" --scale 3 \
      --variants baseline,thr-q90,thr-q95,greedy,greedy+thr-q95
  commit_paths "r4e $tag: detect-knob sweep" "$wd/detect_sweep.json"
}

sweep_wd tissuenet_pancreas_s3h pancreas "pancreas lr-2e-4 10k model"
sweep_wd tissuenet_immune_s3c immune "immune flat-lr 10k model"

# D: preserve the committed round-3 5k sweeps before re-sweeping the 10k
# retrains (same-session-embeddings provenance rule: never mix model
# generations in one detect_sweep.json).
for pair in "tissuenet_lung_s3:lung" "tissuenet_skin_s3n:skin"; do
  wd="$RD/${pair%%:*}"; tissue="${pair##*:}"
  if [ -f "$wd/detect_sweep.json" ] && [ ! -f "$wd/detect_sweep_5k.json" ]; then
    mv "$wd/detect_sweep.json" "$wd/detect_sweep_5k.json"
    git add -- "$wd/detect_sweep_5k.json" "$wd/detect_sweep.json"
    git commit -q -m "r4e: preserve ${pair%%:*} round-3 5k sweep as detect_sweep_5k.json" \
        -- "$wd/detect_sweep_5k.json" "$wd/detect_sweep.json" \
      && log "COMMITTED: preserved ${pair%%:*} 5k sweep"
  fi
done
sweep_wd tissuenet_lung_s3 lung "lung 10k retrain (5k sweep preserved)"
sweep_wd tissuenet_skin_s3n skin "skin 10k retrain (5k sweep preserved)"

# ---- E: 3D f32 variance probe at density 0.05 (second run) -----------------
n_05() {  # $1=precision
  [ -f "$PAB/results.jsonl" ] || { echo 0; return; }
  python3 - "$1" <<'EOF'
import json, sys
prec = sys.argv[1]
n = 0
for line in open("examples/precision_ab/results.jsonl"):
    r = json.loads(line)
    if (r["ndim"] == 3 and r["precision"] == prec
            and r.get("pair_count_mode") == "all_dims"
            and r.get("density") == 0.05):
        n += 1
print(n)
EOF
}
should_stop || {
  if [ "$(n_05 float32)" -ge 2 ]; then
    log "SKIP 0.05 f32 variance probe (two runs recorded)"
  else
    run python -u scripts/validate_quality.py --ndim 3 --iters 2500 \
        --precision float32 --fast --pair-count-mode all_dims --density 0.05 \
        --workdir ".bench_work/precision_ab/wd_3d_float32_alldims_run2" \
        --results-json "$PAB/results.jsonl"
    commit_paths "precision A/B: 3D f32 density-0.05 variance probe (run 2)" \
        "$PAB/results.jsonl"
  fi
}

log "queue r4e complete"
