#!/bin/bash
# Round-4d follow-on queue — runs after r4c drains (pass the r4c PID as
# WAIT_PID to serialize on the single chip). Idempotent + reboot-survivable.
#
# Steps, in value order:
#   A  pooled detect-knob sweep (Q4's last cell). The r4 attempt died on
#      missing out.zarr (reboot-wiped scratch); sweep_detect_tissuenet.py
#      now self-heals by regenerating canonical embeddings from
#      best_loss.ckpt + the run's stamped flags.
#   B  3D precision A/B at density 0.025 — the sweep-validated stable
#      operating point (F1 0.9565 at BOTH 1500 and 2500 iters, vs 0.61 at
#      the 0.05 point where the r4c A/B cells ran and scored 0.39/0.17).
#      A bf16-vs-f32 quality comparison is only meaningful where the
#      training itself is stable; this closes VERDICT item 2's 3D half.
#   C  variance probe: a second same-config run of the 0.05 bf16 cell.
#      Distinguishes "bf16 hurts 3D" from "0.05 sits near the collapse
#      boundary and run-to-run variance dominates".
#
# Controls: touch .queue_stop to stop between steps; QUEUE_MAX_HOURS
# (default 4.0) stops launching new steps past the deadline.
#
# Usage: WAIT_PID=<r4c pid> setsid bash scripts/tpu_queue_r4d.sh \
#            > /tmp/tpu_queue_r4d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data
PAB=examples/precision_ab
START_TS=$(date +%s)
MAX_S=$(python3 -c "import os; print(int(float(os.environ.get('QUEUE_MAX_HOURS','4.0'))*3600))")

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

for wd in "$RD"/tissuenet_*; do
  [ -d "$wd/ckpt" ] && python scripts/ckpt_tools.py restore "$wd"
done

# ---- A: pooled detect-knob sweep (self-healing embeddings) ----------------
WD=$RD/tissuenet_all_s3n
should_stop || {
  if [ -f "$WD/detect_sweep.json" ]; then
    log "SKIP pooled detect sweep (recorded)"
  else
    run python -u scripts/sweep_detect_tissuenet.py \
        --workdir "$WD" --tissue all --scale 3 \
        --variants baseline,thr-q90,greedy,greedy+thr-q90,greedy+thr-q95
    commit_paths "r4 pooled model: detect-knob sweep" "$WD/detect_sweep.json"
  fi
}

# ---- B: 3D precision A/B at the stable density 0.025 ----------------------
pab3d025_done() {  # $1=precision
  [ -f "$PAB/results.jsonl" ] || return 1
  python3 - "$1" <<'EOF'
import json, sys
prec = sys.argv[1]
for line in open("examples/precision_ab/results.jsonl"):
    r = json.loads(line)
    if (r["ndim"] == 3 and r["precision"] == prec
            and r.get("pair_count_mode") == "all_dims"
            and r.get("density") == 0.025):
        sys.exit(0)
sys.exit(1)
EOF
}
for prec in bfloat16 float32; do
  should_stop && break
  if pab3d025_done "$prec"; then
    log "SKIP 3D density-0.025 A/B $prec (recorded)"
    continue
  fi
  run python -u scripts/validate_quality.py --ndim 3 --iters 2500 \
      --precision "$prec" --fast --pair-count-mode all_dims --density 0.025 \
      --workdir ".bench_work/precision_ab/wd_3d_${prec}_d025" \
      --results-json "$PAB/results.jsonl"
  commit_paths "precision A/B: 3D $prec at the stable density 0.025" \
      "$PAB/results.jsonl"
done

# ---- B2: finish the pooled early-stop curve (r4c step B may hit its
# deadline mid-scoring; this loop is the same idempotent protocol) ----------
WD=$RD/tissuenet_all_s3e
[ -d "$WD/ckpt" ] && python scripts/ckpt_tools.py restore "$WD"
if [ -d "$WD/models" ]; then
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
    should_stop && break
    run python -u scripts/run_real_tissuenet.py --skip-train \
        --checkpoint "models/${stem}.ckpt" --results-tag "$tag" \
        --num-bandwidths 1 --workdir "$WD" --tissue all --scale 3 \
        --normalize-per-panel --threshold-quantile 90
  done
  commit_paths "r4c pooled early-stop study: checkpoint-vs-F1 curve scores" \
      "$WD"/results_ckpt*.json
fi

# ---- C: variance probe at density 0.05 (second bf16 run) -------------------
n_05_bf16() {
  [ -f "$PAB/results.jsonl" ] || { echo 0; return; }
  python3 - <<'EOF'
import json
n = 0
for line in open("examples/precision_ab/results.jsonl"):
    r = json.loads(line)
    if (r["ndim"] == 3 and r["precision"] == "bfloat16"
            and r.get("pair_count_mode") == "all_dims"
            and r.get("density") == 0.05):
        n += 1
print(n)
EOF
}
should_stop || {
  if [ "$(n_05_bf16)" -ge 2 ]; then
    log "SKIP 0.05 bf16 variance probe (two runs recorded)"
  else
    run python -u scripts/validate_quality.py --ndim 3 --iters 2500 \
        --precision bfloat16 --fast --pair-count-mode all_dims --density 0.05 \
        --workdir ".bench_work/precision_ab/wd_3d_bfloat16_alldims_run2" \
        --results-json "$PAB/results.jsonl"
    commit_paths "precision A/B: 3D bf16 density-0.05 variance probe (run 2)" \
        "$PAB/results.jsonl"
  fi
}

log "queue r4d complete"
