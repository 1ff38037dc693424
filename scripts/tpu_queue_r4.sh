#!/bin/bash
# Round-4 master experiment queue — IDEMPOTENT and reboot-survivable.
#
# The sandbox is rebuilt from git on host reboot (two round-3 reboots
# destroyed every uncommitted artifact, killing Queues 4-6), so this queue
# (a) checks a committed done-condition before every step, (b) COMMITS each
# step's results (and stripped final checkpoints via scripts/ckpt_tools.py)
# the moment they exist, and (c) can be re-launched from any point: finished
# steps are skipped, an interrupted training resumes from its numbered
# checkpoints when they survived (same-boot restart) or retrains (reboot).
#
# Steps, in value order:
#   P  bf16-vs-f32 training A/B (VERDICT item 2): validate_quality 2D+3D at
#      both precisions -> examples/precision_ab/results.jsonl
#   T  tissue retrains with 1k-cadence checkpoints + checkpoint-vs-F1
#      scoring (VERDICT item 4 / old Queue6), one tissue at a time so a
#      reboot loses at most one tissue's training
#   Q4 pooled 4-tissue winning recipe (VERDICT item 5 / old Queue4)
#   Q5 3D lr x density collapse grid (VERDICT item 5 / old Queue5)
#
# Controls: touch .queue_stop to stop between steps; QUEUE_MAX_HOURS
# (default 6.5) stops launching new steps past the deadline so the
# end-of-round bench gets the TPU back.
#
# Usage: setsid bash scripts/tpu_queue_r4.sh > /tmp/tpu_queue_r4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data
PAB=examples/precision_ab
START_TS=$(date +%s)
MAX_S=$(python3 -c "import os; print(int(float(os.environ.get('QUEUE_MAX_HOURS','6.5'))*3600))")

log() { echo "[$(date +%H:%M:%S)] $*"; }

should_stop() {
  [ -f .queue_stop ] && { log "STOP sentinel found; exiting"; return 0; }
  local now; now=$(date +%s)
  if [ $((now - START_TS)) -gt "$MAX_S" ]; then
    log "deadline (QUEUE_MAX_HOURS) reached; exiting"
    return 0
  fi
  return 1
}

run() { log "RUN $*"; "$@"; log "DONE (exit $?) $*"; }

# commit ONLY the named paths (never sweeps up unrelated staged work from a
# concurrent interactive session)
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

# ---- restore any git-persisted checkpoints into gitignored models/ ------
for wd in "$RD"/tissuenet_*; do
  [ -d "$wd/ckpt" ] && python scripts/ckpt_tools.py restore "$wd"
done

# ---- P: precision A/B ---------------------------------------------------
# one row per (ndim, precision); skip rows already recorded+committed
pab_done() {  # $1=ndim $2=precision
  [ -f "$PAB/results.jsonl" ] || return 1
  python3 - "$1" "$2" <<'EOF'
import json, sys
ndim, prec = int(sys.argv[1]), sys.argv[2]
for line in open("examples/precision_ab/results.jsonl"):
    r = json.loads(line)
    if r["ndim"] == ndim and r["precision"] == prec:
        sys.exit(0)
sys.exit(1)
EOF
}

mkdir -p "$PAB"
for spec in "2 bfloat16 2000" "2 float32 2000" "3 bfloat16 2500" "3 float32 2500"; do
  should_stop && exit 0
  set -- $spec
  ndim=$1; prec=$2; iters=$3
  if pab_done "$ndim" "$prec"; then
    log "SKIP precision A/B ndim=$ndim $prec (recorded)"
    continue
  fi
  run python -u scripts/validate_quality.py --ndim "$ndim" --iters "$iters" \
      --precision "$prec" --fast \
      --workdir ".bench_work/precision_ab/wd_${ndim}d_${prec}" \
      --results-json "$PAB/results.jsonl"
  commit_paths "precision A/B: ${ndim}D $prec quality+wall row" "$PAB/results.jsonl"
done

# ---- T: tissue retrains + checkpoint-vs-F1 curves -----------------------
# (reboot wiped every round-3 checkpoint; these retrain the four studied
# recipes with numbered checkpoints every 1000 iters, then score each)
score_ckpts() {  # $1=workdir-name, rest = recipe flags
  local wd="$1"; shift
  local prev=-1000
  for ck in "$RD/$wd"/models/[0-9]*.ckpt; do
    [ -e "$ck" ] || continue
    local stem; stem=$(basename "$ck" .ckpt)
    local it=$((10#$stem))
    [ "$it" -lt 1000 ] && continue
    [ $((it - prev)) -lt 100 ] && continue
    prev=$it
    local tag="ckpt${stem}"
    if [ -f "$RD/$wd/results_${tag}.json" ]; then
      log "SKIP $wd $tag (already scored)"
      continue
    fi
    should_stop && return 0
    run python -u scripts/run_real_tissuenet.py --skip-train \
        --checkpoint "models/${stem}.ckpt" --results-tag "$tag" \
        --num-bandwidths 1 --workdir "$RD/$wd" "$@"
  done
}

tissue_step() {  # $1=workdir-name, rest = recipe flags (incl. --tissue)
  local wd="$1"; shift
  should_stop && exit 0
  # train done-condition: results.json stamped with 10000 iters (committed)
  local need_train=1
  if [ -f "$RD/$wd/results.json" ] && [ -f "$RD/$wd/models/best_loss.ckpt" ]; then
    if python3 -c "import json,sys; r=json.load(open('$RD/$wd/results.json')); sys.exit(0 if r.get('iters')==10000 else 1)"; then
      need_train=0
    fi
  fi
  if [ "$need_train" = 1 ]; then
    run python -u scripts/run_real_tissuenet.py --iters 10000 --resume \
        --fast --threshold-quantile 90 --lr-milestones 6000 8000 \
        --save-every 1000 --workdir "$RD/$wd" "$@"
    python scripts/ckpt_tools.py persist --final "$RD/$wd"
    commit_paths "r4 $wd: 10k retrain results + stripped final checkpoints" \
        "$RD/$wd/results.json" "$RD/$wd/ckpt" "$RD/$wd"/*_overlay.png
  fi
  score_ckpts "$wd" "$@" --threshold-quantile 90
  commit_paths "r4 $wd: checkpoint-vs-F1 curve scores" "$RD/$wd"/results_ckpt*.json
}

tissue_step tissuenet_lung_s3     --tissue lung     --scale 3
tissue_step tissuenet_pancreas_s3 --tissue pancreas --scale 3
tissue_step tissuenet_skin_s3n    --tissue skin     --scale 3 --normalize-per-panel
tissue_step tissuenet_immune_s3c  --tissue immune   --scale 3 --num-fmaps 64

# ---- Q4: pooled 4-tissue winning recipe ---------------------------------
tissue_step tissuenet_all_s3n     --tissue all      --scale 3 --normalize-per-panel

should_stop && exit 0
VARIANTS="baseline,thr-q90,greedy,greedy+thr-q90,greedy+thr-q95"
if [ ! -f "$RD/tissuenet_all_s3n/detect_sweep.json" ]; then
  run python -u scripts/sweep_detect_tissuenet.py \
      --workdir "$RD/tissuenet_all_s3n" --tissue all --scale 3 \
      --variants "$VARIANTS"
  commit_paths "r4 pooled model: detect-knob sweep" \
      "$RD/tissuenet_all_s3n/detect_sweep.json"
fi

# ---- Q5: 3D lr x density collapse grid ----------------------------------
should_stop && exit 0
run python -u scripts/sweep_3d_density.py --iters 1500 \
    --densities 0.1 --lrs 2e-4,1e-4,4e-5
commit_paths "r4 3D collapse grid: density 0.1 lr column" scripts/sweep_3d_density.csv
should_stop && exit 0
run python -u scripts/sweep_3d_density.py --iters 1500 \
    --densities 0.025 --lrs 1.6e-3
commit_paths "r4 3D collapse grid: density 0.025 high-lr cell" scripts/sweep_3d_density.csv

log "queue r4 complete"
