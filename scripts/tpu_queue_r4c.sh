#!/bin/bash
# Round-4c follow-on queue — idempotent + reboot-survivable like r4/r4b.
# Supersedes the unfinished parts of r4b (its clipped pancreas retrain is
# recorded as a NEGATIVE result, not resumed — see step C0).
#
# Steps, in value order:
#   C0 commit the r4b clipped-run evidence: the measured-clip pancreas
#      retrain (clip = 2 x median healthy norm) entered a limit cycle —
#      explode (raw grad norms to 1e10) -> clip drags it back ->
#      re-explode — so the instability is the lr 4e-4 healthy-regime step
#      size, not a rare spike.  loss.csv + a windowed summary are the
#      committed record.
#   C  pancreas at lr 2e-4, NO clip: halving lr isolates the real lever
#      and should give the missing healthy pancreas checkpoint-vs-F1
#      curve (the last open cell of the VERDICT-item-4 study).
#   D  3D precision A/B in the VALIDATED regime (all_dims, density 0.05):
#      the r4 cells ran the reference-mode recipe documented as
#      high-variance (F1 0.03-0.79 across reruns), so their bf16-vs-f32
#      gap is confounded.  This closes VERDICT item 2's 3D half.
#   A  relaunch the idempotent r4 master queue with the remaining time
#      budget: completed steps self-skip; what actually runs is the
#      pooled model's checkpoint-vs-F1 scores, the pooled detect-knob
#      sweep, and the Q5 3D lr x density collapse-grid cells.
#   B  pooled early-stop curve: the pooled 10k retrain scored 0.300 at
#      best_loss selection (round-2's pooled best was 0.427) while the
#      round-4 per-tissue curves show F1 peaking at 1-2k iterations and
#      declining after. Retrain pooled to 4k with 500-cadence
#      checkpoints, score EVERY checkpoint with the fixed single-bw +
#      q90 protocol, and persist all stripped checkpoints — this answers
#      whether measured selection rescues the pooled recipe.
#   E  one full bench.py run (warms compile + baseline caches so the
#      driver's end-of-round record is not first-compile-skewed).
#
# Controls: touch .queue_stop to stop between steps; QUEUE_MAX_HOURS
# (default 5.0) stops launching new steps past the deadline so the
# end-of-round bench gets the TPU back (step E runs even past deadline).
#
# Usage: setsid bash scripts/tpu_queue_r4c.sh > /tmp/tpu_queue_r4c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data
START_TS=$(date +%s)
MAX_S=$(python3 -c "import os; print(int(float(os.environ.get('QUEUE_MAX_HOURS','5.0'))*3600))")

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
    log "deadline (QUEUE_MAX_HOURS) reached; skipping to bench warm-up"
    return 0
  fi
  return 1
}

for wd in "$RD"/tissuenet_*; do
  [ -d "$wd/ckpt" ] && python scripts/ckpt_tools.py restore "$wd"
done

# ---- C0: record the clipped-run limit cycle as a negative result ----------
SG=$RD/tissuenet_pancreas_s3g
if [ -f "$SG/loss.csv" ] && [ ! -f "$SG/limit_cycle_summary.json" ]; then
  python3 - <<'EOF'
import csv, json, statistics
wd = "examples/real-data/tissuenet_pancreas_s3g"
rows = list(csv.DictReader(open(f"{wd}/loss.csv")))
losses = [float(r["loss"]) for r in rows]
gn = [float(r["grad_norm"]) for r in rows if r.get("grad_norm") not in (None, "", "nan")]
json.dump(
    {
        "recipe": "pancreas scale3 lr 4e-4, grad_clip_norm=212889.8 (2x median healthy norm)",
        "iters_reached": len(rows),
        "loss_median": statistics.median(losses),
        "loss_max": max(losses),
        "grad_norm_median": statistics.median(gn) if gn else None,
        "grad_norm_max": max(gn) if gn else None,
        "windows_1k": [
            {"start": w, "median": statistics.median(losses[w : w + 1000]),
             "max": max(losses[w : w + 1000])}
            for w in range(0, len(rows), 1000)
        ],
        "verdict": (
            "NEGATIVE: limit cycle. Healthy first ~1k window (median 175k = the OCE "
            "all-pairs-far plateau), then sustained explosion: raw grad-norm median "
            "1.4e8 against a 2.1e5 clip. Clipping at 2x the healthy median cannot "
            "stabilize lr 4e-4 on this recipe; the step size itself is the lever."
        ),
    },
    open(f"{wd}/limit_cycle_summary.json", "w"), indent=2,
)
print("wrote", wd, "limit_cycle_summary.json")
EOF
  commit_paths "r4b pancreas measured-clip retrain: limit-cycle negative result" \
      "$SG/loss.csv" "$SG/limit_cycle_summary.json"
fi

# ---- C: pancreas at lr 2e-4, no clip --------------------------------------
WD=$RD/tissuenet_pancreas_s3h
should_stop || {
  need=1
  if [ -f "$WD/results.json" ] && [ -f "$WD/models/best_loss.ckpt" ]; then
    python3 -c "import json,sys; sys.exit(0 if json.load(open('$WD/results.json')).get('iters')==10000 else 1)" && need=0
  fi
  if [ "$need" = 1 ]; then
    run python -u scripts/run_real_tissuenet.py --iters 10000 --resume --fast \
        --threshold-quantile 90 --lr 2e-4 --lr-milestones 6000 8000 \
        --save-every 1000 --log-grad-norm \
        --workdir "$WD" --tissue pancreas --scale 3
    python scripts/ckpt_tools.py persist "$WD"
    commit_paths "r4c pancreas lr 2e-4 retrain: results + stripped checkpoints" \
        "$WD/results.json" "$WD/ckpt" "$WD"/*_overlay.png "$WD/loss.csv"
  fi

  prev=-1000
  for ck in "$WD"/models/[0-9]*.ckpt; do
    [ -e "$ck" ] || continue
    stem=$(basename "$ck" .ckpt)
    it=$((10#$stem))
    [ "$it" -lt 1000 ] && continue
    [ $((it - prev)) -lt 100 ] && continue
    prev=$it
    tag="ckpt${stem}"
    [ -f "$WD/results_${tag}.json" ] && { log "SKIP $tag (scored)"; continue; }
    should_stop && break
    run python -u scripts/run_real_tissuenet.py --skip-train \
        --checkpoint "models/${stem}.ckpt" --results-tag "$tag" \
        --num-bandwidths 1 --workdir "$WD" --tissue pancreas --scale 3 \
        --threshold-quantile 90
  done
  commit_paths "r4c pancreas lr 2e-4: checkpoint-vs-F1 curve scores" \
      "$WD"/results_ckpt*.json
}

# ---- D: 3D precision A/B in the VALIDATED regime ---------------------------
PAB=examples/precision_ab
pab3v_done() {  # $1=precision
  [ -f "$PAB/results.jsonl" ] || return 1
  python3 - "$1" <<'EOF'
import json, sys
prec = sys.argv[1]
for line in open("examples/precision_ab/results.jsonl"):
    r = json.loads(line)
    if (r["ndim"] == 3 and r["precision"] == prec
            and r.get("pair_count_mode") == "all_dims"):
        sys.exit(0)
sys.exit(1)
EOF
}
for prec in bfloat16 float32; do
  should_stop && break
  if pab3v_done "$prec"; then
    log "SKIP 3D validated-regime A/B $prec (recorded)"
    continue
  fi
  run python -u scripts/validate_quality.py --ndim 3 --iters 2500 \
      --precision "$prec" --fast --pair-count-mode all_dims --density 0.05 \
      --workdir ".bench_work/precision_ab/wd_3d_${prec}_alldims" \
      --results-json "$PAB/results.jsonl"
  commit_paths "precision A/B: 3D $prec in the validated all_dims regime" \
      "$PAB/results.jsonl"
done

# ---- A: r4 master leftovers (idempotent re-launch, remaining budget) -------
if ! should_stop; then
  REMAIN_H=$(python3 -c "import time; print(max(0.2, ($START_TS + $MAX_S - time.time())/3600))")
  log "launching r4 master queue (completed steps self-skip; budget ${REMAIN_H}h)"
  QUEUE_MAX_HOURS="$REMAIN_H" bash scripts/tpu_queue_r4.sh
fi

# ---- B: pooled early-stop curve -------------------------------------------
WD=$RD/tissuenet_all_s3e
[ -d "$WD/ckpt" ] && python scripts/ckpt_tools.py restore "$WD"
should_stop || {
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
    should_stop && break
    run python -u scripts/run_real_tissuenet.py --skip-train \
        --checkpoint "models/${stem}.ckpt" --results-tag "$tag" \
        --num-bandwidths 1 --workdir "$WD" --tissue all --scale 3 \
        --normalize-per-panel --threshold-quantile 90
  done
  commit_paths "r4c pooled early-stop study: checkpoint-vs-F1 curve scores" \
      "$WD"/results_ckpt*.json
}

# ---- E: bench warm-up (runs even past deadline) -----------------------------
[ -f .queue_stop ] || run python bench.py
log "queue r4c complete"
