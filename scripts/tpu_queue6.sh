#!/bin/bash
# Sixth queue: checkpoint-vs-F1 early-stopping curves.
#
# Queue3's 10k lr-milestone resumes showed training loss falling
# monotonically while seg F1 DROPPED on skin (0.358 -> 0.216 at the q90
# mean-shift default) and stayed flat on lung/pancreas — i.e. in the
# 5-panel regime the unsupervised OCE loss is a poor model-selection
# proxy and best_loss.ckpt can pick an over-trained model. This queue
# scores every retained numbered checkpoint (2.5k / 5k / 10k) of each
# studied workdir with the workdir's own recipe, giving a measured
# F1-vs-iteration curve per tissue. Run after tpu_queue5.sh finishes.
#
# Usage: setsid bash scripts/tpu_queue6.sh > /tmp/tpu_queue6.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data

log() { echo "[$(date +%H:%M:%S)] $*"; }

queues_active() {
  for c in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$c" 2>/dev/null \
        | grep -qE "tpu_queue[2345]?\.sh"; then
      return 0
    fi
  done
  return 1
}

log "waiting for earlier queues to finish"
while queues_active; do sleep 60; done
log "earlier queues done"

run() { log "RUN $*"; "$@"; log "DONE (exit $?) $*"; }

# workdir -> the flags its model/data were built with (MUST match: num-fmaps
# shapes the checkpoint, normalize-per-panel shapes data.zarr's pixels)
score_workdir() {
  local wd="$1"; shift
  [ -d "$RD/$wd/models" ] || { log "SKIP $wd (no models dir)"; return; }
  local prev=-1000
  for ck in "$RD/$wd"/models/[0-9]*.ckpt; do
    [ -e "$ck" ] || continue
    local stem; stem=$(basename "$ck" .ckpt)
    local it=$((10#$stem))
    # skip near-duplicates (004999 vs 005003) and the iter-3 noise ckpt
    [ "$it" -lt 1000 ] && continue
    [ $((it - prev)) -lt 100 ] && continue
    prev=$it
    local tag="ckpt${stem}"
    if [ -f "$RD/$wd/results_${tag}.json" ]; then
      log "SKIP $wd $tag (already scored)"
      continue
    fi
    run python -u scripts/run_real_tissuenet.py --skip-train \
        --checkpoint "models/${stem}.ckpt" --results-tag "$tag" \
        --num-bandwidths 1 --workdir "$RD/$wd" "$@"
  done
}

score_workdir tissuenet_lung_s3     --tissue lung     --scale 3 --threshold-quantile 90
score_workdir tissuenet_pancreas_s3 --tissue pancreas --scale 3 --threshold-quantile 90
score_workdir tissuenet_skin_s3n    --tissue skin     --scale 3 --threshold-quantile 90 --normalize-per-panel
score_workdir tissuenet_immune_s3c  --tissue immune   --scale 3 --threshold-quantile 90 --num-fmaps 64
score_workdir tissuenet_all_s3n     --tissue all      --scale 3 --threshold-quantile 90 --normalize-per-panel

log "curve summary:"
python - <<'EOF'
import json, glob, re
for wd in sorted(glob.glob("examples/real-data/tissuenet_*")):
    rows = []
    for f in sorted(glob.glob(wd + "/results_ckpt*.json")):
        it = int(re.search(r"ckpt(\d+)", f).group(1))
        d = json.load(open(f))
        rows.append((it, d["mean_panel_F1"], d["aggregate"]["SEG"]))
    if not rows:
        continue
    best = json.load(open(wd + "/results.json")) if glob.glob(wd + "/results.json") else None
    print(wd)
    for it, f1, seg in sorted(rows):
        print(f"  iter {it:>6}: mean panel F1 {f1:.3f}  SEG {seg:.3f}")
    if best:
        print(f"  best_loss : mean panel F1 {best['mean_panel_F1']:.3f}")
EOF
log "queue6 complete"
