#!/bin/bash
# Round-4f queue — 3D fast-path protocol discrimination at density 0.025.
#
# The contradiction to resolve: scripts/sweep_3d_density.py scores the
# (density 0.025, lr 4e-4, 2500 iters, bf16) cell F1 0.9565 — twice —
# while scripts/validate_quality.py scores the SAME nominal cell 0.127
# (bf16) / 0.435 (f32). The two protocols differ in exactly two knobs:
#   * steps_per_dispatch = 4     (validate --fast bundle; sweep uses 1)
#   * transfer_precision = f16   (validate's inference d2h; sweep uses f32)
# Every validate_quality 3D all_dims run is poor (0.13-0.44, n=4); every
# sweep run at lr*density <= 1e-5 is good (>= 0.91, n=5). These cells
# separate the levers on the ALREADY-TRAINED workdirs (cheap re-infers)
# plus one fresh retrain with the scan unbundled.
#
# Diagnostics go to examples/precision_ab/diagnostics.jsonl so the main
# results.jsonl keeps matching the r4d/r4e done-check filters.
#
#   A   re-infer wd_3d_bfloat16_d025 (trained F1 0.127) with f32 transfer.
#       Good score => the f16 d2h transfer corrupts detect; training fine.
#   A2  re-infer the same workdir with f16 transfer (the original
#       protocol): re-scoring determinism / inference-side variance probe.
#   B   same pair on wd_3d_float32_d025 (trained F1 0.435).
#   C   score the bf16 workdir's MID-TRAIN checkpoint (001251.ckpt, f32
#       transfer): was the model ever good, i.e. did training degrade late?
#   D   fresh bf16 d025 cell: --fast --steps-per-dispatch 1 (f16 transfer
#       kept). Good score while A stays bad => the K-step scan path is the
#       culprit; bad score => neither lever alone explains it (variance or
#       an interaction).
#
# Controls: touch .queue_stop to stop between steps; QUEUE_MAX_HOURS
# (default 2.5) stops launching new steps past the deadline.
#
# Usage: WAIT_PID=<previous queue bash pid> setsid bash \
#            scripts/tpu_queue_r4f.sh > /tmp/tpu_queue_r4f.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
PAB=examples/precision_ab
DIAG=$PAB/diagnostics.jsonl
WDB=.bench_work/precision_ab/wd_3d_bfloat16_d025
WDF=.bench_work/precision_ab/wd_3d_float32_d025
MAX_S=$(python3 -c "import os; print(int(float(os.environ.get('QUEUE_MAX_HOURS','2.5'))*3600))")

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

# a diagnostics row is identified by (workdir-precision, transfer,
# steps_per_dispatch, checkpoint) — see the tags below
diag_done() {  # $1=tag
  [ -f "$DIAG" ] || return 1
  grep -q "\"tag\": \"$1\"" "$DIAG"
}

# validate_quality doesn't take a free-form tag; wrap it: run, then stamp
# the last-appended row with the tag (single-writer queue => safe).
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
  commit_paths "r4f 3D protocol discrimination: $tag" "$DIAG"
}

# serialize on the single chip
if [ -n "${WAIT_PID:-}" ]; then
  log "waiting for PID $WAIT_PID (previous queue) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  log "PID $WAIT_PID gone; starting"
fi
# the deadline clock starts when the CHIP becomes ours, not at launch —
# chained queues must not have their budget eaten by the wait
START_TS=$(date +%s)

COMMON3D=(--ndim 3 --iters 2500 --fast --pair-count-mode all_dims --density 0.025)

# ---- A/A2: transfer-precision lever on the trained bf16 workdir ------------
if [ -d "$WDB/models" ]; then
  run_tagged bf16_d025_reinfer_f32transfer "${COMMON3D[@]}" \
      --precision bfloat16 --skip-train --transfer-precision float32 \
      --workdir "$WDB"
  run_tagged bf16_d025_reinfer_f16transfer "${COMMON3D[@]}" \
      --precision bfloat16 --skip-train --transfer-precision float16 \
      --workdir "$WDB"
else
  log "SKIP A/A2: $WDB missing (reboot-wiped)"
fi

# ---- B: same pair on the f32 workdir ---------------------------------------
if [ -d "$WDF/models" ]; then
  run_tagged f32_d025_reinfer_f32transfer "${COMMON3D[@]}" \
      --precision float32 --skip-train --transfer-precision float32 \
      --workdir "$WDF"
else
  log "SKIP B: $WDF missing (reboot-wiped)"
fi

# ---- C: mid-train checkpoint trajectory ------------------------------------
if [ -f "$WDB/models/001251.ckpt" ]; then
  run_tagged bf16_d025_ckpt1251_f32transfer "${COMMON3D[@]}" \
      --precision bfloat16 --skip-train --transfer-precision float32 \
      --checkpoint models/001251.ckpt --workdir "$WDB"
fi

# ---- D: fresh retrain with the scan unbundled (spd=1) ----------------------
run_tagged bf16_d025_retrain_spd1 "${COMMON3D[@]}" \
    --precision bfloat16 --steps-per-dispatch 1 \
    --workdir .bench_work/precision_ab/wd_3d_bfloat16_d025_spd1

log "queue r4f complete"
