#!/bin/bash
# Wait for the wedged axon TPU session to clear, then run the TissueNet
# study queue end-to-end. Designed to run DETACHED (setsid): every child
# terminates on its own via max_iterations, and each training run can be
# stopped gracefully by touching <workdir>/STOP (train_config.stop_file)
# — never kill a device-holding process (NOTES.md: axon wedge).
#
# Usage: setsid bash scripts/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
RD=examples/real-data
SKIN_PID="${SKIN_PID:-}"   # optional: PID of a CPU skin run to stop first

log() { echo "[$(date +%H:%M:%S)] $*"; }

log "watcher: waiting for device init to succeed (probe every ~5 min)"
# The probe child is NEVER killed: `timeout` here would SIGKILL a process
# that may hold a freshly-claimed device session mid-init — exactly the
# action that wedges the session (NOTES.md). Instead: spawn one probe,
# wait bounded for a success sentinel, and if it is still hanging past the
# bound, block until it exits ON ITS OWN (a reset remote session makes the
# client error out; a true wedge means waiting costs nothing anyway).
PROBE_OK="/tmp/tpu_probe_ok.$$"
while true; do
  rm -f "$PROBE_OK"
  ( python -c "import jax; jax.devices()" >/dev/null 2>&1 \
      && touch "$PROBE_OK" ) &
  probe=$!
  waited=0
  while kill -0 "$probe" 2>/dev/null && [ "$waited" -lt 600 ]; do
    sleep 10; waited=$((waited + 10))
  done
  if kill -0 "$probe" 2>/dev/null; then
    log "probe still initializing after ${waited}s; waiting for it to exit on its own (never killed)"
    wait "$probe" || true
  fi
  [ -f "$PROBE_OK" ] && break
  log "probe failed; retrying in 5 min"
  sleep 300
done
rm -f "$PROBE_OK"
log "device healthy"
# tell any CPU-fallback queue (scripts/cpu_queue.sh) to stand down
touch /tmp/tpu_queue_active

# gracefully stop ANY in-flight CPU tissuenet training (it checkpoints at
# the sentinel and exits; the TPU runs below resume from that checkpoint).
# Scan /proc to WAIT (never kill — NOTES.md wedge rules don't apply to CPU
# jobs, but the sentinel path loses no work either way).
cpu_runs_active() {
  for c in /proc/[0-9]*/cmdline; do
    if grep -q run_real_tissuenet "$c" 2>/dev/null; then return 0; fi
  done
  return 1
}
if cpu_runs_active; then
  log "stopping in-flight CPU tissuenet runs via STOP sentinels"
  for w in "$RD"/tissuenet_*_s3 "$RD"/tissuenet_*_s3b; do
    [ -d "$w" ] && touch "$w/STOP"
  done
  while cpu_runs_active; do sleep 10; done
  for w in "$RD"/tissuenet_*_s3 "$RD"/tissuenet_*_s3b; do
    rm -f "$w/STOP"
  done
  log "CPU runs exited"
fi

run() { log "RUN $*"; "$@"; log "DONE (exit $?) $*"; }

# per-tissue scale-3 runs (reference demo recipe + the dense-tissue
# threshold; --fast = on-device elastic + 4-step dispatch, the measured
# TPU path). skin resumes from the CPU checkpoints if present.
run python -u scripts/run_real_tissuenet.py --tissue skin --scale 3 \
    --iters 5000 --resume --fast --threshold-quantile 90 \
    --workdir "$RD/tissuenet_skin_s3"
run python -u scripts/run_real_tissuenet.py --tissue lung --scale 3 \
    --iters 5000 --resume --fast --threshold-quantile 90 \
    --workdir "$RD/tissuenet_lung_s3"
run python -u scripts/run_real_tissuenet.py --tissue pancreas --scale 3 \
    --iters 5000 --resume --fast --threshold-quantile 90 \
    --workdir "$RD/tissuenet_pancreas_s3"
# paper-style recipe on immune (10k iters, lr/10 at 6k and 8k)
run python -u scripts/run_real_tissuenet.py --tissue immune --scale 3 \
    --iters 10000 --resume --fast --threshold-quantile 90 \
    --lr-milestones 6000 8000 --workdir "$RD/tissuenet_immune_s3b"

# detect/segment re-clustering sweeps on the saved embeddings (CPU so the
# numbers don't depend on tunnel health; greedy is the dense-tissue recipe)
VARIANTS="baseline,thr-q90,greedy,greedy+thr-q90,greedy+thr-q95"
for t in skin lung pancreas; do
  run python -u scripts/sweep_detect_tissuenet.py \
      --workdir "$RD/tissuenet_${t}_s3" --tissue "$t" --scale 3 --cpu \
      --variants "$VARIANTS"
done
run python -u scripts/sweep_detect_tissuenet.py \
    --workdir "$RD/tissuenet_immune_s3b" --tissue immune --scale 3 --cpu \
    --variants "$VARIANTS"

log "queue complete; report:"
python scripts/tissuenet_report.py
