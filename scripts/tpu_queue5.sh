#!/bin/bash
# Fifth queue: the 3D high-density collapse MECHANISM experiment.
#
# The OCE loss is an un-normalized SUM over pairs (reference parity), so
# pairs/crop scales the per-step gradient: density 0.1 carries 4x the
# gradient magnitude of the validated 0.025. If the collapse recorded in
# scripts/sweep_3d_density.csv is effective-LR blowup, then density 0.1
# at lr/4 (1e-4) should recover to ~0.95 F1 and density 0.025 at 4x lr
# (1.6e-3) should collapse; if instead Adam's scale invariance really does
# cancel the sum (leaving only the wd/eps interaction), density 0.1 stays
# collapsed at every lr and the mechanism is the pair count itself
# (lower gradient noise converging onto the degenerate all-equal optimum).
# Either outcome replaces the docs' "over-constrains" hypothesis with a
# measurement. Run after tpu_queue4.sh finishes.
#
# Usage: setsid bash scripts/tpu_queue5.sh > /tmp/tpu_queue5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*"; }

queues_active() {
  for c in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$c" 2>/dev/null \
        | grep -qE "tpu_queue[234]?\.sh"; then
      return 0
    fi
  done
  return 1
}

log "waiting for earlier queues to finish"
while queues_active; do sleep 60; done
log "earlier queues done"

run() { log "RUN $*"; "$@"; log "DONE (exit $?) $*"; }

# collapse side: does lowering lr rescue density 0.1?
run python -u scripts/sweep_3d_density.py --iters 1500 \
    --densities 0.1 --lrs 2e-4,1e-4,4e-5
# converse: does raising lr break the validated density 0.025?
run python -u scripts/sweep_3d_density.py --iters 1500 \
    --densities 0.025 --lrs 1.6e-3
log "queue5 complete"
