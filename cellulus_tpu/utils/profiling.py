"""Tracing and per-stage performance counters.

The reference has no profiling support (SURVEY.md §5: only tqdm bars).
Here every pipeline stage reports wall time and item throughput, and an
XLA/TPU profiler trace can be captured around any region:

- set ``CELLULUS_TPU_PROFILE=/path/to/tracedir`` to capture a
  ``jax.profiler`` trace of the whole train/infer run (viewable in
  TensorBoard / Perfetto),
- ``stage_timer("predict", items=n_tiles, unit="tiles")`` prints
  ``[perf] predict: 12.34s, 32 tiles, 2.59 tiles/s`` on exit and
  accumulates into a global report available via :func:`perf_report`.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

_STAGES: Dict[str, Dict[str, float]] = {}


@contextlib.contextmanager
def stage_timer(name: str, items: Optional[int] = None, unit: str = "items"):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        entry = _STAGES.setdefault(name, {"seconds": 0.0, "items": 0.0})
        entry["seconds"] += dt
        if items:
            entry["items"] += items
        msg = f"[perf] {name}: {dt:.2f}s"
        if items:
            msg += f", {items} {unit}, {items / max(dt, 1e-9):.2f} {unit}/s"
        print(msg)


def perf_report() -> Dict[str, Dict[str, float]]:
    """Accumulated per-stage timings for this process."""
    return {k: dict(v) for k, v in _STAGES.items()}


def reset_perf() -> None:
    _STAGES.clear()


def device_timers_enabled() -> bool:
    """CELLULUS_TPU_DEVICE_TIMERS=1 turns :func:`time_device` on."""
    from .env import env_flag

    return env_flag("CELLULUS_TPU_DEVICE_TIMERS")


def time_device(name: str, fn, *args, **kwargs):
    """Call ``fn(*args, **kwargs)`` and, when CELLULUS_TPU_DEVICE_TIMERS is
    set, accumulate its dispatch-to-completion time under stage ``name``.

    Measures from dispatch until ``jax.block_until_ready`` on the result:
    device compute plus any host-to-device upload of host-resident
    arguments, but NOT the bulk device-to-host fetch of the result (the
    caller's ``np.asarray`` does that) and not the caller's host prep. The
    per-stage sums give a transfer-independent device-time floor for the
    e2e pipeline (bench.py reports them next to wall time, where tunnel
    d2h jitter dominates run-to-run spread).

    Off (the default), this is a zero-overhead passthrough — no added
    synchronization, so pipelined/double-buffered callers keep their
    overlap.
    """
    if not device_timers_enabled():
        return fn(*args, **kwargs)
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    entry = _STAGES.setdefault(name, {"seconds": 0.0, "items": 0.0})
    entry["seconds"] += dt
    entry["items"] += 1
    return out


@contextlib.contextmanager
def maybe_trace():
    """Capture a jax.profiler trace when CELLULUS_TPU_PROFILE is set."""
    trace_dir = os.environ.get("CELLULUS_TPU_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    print(f"[perf] profiler trace written to {trace_dir}")
