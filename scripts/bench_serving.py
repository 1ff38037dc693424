"""Serving-artifact throughput: exported StableHLO predictor vs live model.

Exports the bench-scale tile predictor (252^2 tiles, batch-of-4, 32-pass
TTA — the same program bench.py's predict stage runs), loads it back, and
measures sustained call throughput. Per the NOTES.md measurement rule,
calls are CHAINED (each call's input depends on the previous call's
output through a device-side scalar) and the run ends with a real d2h
fetch, so the tunneled runtime cannot elide dispatches.

Usage: python scripts/bench_serving.py [n_calls]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

import cellulus_tpu

cellulus_tpu.enable_compilation_cache()

from cellulus_tpu.configs import InferenceConfig
from cellulus_tpu.export import export_predictor, load_predictor
from cellulus_tpu.models import UNetSpec, init_params

N_CALLS = int(sys.argv[1]) if len(sys.argv) > 1 else 20

spec = UNetSpec(1, 2, 64, 3, 64, ((2, 2),), 2)
params = init_params(jax.random.PRNGKey(0), spec)
ic = InferenceConfig(
    crop_size=[252, 252],
    num_infer_iterations=16,
    p_salt_pepper=0.01,
    tile_batch_size=4,
    precision="bfloat16",
)

with tempfile.TemporaryDirectory() as d:
    t0 = time.perf_counter()
    out_dir = export_predictor(spec, params, ic, d, normalization_factor=1.0)
    t_export = time.perf_counter() - t0
    size_mb = (out_dir / "predictor.stablehlo").stat().st_size / 1e6
    predict, meta = load_predictor(out_dir)
    print(
        f"export: {t_export:.1f}s, artifact {size_mb:.1f} MB, "
        f"platforms {meta['platforms']}",
        flush=True,
    )

    T = meta["tile_batch_size"]
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        rng.random((T, *meta["in_tile"], meta["in_channels"])), jnp.float32
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(T, dtype=jnp.uint32))

    # warm (compile/load)
    out = predict(tiles, keys)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    x = tiles
    for _ in range(N_CALLS):
        out = predict(x, keys)
        # device-side dependency chain: next input nudged by this output
        x = tiles + jnp.mean(out).astype(tiles.dtype) * 1e-12
    final = float(jnp.sum(out))  # real fetch fences the timing
    t = time.perf_counter() - t0
    tiles_per_sec = N_CALLS * T / t
    print(
        f"serving: {N_CALLS} calls x {T} tiles in {t:.2f}s -> "
        f"{tiles_per_sec:.1f} tiles/s ({1e3 * t / N_CALLS:.1f} ms/call; "
        f"checksum {final:.3e})",
        flush=True,
    )
