"""3D train-step roofline cells (VERDICT r4 item 4).

The 2D step has a full roofline (NOTES.md "MFU roofline post-mortem":
14.6 % MFU, dw-conv tall-K ceiling measured); the 3D anisotropic recipe
(24 fmaps, factor 3, [[1,2,2]], crop [40,76,76], bf16) sat at 9.2 % with
no study. Measures, via the chained K-step scan rule:

  - the bench step as-is (baseline)
  - forward-only cost (splits fwd vs backward)
  - channel-width ladder (24 -> 32 -> 64 fmaps): NDHWC lane padding —
    if FLOPs/s rises with C, the 8x128 lane tiling is underfilled at 24
  - batch 4 (dispatch/jitter amortization)
  - isotropic [[2,2,2]] at matched voxel count (kernel-shape effect)
  - remat on/off (memory-traffic trade)

Usage: python scripts/diag_step_3d.py   (TPU; one job at a time)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

import cellulus_tpu

cellulus_tpu.enable_compilation_cache()

from cellulus_tpu.datasets.sampling import PairSampler
from cellulus_tpu.models import init_params, model_flops, spec_from_config
from cellulus_tpu.configs import ModelConfig
from cellulus_tpu.models import compute_geometry
from cellulus_tpu.train import (
    make_multi_step,
    make_optimizer,
    make_train_step_grid,
)

print("device:", jax.devices()[0].device_kind, flush=True)
PEAK = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
K_STEPS = 10
REPS = 3


def cell(name, num_fmaps, crop, factors, batch, fwd_only=False,
         remat=False, dtype=jnp.bfloat16):
    mc = ModelConfig(num_fmaps=num_fmaps, fmap_inc_factor=3,
                     downsampling_factors=[list(f) for f in factors])
    spec = spec_from_config(mc, in_channels=1, num_spatial_dims=3)
    geom = compute_geometry(tuple(crop), spec.downsampling_factors)
    sampler = PairSampler(geom.output_size, density=0.05, kappa=8.0)
    params = init_params(jax.random.PRNGKey(0), spec)
    optimizer = make_optimizer(4e-4)
    rng = np.random.default_rng(0)
    raw_K = jnp.asarray(
        rng.random((K_STEPS, batch, *crop, 1), np.float32)
    )
    keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(7), i)
    )(jnp.arange(K_STEPS))

    if fwd_only:
        from cellulus_tpu.models import unet as unet_mod

        def fwd_scan(params, raw_K):
            def body(c, raw):
                out = unet_mod.forward(spec, params, raw, dtype)
                return c + jnp.sum(out.astype(jnp.float32)), None

            total, _ = jax.lax.scan(body, jnp.float32(0), raw_K)
            return total

        fn = jax.jit(fwd_scan)
        out = fn(params, raw_K)
        jax.block_until_ready(out)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(params, raw_K)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        per_step = min(times) / K_STEPS
        flops = model_flops(spec, tuple(crop)) * batch
    else:
        step = make_train_step_grid(
            spec, optimizer, 10.0, 1e-5, sampler, batch, dtype, remat=remat
        )
        multi = jax.jit(make_multi_step(step), donate_argnums=(0, 1))
        opt_state = optimizer.init(params)
        p, o, losses, _ = multi(params, opt_state, raw_K, keys)
        jax.block_until_ready(losses)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            p, o, losses, _ = multi(p, o, raw_K, keys)
            jax.block_until_ready(losses)
            times.append(time.perf_counter() - t0)
        per_step = min(times) / K_STEPS
        flops = 3 * model_flops(spec, tuple(crop)) * batch
    mfu = flops / per_step / PEAK
    print(
        f"{name:34s} {1e3 * per_step:7.2f} ms/step  "
        f"{flops / 1e9:7.1f} GF  MFU {100 * mfu:5.2f}%", flush=True,
    )


ANISO = ((1, 2, 2),)
ISO = ((2, 2, 2),)
cell("bench recipe (24f aniso b2)", 24, (40, 76, 76), ANISO, 2)
cell("fwd-only    (24f aniso b2)", 24, (40, 76, 76), ANISO, 2, fwd_only=True)
cell("32 fmaps    (aniso b2)", 32, (40, 76, 76), ANISO, 2)
cell("64 fmaps    (aniso b2)", 64, (40, 76, 76), ANISO, 2)
cell("batch 4     (24f aniso)", 24, (40, 76, 76), ANISO, 4)
cell("isotropic   (24f [[2,2,2]] b2)", 24, (60, 60, 60), ISO, 2)
cell("remat       (24f aniso b2)", 24, (40, 76, 76), ANISO, 2, remat=True)
cell("f32         (24f aniso b2)", 24, (40, 76, 76), ANISO, 2,
     dtype=jnp.float32)
