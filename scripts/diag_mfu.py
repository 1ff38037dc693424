"""Microbenchmarks: where does the train step's time go, and what MFU do the
convs themselves reach? Run alone on the TPU."""

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
from cellulus_tpu.models import UNetSpec, forward, init_params, model_flops
from cellulus_tpu.train import make_optimizer, make_train_step_grid
from cellulus_tpu.datasets import PairSampler
from cellulus_tpu.models import compute_geometry

DEV = jax.devices()[0]
print("device_kind:", DEV.device_kind, flush=True)
PEAK = 197e12


def timed(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


spec = UNetSpec(1, 2, 64, 3, 64, ((2, 2),), 2)
B = 8
raw = jnp.asarray(np.random.default_rng(0).random((B, 252, 252, 1), np.float32))
params = init_params(jax.random.PRNGKey(0), spec)
fwd_flops = model_flops(spec, (252, 252))
print(f"forward flops/sample: {fwd_flops/1e9:.1f} GFLOP", flush=True)

# 1. forward only (bf16)
f = jax.jit(lambda p, x: forward(spec, p, x, jnp.bfloat16))
t = timed(f, params, raw)
print(f"forward bf16: {1e3*t:.2f} ms  MFU {100*fwd_flops*B/t/PEAK:.1f}%", flush=True)

# 2. forward+backward (grad wrt params of mean output)
g = jax.jit(
    lambda p, x: jax.grad(
        lambda pp: jnp.mean(forward(spec, pp, x, jnp.bfloat16))
    )(p)
)
t = timed(g, params, raw)
print(f"fwd+bwd bf16: {1e3*t:.2f} ms  MFU {100*3*fwd_flops*B/t/PEAK:.1f}%", flush=True)

# 3. full grid train step
geometry = compute_geometry((252, 252), spec.downsampling_factors)
sampler = PairSampler(output_shape=geometry.output_size, density=0.1, kappa=10.0)
opt = make_optimizer(1e-4)
opt_state = opt.init(params)
step = jax.jit(make_train_step_grid(spec, opt, 10.0, 1e-5, sampler, B, jnp.bfloat16))
key = jax.random.PRNGKey(1)


def run_step(p, o, r, k):
    return step(p, o, r, k)


t = timed(run_step, params, opt_state, raw, key, n=10)
print(f"grid step: {1e3*t:.2f} ms  MFU {100*3*fwd_flops*B/t/PEAK:.1f}%", flush=True)

# 4. single conv microbenches
from jax import lax


def conv_bench(C_in, C_out, H, k, B_=8, dtype=jnp.bfloat16):
    x = jnp.asarray(
        np.random.default_rng(0).random((B_, H, H, C_in), np.float32), dtype
    )
    w = jnp.asarray(
        np.random.default_rng(1).random((k, k, C_in, C_out), np.float32), dtype
    )
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def f(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "VALID", dimension_numbers=dn)

    jf = jax.jit(f)
    t = timed(jf, x, w)
    out_h = H - k + 1
    flops = 2 * B_ * out_h * out_h * k * k * C_in * C_out
    print(
        f"conv {k}x{k} {C_in}->{C_out} @{H}^2 B{B_}: {1e3*t:.2f} ms  "
        f"MFU {100*flops/t/PEAK:.1f}%",
        flush=True,
    )


conv_bench(64, 64, 250, 3)
conv_bench(128, 128, 250, 3)
conv_bench(64, 64, 250, 1)
conv_bench(192, 192, 125, 3)
conv_bench(64, 64, 250, 3, B_=32)
