"""Microbenchmarks: device-true conv/step timings via in-jit chained loops.

Measurement rule for the tunneled TPU (axon): independent dispatches whose
outputs are dropped can be elided/cancelled by the runtime, so naive
dispatch-loop timing reads absurdly fast (round 1's "0.7 ms grid step").
Every benchmark here CHAINS iterations inside one jitted fori_loop so the
device must execute all of them; wall time / iters is then real device time.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax import lax

import cellulus_tpu

cellulus_tpu.enable_compilation_cache()
from cellulus_tpu.models import UNetSpec, forward, init_params, model_flops

DEV = jax.devices()[0]
print("device_kind:", DEV.device_kind, flush=True)
PEAK = 197e12  # v5e bf16

ITERS = 20


def timed_loop(make_body, x0, flops_per_iter, label):
    """make_body() -> body(i, x) chained; one jit, blocked."""

    @jax.jit
    def loop(x):
        return lax.fori_loop(0, ITERS, make_body(), x)

    out = loop(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(x0)
    jax.block_until_ready(out)
    t = (time.perf_counter() - t0) / ITERS
    print(
        f"{label}: {1e3*t:.3f} ms/iter  MFU {100*flops_per_iter/t/PEAK:.1f}%",
        flush=True,
    )
    return t


rng = np.random.default_rng(0)
spec = UNetSpec(1, 2, 64, 3, 64, ((2, 2),), 2)
B = 8
raw = jnp.asarray(rng.random((B, 252, 252, 1), np.float32))
params = init_params(jax.random.PRNGKey(0), spec)
fwd_flops = model_flops(spec, (252, 252)) * B
print(f"forward flops/batch8: {fwd_flops/1e9:.1f} GFLOP", flush=True)

# forward chained: x <- x + tiny scalar from the output
def fwd_body():
    def body(i, x):
        out = forward(spec, params, x, jnp.bfloat16)
        return x + jnp.mean(out).astype(x.dtype) * 1e-12

    return body


timed_loop(fwd_body, raw, fwd_flops, "forward bf16 (chained)")


# fwd+bwd chained
def bwd_body():
    def body(i, x):
        g = jax.grad(lambda xx: jnp.mean(forward(spec, params, xx, jnp.bfloat16)))(x)
        return x + g * 1e-12

    return body


timed_loop(bwd_body, raw, 3 * fwd_flops, "fwd+bwd bf16 (chained)")


# single conv layers, SAME padding so shape chains
def conv_chain(C, H, k, B_=8, label=None):
    x0 = jnp.asarray(rng.random((B_, H, H, C), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.random((k, k, C, C), np.float32) * 0.01, jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x0.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def make_body():
        def body(i, x):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn
            )

        return body

    flops = 2 * B_ * H * H * k * k * C * C
    timed_loop(
        make_body, x0, flops,
        label or f"conv {k}x{k} {C}ch @{H}^2 B{B_}",
    )


conv_chain(64, 250, 3)
conv_chain(128, 250, 3)
conv_chain(256, 125, 3)
conv_chain(64, 250, 1)
conv_chain(64, 250, 3, B_=32)

# conv as explicit matmul (im2col-free 1x1 view): batched matmul MFU ceiling
def matmul_chain(M, K, N):
    x0 = jnp.asarray(rng.random((M, K), np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.random((K, N), np.float32) * 0.01, jnp.bfloat16)

    def make_body():
        def body(i, x):
            y = jnp.dot(x, w)  # (M, N)
            return x + jnp.mean(y).astype(x.dtype) * 1e-12

        return body

    timed_loop(make_body, x0, 2 * M * K * N, f"matmul {M}x{K}x{N}")


matmul_chain(8 * 250 * 250, 576, 64)   # the 3x3 64ch conv as one matmul
matmul_chain(8 * 250 * 250, 576, 128)
matmul_chain(4096, 4096, 4096)         # MXU sanity ceiling
