"""MXU-shape calibration for the weight-grad conv question (round 3).

The train step idles at ~14.6% MFU with the dw convs costing ~18 ms of the
36 ms step (NOTES.md). The surviving hypothesis is a VMEM-resident packed
dw kernel: one (3Ci x K) @ (K x 3Co) dot per conv instead of XLA's nine
64x64-corner per-tap dots, with the tap shifts formed IN VMEM (the XLA-level
packing materialized them in HBM and lost — ops/conv_vjp.py post-mortem).

Before writing that kernel, this script measures on-chip what each dot
shape can actually deliver at the real reduction length, answering whether
the packed shape clears the bar AT ALL on this chip:

  - M=N=64,  K=492k   per-tap dw shape (9 of these per 3x3 conv)
  - M=N=192, K=492k   packed dw shape (1 per 3x3 conv)
  - M=N=128/256, K    MXU tiling calibration
  - XLA's native conv-backprop-filter at the level-1 layer shape
  - same, level-2 (after 2x2 pool, Ci=Co=192 at fmap_inc=3)

Timing per NOTES.md rules: chained fori_loop (state threads through the
dot) + a REAL d2h fetch to fence (block_until_ready lies on axon).

Usage: python scripts/diag_dw_shapes.py
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

DEV = jax.devices()[0]
print("device_kind:", DEV.device_kind, flush=True)
ITERS = 20
rng = np.random.default_rng(0)


def timed(label, make_fn, flops):
    """make_fn() -> (state0, step_fn state->state, fetch state->scalar)."""
    state0, step, fetch = make_fn()

    @jax.jit
    def loop(s):
        return lax.fori_loop(0, ITERS, lambda i, s: step(s), s)

    s = loop(state0)
    float(fetch(s))  # warm + fence
    t0 = time.perf_counter()
    s = loop(s)
    float(fetch(s))
    t = (time.perf_counter() - t0) / ITERS
    tf = flops / t / 1e12
    print(
        f"{label:44s} {t * 1e3:8.3f} ms  {tf:7.2f} TFLOP/s "
        f"({100 * tf / 197:.1f}% of nominal peak)",
        flush=True,
    )
    return t


def dot_case(M, N, K):
    # operands thread through the loop STATE (jit arguments, not embedded
    # constants — constants blow the remote-compile request size limit),
    # and the chaining perturbation stays bf16 (an f32 scalar would promote
    # the whole dot off the bf16 MXU path)
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    def make():
        def step(s):
            a_, b_, out = s
            pert = (out[0, 0] * 1e-24).astype(jnp.bfloat16)
            new = jax.lax.dot_general(
                a_ + pert, b_,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (a_, b_, new)

        s0 = (a, b, jnp.zeros((M, N), jnp.float32))
        return s0, step, lambda s: s[2][0, 0]

    return make


def conv_dw_case(B, H, Ci, Co, k=3):
    x = jnp.asarray(rng.standard_normal((B, H, H, Ci)), jnp.bfloat16)
    g = jnp.asarray(
        rng.standard_normal((B, H - k + 1, H - k + 1, Co)), jnp.bfloat16
    )
    dn = lax.conv_dimension_numbers(
        (B, H, H, Ci), (k, k, Ci, Co), ("NHWC", "HWIO", "NHWC")
    )

    def conv(x_, w):
        return lax.conv_general_dilated(
            x_, w, (1, 1), "VALID", dimension_numbers=dn,
        )

    def make():
        w0 = jnp.asarray(rng.standard_normal((k, k, Ci, Co)), jnp.bfloat16)

        def step(s):
            x_, g_, w = s
            # w-derived, value-neutral input pert: the loss is linear in w,
            # so dw never reads w and the conv would otherwise be
            # loop-invariant (hoistable) — see diag_dw._pert
            pert = (
                w.reshape(-1)[0].astype(jnp.float32) * 1e-24
            ).astype(jnp.bfloat16)
            dw = jax.grad(
                lambda w: (conv(x_ + pert, w).astype(jnp.float32)
                           * g_.astype(jnp.float32)).sum()
            )(w)
            return (x_, g_, (w + dw * 1e-12).astype(jnp.bfloat16))

        return (x, g, w0), step, lambda s: s[2][0, 0, 0, 0].astype(jnp.float32)

    return make


def main():
    B, H, C = 8, 248, 64
    K = B * (H - 2) * (H - 2)
    print(f"reduction length K = {K}")
    for M in (64, 128, 192, 256, 384):
        timed(f"dot M=N={M} K={K} bf16->f32", dot_case(M, M, K),
              2 * M * M * K)
    # native XLA backprop-filter, level-1 shape (64 -> 64 ch)
    flops_dw = 2 * 9 * C * C * K
    timed(f"XLA conv dw {C}->{C} 3x3 (B{B} {H}^2)",
          conv_dw_case(B, H, C, C), flops_dw)
    # level-2 shape: after [3,1,1,3] convs + 2x2 pool: ~120^2 pixels, 192 ch
    B2, H2, C2 = 8, 120, 192
    K2 = B2 * (H2 - 2) * (H2 - 2)
    flops_dw2 = 2 * 9 * C2 * C2 * K2
    timed(f"XLA conv dw {C2}->{C2} 3x3 (B{B2} {H2}^2)",
          conv_dw_case(B2, H2, C2, C2), flops_dw2)
    for M in (192, 576):
        timed(f"dot M=N={M} K={K2} bf16->f32", dot_case(M, M, K2),
              2 * M * M * K2)


if __name__ == "__main__":
    main()
