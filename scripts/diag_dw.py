"""Weight-gradient conv microbenchmarks: XLA's conv-backprop-filter vs a
packed-matmul reformulation.

The full train step runs at ~14.6% MFU while forward alone is 24% and
forward+input-grads 30% (NOTES.md): the weight-grad convs are the sink.
Hypotheses tested here, per real model layer shape:

  (a) jax.grad w.r.t. the conv weight (XLA's native backprop-filter)
  (b) packed matmul: dw[ky,kx,ci,co] as ONE dot_general contracting all
      pixels, with the 3 row-shifts of x stacked into M=3*Ci and the 3
      col-shifted zero-padded copies of dy stacked into N=3*Co
      (identity: shifting x by kx == shifting dy by -kx). Same FLOPs as
      the true dw, but M,N = 192+ so the MXU runs on full-ish tiles
      instead of the 64x64 corner XLA's filter-grad uses at C=64.
  (c) 1x1 convs: dw as an explicit (Ci, Npix) @ (Npix, Co) matmul.

Timing follows the NOTES.md measurement rule: iterations are CHAINED
inside one jitted fori_loop (w <- w + dw * 1e-12) so the runtime cannot
elide dispatches.
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
PEAK = 197e12  # v5e bf16
ITERS = 20
rng = np.random.default_rng(0)


def timed(fn, w0, flops, label):
    @jax.jit
    def loop(w):
        def body(i, w):
            dw = fn(w)
            return w + dw * 1e-12

        return lax.fori_loop(0, ITERS, body, w)

    out = loop(w0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(w0)
    jax.block_until_ready(out)
    t = (time.perf_counter() - t0) / ITERS
    print(f"{label}: {1e3 * t:.3f} ms  MFU {100 * flops / t / PEAK:.1f}%", flush=True)
    return t



def _pert(w):
    """Tiny w-derived scalar: value-neutral after bf16 rounding, but makes
    the (otherwise w-independent) filter-grad INPUT depend on the loop
    carry — the loss is linear in w, so dw never reads w and XLA's
    while-loop LICM could hoist the whole conv/dot out of the fori_loop,
    timing an empty loop (the elision failure NOTES.md warns about)."""
    return (w.reshape(-1)[0].astype(jnp.float32) * 1e-24).astype(jnp.bfloat16)

def dn(ndim=2):
    return lax.conv_dimension_numbers(
        (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
    )


def bench_layer(B, H, Ci, Co, k):
    x = jnp.asarray(rng.random((B, H, H, Ci), np.float32), jnp.bfloat16)
    Hp = H - (k - 1)
    dy = jnp.asarray(rng.random((B, Hp, Hp, Co), np.float32), jnp.bfloat16)
    w0 = jnp.asarray(rng.random((k, k, Ci, Co), np.float32) * 0.01, jnp.bfloat16)
    flops = 2 * B * Hp * Hp * k * k * Ci * Co
    print(
        f"\n-- layer {k}x{k} {Ci}->{Co} @{H}^2 B{B}: dw flops {flops / 1e9:.1f} G",
        flush=True,
    )

    # (a) XLA native filter grad
    def native(w):
        xp = x + _pert(w)
        f = lambda ww: jnp.sum(
            lax.conv_general_dilated(
                xp, ww, (1, 1), "VALID", dimension_numbers=dn()
            ).astype(jnp.float32)
            * dy.astype(jnp.float32)
        )
        return jax.grad(f)(w).astype(w.dtype)

    timed(native, w0, flops, "  native jax.grad dw")

    if k == 1:
        # (c) explicit matmul
        def mm(w):
            a = (x + _pert(w)).reshape(-1, Ci)
            b = dy.reshape(-1, Co)
            dw = jax.lax.dot_general(
                a,
                b,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return dw.reshape(1, 1, Ci, Co).astype(w.dtype) + w * 0

        timed(mm, w0, flops, "  matmul dw (1x1)")
        return

    # (b) packed matmul
    def packed(w):
        xp = x + _pert(w)
        # A[ky] = xp[:, ky:ky+Hp, :, :]  -> (3, B, Hp, W, Ci)
        A = jnp.stack([xp[:, ky : ky + Hp] for ky in range(k)], 0)
        # P[kx][..., x, :] = dy[..., x-kx, :] zero-padded to width H
        P = jnp.stack(
            [
                jnp.pad(dy, ((0, 0), (0, 0), (kx, H - Hp - kx), (0, 0)))
                for kx in range(k)
            ],
            0,
        )
        # contract (B, Hp, W): (k, Ci, k, Co) with M=(k,Ci), N=(k,Co)
        dw = jax.lax.dot_general(
            A,
            P,
            (((1, 2, 3), (1, 2, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (k, Ci, k, Co)
        return dw.transpose(0, 2, 1, 3).astype(w.dtype) + w * 0

    timed(packed, w0, flops, "  packed matmul dw")


def bench_splitk(B, H, Ci, Co, k, G=8):
    """dw with the K (pixel) contraction split into G batched partials:
    exposes cross-pass parallelism XLA may not extract from one tall dot."""
    x = jnp.asarray(rng.random((B, H, H, Ci), np.float32), jnp.bfloat16)
    Hp = H - (k - 1)
    dy = jnp.asarray(rng.random((B, Hp, Hp, Co), np.float32), jnp.bfloat16)
    w0 = jnp.asarray(rng.random((k, k, Ci, Co), np.float32) * 0.01, jnp.bfloat16)
    flops = 2 * B * Hp * Hp * k * k * Ci * Co

    def splitk(w):
        xp = x + _pert(w)
        A = jnp.stack([xp[:, ky : ky + Hp] for ky in range(k)], 0)
        P = jnp.stack(
            [
                jnp.pad(dy, ((0, 0), (0, 0), (kx, H - Hp - kx), (0, 0)))
                for kx in range(k)
            ],
            0,
        )
        # regroup batch into G contraction groups: (k, G, B/G, Hp, W, C)
        A = A.reshape(k, G, B // G if B >= G else 1, *A.shape[2:])
        P = P.reshape(k, G, B // G if B >= G else 1, *P.shape[2:])
        part = jax.lax.dot_general(
            A,
            P,
            (((2, 3, 4), (2, 3, 4)), ((1,), (1,))),
            preferred_element_type=jnp.float32,
        )  # (G, k, Ci, k, Co)
        dw = jnp.sum(part, axis=0)
        return dw.transpose(0, 2, 1, 3).astype(w.dtype) + w * 0

    timed(splitk, w0, flops, f"  split-K({G}) packed dw {k}x{k} {Ci}->{Co} @{H}^2")


# real model layer shapes (num_fmaps=64, inc=3, 252^2 crop, B=8)
bench_layer(8, 250, 64, 64, 3)  # level0 down conv3 (and conv0 is 1->64)
bench_layer(8, 122, 64, 192, 3)  # level1 conv0 (after pool, approx sizes)
bench_layer(8, 118, 192, 192, 3)  # level1 conv3
bench_splitk(8, 250, 64, 64, 3, G=8)
bench_splitk(8, 250, 64, 64, 3, G=4)
bench_layer(8, 236, 64, 64, 1)  # 1x1 convs at level0
bench_layer(8, 118, 192, 192, 1)  # 1x1 convs at level1
