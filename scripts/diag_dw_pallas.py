"""On-chip benchmark: Pallas VMEM packed dw vs XLA's native filter grad.

Run after scripts/diag_dw_shapes.py (which calibrates what each dot shape
can deliver). Times the real model layer shapes; NOTES.md timing rules
(chained fori_loop + d2h fence).

Usage: python scripts/diag_dw_pallas.py
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
from cellulus_tpu.models.unet import _dimension_numbers
from cellulus_tpu.ops.pallas_dw import conv3x3_dw

cellulus_tpu.enable_compilation_cache()

print("device_kind:", jax.devices()[0].device_kind, flush=True)
ITERS = 20
rng = np.random.default_rng(0)


def timed(label, state0, step, fetch, flops):
    @jax.jit
    def loop(s):
        return lax.fori_loop(0, ITERS, lambda i, s: step(s), s)

    s = loop(state0)
    float(fetch(s))
    t0 = time.perf_counter()
    s = loop(s)
    float(fetch(s))
    t = (time.perf_counter() - t0) / ITERS
    tf = flops / t / 1e12
    print(
        f"{label:40s} {t * 1e3:8.3f} ms  {tf:7.2f} TFLOP/s "
        f"({100 * tf / 197:.1f}% nominal)",
        flush=True,
    )
    return t


def bench_layer(B, H, Ci, Co):
    # operands thread through the loop state (no embedded constants — the
    # remote-compile request has a size limit) and all operands stay bf16
    x = jnp.asarray(rng.standard_normal((B, H, H, Ci)), jnp.bfloat16)
    g = jnp.asarray(
        rng.standard_normal((B, H - 2, H - 2, Co)), jnp.bfloat16
    )
    flops = 2 * 9 * Ci * Co * B * (H - 2) * (H - 2)
    w0 = jnp.zeros((3, 3, Ci, Co), jnp.bfloat16)

    def conv(x_, w):
        return lax.conv_general_dilated(
            x_, w, (1, 1), "VALID", dimension_numbers=_dimension_numbers(2),
        )

    def native_step(s):
        x_, g_, w = s
        # w-derived, value-neutral input pert (LICM guard, see diag_dw._pert)
        pert = (w[0, 0, 0, 0].astype(jnp.float32) * 1e-24).astype(jnp.bfloat16)
        dw = jax.grad(
            lambda w: (conv(x_ + pert, w).astype(jnp.float32)
                       * g_.astype(jnp.float32)).sum()
        )(w)
        return (x_, g_, (w + dw * 1e-12).astype(jnp.bfloat16))

    def pallas_step(s):
        x_, g_, w = s
        # *0 was constant-foldable; a 1e-24-scaled value is not, and still
        # rounds away in bf16
        pert = (w[0, 0, 0, 0].astype(jnp.float32) * 1e-24).astype(jnp.bfloat16)
        dw = conv3x3_dw(x_ + pert, g_)
        return (x_, g_, (w + dw * 1e-12).astype(jnp.bfloat16))

    fetch = lambda s: s[2][0, 0, 0, 0].astype(jnp.float32)
    timed(f"XLA native dw  {Ci}->{Co} B{B} {H}^2", (x, g, w0), native_step,
          fetch, flops)
    timed(f"Pallas packed dw {Ci}->{Co} B{B} {H}^2", (x, g, w0), pallas_step,
          fetch, flops)

    # numerics on-chip (compiled, not interpret)
    dw_p = np.asarray(jax.jit(conv3x3_dw)(x, g))
    dw_n = np.asarray(
        jax.jit(
            lambda x_, g_: jax.grad(
                lambda w: (conv(x_, w).astype(jnp.float32)
                           * g_.astype(jnp.float32)).sum()
            )(jnp.zeros((3, 3, Ci, Co), jnp.bfloat16))
        )(x, g)
    )
    rel = np.abs(dw_p - dw_n) / (np.abs(dw_n) + 1e-3)
    print(f"  on-chip numerics: max rel diff {rel.max():.2e}", flush=True)


def main():
    bench_layer(8, 248, 64, 64)    # level-1 3x3 (64 fmaps)
    bench_layer(8, 120, 192, 192)  # level-2 3x3 (fmap_inc 3)


if __name__ == "__main__":
    main()
