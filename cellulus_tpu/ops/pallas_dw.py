"""VMEM-resident Pallas weight-gradient kernel for VALID 3x3 convs.

The last identified headroom in the train step (NOTES.md round-2
post-mortem): XLA computes the filter gradient of a C=64 conv as nine
tall-K dots on a 64x64 corner of the 128x128 MXU (<=25% array
utilization), and the XLA-level packed rewrite (ops/conv_vjp.py) lost
because its shift/pad operand stacks materialized in HBM.

This kernel forms the packed operands IN VMEM, paying 1x HBM traffic:

    dw[ky, kx, ci, co] = sum_{b,y,x} x[b, y, x+kx, ci] * g[b, y-ky, x, co]

Per grid step (one batch item, TR rows of x):
  - the x block arrives via the normal Pallas pipeline,
  - a (TR+2)-row halo slab of the zero-padded cotangent is DMA'd from HBM,
  - the 3 column shifts of x concat into ``Xp (TR*Wo, 3*Ci)`` and the 3
    row shifts of g into ``Gp (TR*Wo, 3*Co)`` — pure VMEM data movement,
  - ONE ``Xp^T @ Gp`` dot (M=3Ci, N=3Co) accumulates all 9 taps into the
    f32 output block: at Ci=64 the MXU runs 192x192 tiles (~56% array
    utilization vs 25%), at Ci=192 576x576 (~81%).

The identity behind the packing: shifting ``x`` by +kx over the pixel sum
equals shifting ``g`` by -kx, so the (kx, ky) cross product factorizes
into an M-side stack (kx with ci) times an N-side stack (ky with co) —
see ops/conv_vjp.py:61-75 for the XLA-level derivation this reuses.

2D NHWC bf16/f32 only; callers fall back to XLA's native filter gradient
for other ranks/kernel sizes (models/unet.py uses 3x3 for every non-1x1
conv, reference ``model.py`` via funlib unet [3,1,1,3] kernel pattern).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tr(H: int, W: int, Ci: int, Co: int, budget_bytes: int = 5 << 20):
    # budget leaves room for Mosaic's stack copies of the packed operands
    # (the dot loads xp/gp as vectors on top of the scratch buffers) within
    # the 16 MB scoped-vmem limit
    """Rows of x per grid step: fit x block + g slab + packed operands in
    VMEM within ``budget_bytes``."""
    Wo = W - 2
    # TR must be a multiple of 8 (sublane tiling + the 8-row halo input)
    for tr in (64, 48, 32, 24, 16, 8):
        per_row = (
            W * Ci * 2          # x block row
            + Wo * Co * 2       # g slab row
            + Wo * 3 * Ci * 2   # Xp row
            + Wo * 3 * Co * 2   # Gp row
        )
        if tr * per_row + 2 * Wo * Co * 2 <= budget_bytes:
            return tr
    return 8


@lru_cache(maxsize=64)
def _dw_kernel(B: int, H: int, W: int, Ci: int, Co: int, interpret: bool):
    # pixel-domain width padded to the sublane tile (8): the halo DMA
    # slices the HBM memref, and Mosaic requires slice extents on the
    # second-minor dim to be 8-aligned; the zero-padded g columns multiply
    # real x values by zero, so the dot is unchanged
    Wo = -(-(W - 2) // 8) * 8
    W = Wo + 2  # callers pad x to this width
    TR = _pick_tr(H, W, Ci, Co)
    Hp = -(-H // TR) * TR  # x rows padded to a multiple of TR
    n_r = Hp // TR

    def kernel(x_ref, gm_ref, gh_ref, out_ref, xp_buf, gp_buf):
        # pack the kx shifts of x via VMEM scratch STORES (a lane-dim
        # jnp.concatenate of shifted slices trips Mosaic's "offset mismatch
        # on non-concat dimension" — stores relayout instead)
        xblk = x_ref[0]  # (TR, W, Ci)
        for kx in range(3):
            xp_buf[:, :, kx * Ci : (kx + 1) * Ci] = xblk[:, kx : Wo + kx, :]
        xp = xp_buf[:].reshape(TR * Wo, 3 * Ci)

        # Gp[y, ky*Co+co] = gpad[r0 + y + (2 - ky)] — rows [r0, r0+TR) come
        # from the main block, the 2 rows past the block edge from the
        # pre-gathered halo input (a manual HBM DMA of the slab is not
        # lowerable here: Mosaic requires 8/128-aligned slice extents and
        # Co=64 < 128)
        gm = gm_ref[0]  # (TR, Wp, Co)
        gh = gh_ref[0]  # (8, Wp, Co): gpad rows [r0+TR, r0+TR+8)
        for ky in range(3):
            s = 2 - ky
            if s == 0:
                gp_buf[:, :, ky * Co : (ky + 1) * Co] = gm
            else:
                gp_buf[0 : TR - s, :, ky * Co : (ky + 1) * Co] = gm[s:TR]
                gp_buf[TR - s : TR, :, ky * Co : (ky + 1) * Co] = gh[0:s]
        gp = gp_buf[:].reshape(TR * Wo, 3 * Co)

        prod = jax.lax.dot_general(
            xp,
            gp,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3Ci, 3Co)

        @pl.when(
            jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
        )
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += prod

    grid = (B, n_r)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, TR, W, Ci),
                lambda b, r: (b, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TR, Wo, Co),
                lambda b, r: (b, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, Wo, Co),
                lambda b, r: (b, r, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3 * Ci, 3 * Co), lambda b, r: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3 * Ci, 3 * Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TR, Wo, 3 * Ci), jnp.bfloat16),
            pltpu.VMEM((TR, Wo, 3 * Co), jnp.bfloat16),
        ],
        interpret=interpret,
    ), (Hp, TR)


def conv3x3_dw(
    x: jnp.ndarray, g: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """Filter gradient of a VALID stride-1 3x3 conv (2D, channels-last).

    Args:
        x: ``(B, H, W, Ci)`` primal input (bf16 or f32; computed in bf16).
        g: ``(B, H-2, W-2, Co)`` output cotangent.

    Returns:
        ``(3, 3, Ci, Co)`` float32 — numerically equivalent to
        ``jax.grad`` of the plain conv with f32 accumulation
        (tests/test_pallas_dw.py).
    """
    B, H, W, Ci = x.shape
    Ho, Wo = H - 2, W - 2
    Co = g.shape[-1]
    assert g.shape == (B, Ho, Wo, Co), (x.shape, g.shape)

    call, (Hp, TR) = _dw_kernel(B, H, W, Ci, Co, interpret)
    Wp = -(-Wo // 8) * 8  # kernel's padded pixel-domain width
    n_r = Hp // TR
    xb = x.astype(jnp.bfloat16)
    if Hp != H or Wp + 2 != W:
        xb = jnp.pad(xb, ((0, 0), (0, Hp - H), (0, Wp + 2 - W), (0, 0)))
    # gpad[b, i] = g[b, i-2], zero elsewhere; Hp+TR rows so the per-block
    # 8-row halo gather below never reads out of range
    gpad = jnp.pad(
        g.astype(jnp.bfloat16),
        ((0, 0), (2, Hp + TR - 2 - Ho), (0, Wp - Wo), (0, 0)),
    )  # (B, Hp + TR, Wp, Co)
    g_main = gpad[:, :Hp]
    # halo[b, r*8 + j] = gpad[b, (r+1)*TR + j]: the 8 rows past each
    # block's edge, laid out so a plain (8, Wp, Co) BlockSpec at index r
    # fetches block r's halo (no overlapping blocks, no manual DMA)
    halo = (
        gpad[:, TR : TR + n_r * TR]
        .reshape(B, n_r, TR, Wp, Co)[:, :, :8]
        .reshape(B, n_r * 8, Wp, Co)
    )
    out = call(xb, g_main, halo)  # (3Ci, 3Co): [kx*Ci+ci, ky*Co+co]
    dw = out.reshape(3, Ci, 3, Co).transpose(2, 0, 1, 3)  # (ky, kx, Ci, Co)
    return dw


def _np_reference_dw(x: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Slow numpy oracle for tests."""
    B, H, W, Ci = x.shape
    Ho, Wo = H - 2, W - 2
    Co = g.shape[-1]
    dw = np.zeros((3, 3, Ci, Co), np.float32)
    for ky in range(3):
        for kx in range(3):
            xs = x[:, ky : ky + Ho, kx : kx + Wo, :].reshape(-1, Ci)
            gs = g.reshape(-1, Co)
            dw[ky, kx] = xs.T.astype(np.float32) @ gs.astype(np.float32)
    return dw
