"""Custom-VJP valid convolution with a packed-matmul weight gradient.

Why: the training step runs at ~14.6% MFU while the forward is 24% and
forward+input-grads 30% (NOTES.md) — XLA's conv-backprop-filter is the sink.
At this model's channel counts (64..256) XLA computes dw as a conv whose
MXU operands are a C_in x C_out corner of the 128x128 array, wasting most
of the systolic array on every tick.

The reformulation here computes ALL k^d kernel taps in ONE dot_general:

    dw[ky, kx, ci, co] = sum_{b,y,x} x[b, y+ky, x+kx, ci] * dy[b, y, x, co]

Shifting ``x`` by ``kx`` equals shifting ``dy`` by ``-kx``, so stacking the
k row-shifts of ``x`` into the M dimension (M = k*C_in) and the k
column-shifted zero-padded copies of ``dy`` into the N dimension
(N = k*C_out) yields every (ky, kx) pair as one (M, N) block of a single
matmul contracting over all pixels — the same FLOPs as the true gradient,
but on MXU tiles that are k x wider/taller. In 3D, (kz, ky) pack into M
(k^2*C_in) and kx into N.

The input gradient and forward pass keep XLA's native lowering (already at
or near the measured ceiling); only the filter gradient is overridden.

MEASURED RESULT (v5e, scripts/diag_dw.py + diag_step_dw.py): the isolated
packed dw is a wash with XLA's native filter-grad (9.6% vs 9.4% MFU at
64ch — the tall-K reduction dominates, not array-corner waste) and the
full train step REGRESSES 37.1 -> 59.9 ms because the shift/pad stacks
materialize in HBM. Default is therefore OFF (``train_config.packed_dw``);
the module stays as a tested, numerically-equivalent reference point — the
remaining headroom needs a Pallas kernel that forms the shifted operands
in VMEM rather than an XLA-level rewrite.

Numerics: equivalent to ``jax.grad`` of the plain conv (f32 accumulation
on both paths — tested in ``tests/test_conv_vjp.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


# canonical channels-last conv layout lives with the model
from ..models.unet import _dimension_numbers  # noqa: E402


def _plain_conv(x: jnp.ndarray, w: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,) * ndim,
        padding="VALID",
        dimension_numbers=_dimension_numbers(ndim),
    )


def _packed_dw(
    x: jnp.ndarray, dy: jnp.ndarray, k_sizes: Tuple[int, ...]
) -> jnp.ndarray:
    """Filter gradient of a VALID stride-1 conv as one packed dot_general.

    Args:
        x: ``(B, *spatial_in, Ci)`` primal input.
        dy: ``(B, *spatial_out, Co)`` output cotangent,
            ``spatial_out = spatial_in - (k - 1)``.
        k_sizes: kernel extent per spatial dim.

    Returns:
        ``(*k_sizes, Ci, Co)`` in ``x.dtype`` (f32 accumulation inside).
    """
    ndim = len(k_sizes)
    Ci = x.shape[-1]
    Co = dy.shape[-1]
    out_sp = dy.shape[1:-1]

    if all(k == 1 for k in k_sizes):
        dw = lax.dot_general(
            x.reshape(-1, Ci),
            dy.reshape(-1, Co),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dw.reshape(*k_sizes, Ci, Co).astype(x.dtype)

    # M-side: stack shifts of x over all spatial axes except the last
    m_axes = list(range(ndim - 1))  # spatial axes packed into M
    k_last = k_sizes[-1]
    from itertools import product

    m_shift_sets = list(product(*(range(k_sizes[a]) for a in m_axes)))
    xs = []
    for shifts in m_shift_sets:
        sl = [slice(None)]
        for a in range(ndim - 1):
            sl.append(slice(shifts[a], shifts[a] + out_sp[a]))
        sl.append(slice(None))  # last spatial axis kept FULL width
        sl.append(slice(None))  # channels
        xs.append(x[tuple(sl)])
    A = jnp.stack(xs, 0)  # (Km, B, *out_sp[:-1], W_full, Ci)

    # N-side: dy zero-padded along the last spatial axis to full width at
    # offset kx (shifting dy by -kx == shifting x by +kx)
    W_full = x.shape[ndim]  # last spatial extent of x
    W_out = out_sp[-1]
    pads = []
    for kx in range(k_last):
        pad_cfg = [(0, 0)] * dy.ndim
        pad_cfg[ndim] = (kx, W_full - W_out - kx)
        pads.append(jnp.pad(dy, pad_cfg))
    P = jnp.stack(pads, 0)  # (k_last, B, *out_sp[:-1], W_full, Co)

    # contract batch + all spatial dims: (Km, Ci, k_last, Co)
    contract = tuple(range(1, 1 + 1 + ndim))  # axes (B, *spatial)
    dw = lax.dot_general(
        A,
        P,
        ((contract, contract), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Km, Ci, k_last, Co)
    dw = jnp.moveaxis(dw, 1, -2)  # (Km, k_last, Ci, Co)
    return dw.reshape(*k_sizes, Ci, Co).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_valid_packed(x: jnp.ndarray, w: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """VALID stride-1 conv whose weight gradient uses the packed matmul."""
    return _plain_conv(x, w, ndim)


def _fwd(x, w, ndim):
    return _plain_conv(x, w, ndim), (x, w)


def _bwd(ndim, res, dy):
    x, w = res
    k_sizes = w.shape[:ndim]
    # dx: XLA's native transposed conv (input-grad path is already fast):
    # full padding with spatially-flipped, io-swapped weights
    w_flip = jnp.flip(w, axis=tuple(range(ndim))).swapaxes(-1, -2)
    dx = lax.conv_general_dilated(
        dy,
        w_flip,
        window_strides=(1,) * ndim,
        padding=tuple((k - 1, k - 1) for k in k_sizes),
        dimension_numbers=_dimension_numbers(ndim),
    ).astype(x.dtype)
    dw = _packed_dw(x, dy, tuple(int(k) for k in k_sizes))
    return dx, dw


conv_valid_packed.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Pallas VMEM-packed filter gradient (round 3)
# ---------------------------------------------------------------------------


def _default_interpret() -> bool:
    import jax as _jax

    return _jax.devices()[0].platform != "tpu"


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_valid_pallas(x: jnp.ndarray, w: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """VALID stride-1 conv whose 3x3-2D weight gradient runs in the Pallas
    VMEM-packed kernel (:mod:`.pallas_dw`); all other shapes fall back to
    XLA's native filter gradient.

    MEASURED (v5e via tunnel, scripts/diag_dw_pallas.py): at Ci=Co=64 the
    kernel LOSES to XLA (3.94 vs 2.18 ms — the VPU relayout stores that
    pack the taps cost more than the MXU-shape win); at Ci=Co=192 it ties
    (2.36 vs 2.24 ms). Opt-in via ``train_config.pallas_dw``; see the
    NOTES.md round-3 roofline post-mortem for why ~2 ms/conv is this
    chip's floor (narrow-lane HBM layout, not MXU shape).
    """
    return _plain_conv(x, w, ndim)


def _pallas_fwd(x, w, ndim):
    return _plain_conv(x, w, ndim), (x, w)


def _pallas_bwd(ndim, res, dy):
    x, w = res
    k_sizes = tuple(int(k) for k in w.shape[:ndim])
    # dx: XLA's native input-grad path (at/near the measured ceiling)
    _, vjp_x = jax.vjp(lambda x_: _plain_conv(x_, w, ndim), x)
    (dx,) = vjp_x(dy)
    if ndim == 2 and k_sizes == (3, 3):
        from .pallas_dw import conv3x3_dw

        dw = conv3x3_dw(x, dy, interpret=_default_interpret()).astype(w.dtype)
    else:
        _, vjp_w = jax.vjp(lambda w_: _plain_conv(x, w_, ndim), w)
        (dw,) = vjp_w(dy)
    return dx.astype(x.dtype), dw


conv_valid_pallas.defvjp(_pallas_fwd, _pallas_bwd)
