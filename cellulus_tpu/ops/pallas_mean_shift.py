"""Pallas TPU kernel for the mean-shift ball statistics.

Each mean-shift iteration needs, for every seed s:

    counts[s] = |{ x : |x - c_s|^2 <= bw^2 }|
    sums[s]   = sum of those x

The XLA formulation (``ops/mean_shift.py:ball_stats``) computes the
seed-to-point cross matmul on the MXU but must materialize the (S, chunk)
distance and mask matrices in HBM between the distance computation and the
weighted-sum matmul. This kernel fuses the whole epilogue in VMEM: per
(seed-tile, point-chunk) grid cell it runs

    cross   = C_tile @ X_chunk^T            (MXU, in VMEM)
    within  = d2 <= bw^2  (masked by validity)
    counts += row-sum(within)               (VPU)
    sums   += within @ X_chunk              (MXU)

so HBM traffic is just the streamed X chunks — the (S, chunk)
intermediates never leave VMEM.

Dims are padded: feature dim to 8 (zero-padded, distances unchanged), seeds
to 128, points to the chunk size. Runs in interpret mode off-TPU (used by
the CPU test suite).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SEED_TILE = 128
POINT_CHUNK = 512
DIM_PAD = 8


def _kernel(bw2_ref, c_ref, c_norm_ref, x_ref, x_norm_ref, valid_ref,
            counts_ref, sums_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sums_ref[:] = jnp.zeros_like(sums_ref)

    cross = jnp.dot(
        c_ref[:], x_ref[:].T, preferred_element_type=jnp.float32
    )  # (SEED_TILE, POINT_CHUNK)
    d2 = c_norm_ref[:] + x_norm_ref[:].T - 2.0 * cross
    within = jnp.where(
        (d2 <= bw2_ref[0, 0]) & (valid_ref[:].T > 0.5), 1.0, 0.0
    )
    counts_ref[:] += jnp.sum(within, axis=1, keepdims=True)
    sums_ref[:] += jnp.dot(within, x_ref[:], preferred_element_type=jnp.float32)


def _pallas_call_padded(bw2_arr, c, c_norm, xp, x_norm, valid, interpret):
    """Raw kernel invocation over pre-padded operands."""
    from jax.experimental import pallas as pl

    S_pad = c.shape[0]
    N_pad = xp.shape[0]
    grid = (S_pad // SEED_TILE, N_pad // POINT_CHUNK)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((SEED_TILE, DIM_PAD), lambda i, j: (i, 0)),
            pl.BlockSpec((SEED_TILE, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((POINT_CHUNK, DIM_PAD), lambda i, j: (j, 0)),
            pl.BlockSpec((POINT_CHUNK, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((POINT_CHUNK, 1), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((SEED_TILE, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((SEED_TILE, DIM_PAD), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((S_pad, DIM_PAD), jnp.float32),
        ],
        interpret=interpret,
    )(bw2_arr, c, c_norm, xp, x_norm, valid)


def make_padded_point_set(x, x_valid):
    """Pad points once (outside iteration loops): returns
    ``(xp (N_pad, 8), x_norm (N_pad, 1), valid (N_pad, 1))``."""
    N, d = x.shape
    N_pad = -(-max(N, POINT_CHUNK) // POINT_CHUNK) * POINT_CHUNK
    xp = jnp.zeros((N_pad, DIM_PAD), jnp.float32).at[:N, :d].set(x)
    valid = (
        jnp.zeros((N_pad, 1), jnp.float32)
        .at[:N, 0]
        .set(x_valid.astype(jnp.float32))
    )
    x_norm = jnp.sum(xp * xp, axis=1, keepdims=True)
    return xp, x_norm, valid


def ball_stats_padded(centers, d, xp, x_norm, valid, bw2, interpret=False):
    """Ball statistics over a pre-padded point set; ``centers (S, d)`` with
    ``S`` a multiple of SEED_TILE pads internally (cheap, per-iteration)."""
    S = centers.shape[0]
    S_pad = -(-max(S, SEED_TILE) // SEED_TILE) * SEED_TILE
    c = jnp.zeros((S_pad, DIM_PAD), jnp.float32).at[:S, :d].set(centers)
    c_norm = jnp.sum(c * c, axis=1, keepdims=True)
    bw2_arr = jnp.full((1, 1), bw2, jnp.float32)
    counts, sums = _pallas_call_padded(
        bw2_arr, c, c_norm, xp, x_norm, valid, interpret
    )
    return counts[:S, 0], sums[:S, :d]


@partial(jax.jit, static_argnames=("interpret",))
def ball_stats_pallas(centers, x, x_valid, bw2, interpret=False):
    """counts (S,), sums (S, d) of valid points within sqrt(bw2) of each
    center. ``centers (S, d)``, ``x (N, d)``, ``x_valid (N,)`` — S, N, d may
    be unpadded; padding happens here."""
    xp, x_norm, valid = make_padded_point_set(x, x_valid)
    return ball_stats_padded(
        centers, centers.shape[1], xp, x_norm, valid, bw2, interpret
    )
