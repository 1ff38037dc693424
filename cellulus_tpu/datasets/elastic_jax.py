"""Elastic augmentation ON DEVICE: the warp as a jittable transform.

Same parameter model as the host path (:mod:`.elastic`, mirroring
gunpowder's ElasticAugment as used by the reference,
``datasets/zarr_dataset.py:123-132``): rotation in [0, pi/2) acting in the
trailing (y, x) plane, scale in [0.9, 1.1), a smooth displacement field from
jittered control points (upsampled twice, subsample factor 4), reverse
mapping with bilinear interpolation and reflect boundary handling.

Fusing the warp into the jitted train step removes the single biggest
host-CPU cost from the data workers (scipy map_coordinates + zoom per crop)
and lets ``transfer_precision="native"`` ship raw uint8 even with
augmentation on: the host only reads padded crops (VERDICT round 1 item 8).
Parity with the host path is distributional (same parameter model, same
interpolation order), not bit-exact — RNG streams differ; the grid math is
tested equal given identical parameters.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .elastic import ROTATION_INTERVAL, SCALE_INTERVAL, SUBSAMPLE


def _resize_linear(x: jnp.ndarray, shape: Tuple[int, ...]) -> jnp.ndarray:
    """scipy ``zoom(order=1, grid_mode=True, mode="nearest")`` equivalence:
    half-pixel-aligned linear resize with edge clamping."""
    return jax.image.resize(x, shape, method="linear")


def deformation_grid(
    crop_size: Tuple[int, ...],
    padded_spatial: Tuple[int, ...],
    rotation: jnp.ndarray,
    scale: jnp.ndarray,
    control_points: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Reverse-mapping sample grid ``(D, *crop)`` in padded-source coords.

    Mirrors the host grid construction (:func:`.elastic.elastic_deform`)
    step for step.
    """
    ndim = len(crop_size)
    axes = [
        jnp.arange(s, dtype=jnp.float32) - (s - 1) / 2.0 for s in crop_size
    ]
    grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=0)

    cos, sin = jnp.cos(rotation), jnp.sin(rotation)
    gy, gx = grid[-2], grid[-1]
    grid = grid.at[-2].set(cos * gy - sin * gx)
    grid = grid.at[-1].set(sin * gy + cos * gx)
    grid = grid / scale

    if control_points is not None:
        sub_shape = tuple(max(2, s // SUBSAMPLE) for s in crop_size)
        disp_sub = jnp.stack(
            [_resize_linear(control_points[d], sub_shape) for d in range(ndim)]
        )
        disp = jnp.stack(
            [_resize_linear(disp_sub[d], crop_size) for d in range(ndim)]
        )
        grid = grid + disp

    centers = jnp.asarray(
        [(p - 1) / 2.0 for p in padded_spatial], jnp.float32
    ).reshape((ndim,) + (1,) * ndim)
    return grid + centers


def _reflect_index(idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """scipy mode="reflect" (d c b a | a b c d | d c b a) index folding."""
    period = 2 * size
    idx = jnp.mod(idx, period)
    idx = jnp.where(idx >= size, period - 1 - idx, idx)
    return idx


def map_coordinates_linear(
    image: jnp.ndarray, grid: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear/trilinear sampling with reflect boundaries.

    Args:
        image: ``(*padded_spatial,)``.
        grid: ``(D, *crop)`` sample coordinates.

    Returns:
        ``(*crop,)`` interpolated values (float32).
    """
    ndim = grid.shape[0]
    lo = jnp.floor(grid).astype(jnp.int32)  # (D, *crop)
    frac = grid - lo

    out = jnp.zeros(grid.shape[1:], jnp.float32)
    for corner in range(1 << ndim):
        idx = []
        weight = jnp.ones(grid.shape[1:], jnp.float32)
        for d in range(ndim):
            bit = (corner >> d) & 1
            idx_d = lo[d] + bit
            idx.append(_reflect_index(idx_d, image.shape[d]))
            weight = weight * jnp.where(bit, frac[d], 1.0 - frac[d])
        out = out + weight * image[tuple(idx)].astype(jnp.float32)
    return out


def elastic_deform_device(
    padded: jnp.ndarray,
    crop_size: Tuple[int, ...],
    control_point_spacing: int,
    control_point_jitter: float,
    key: jnp.ndarray,
) -> jnp.ndarray:
    """Deform one padded crop on device (traceable; vmap over a batch).

    Args:
        padded: ``(C, *padded_spatial)`` source crop (any dtype; output is
            float32 in source units — normalize afterwards).

    Returns:
        ``(C, *crop_size)`` deformed crop, float32.
    """
    ndim = len(crop_size)
    k_rot, k_scale, k_cp = jax.random.split(key, 3)
    rotation = jax.random.uniform(
        k_rot, (), minval=ROTATION_INTERVAL[0], maxval=ROTATION_INTERVAL[1]
    )
    scale = jax.random.uniform(
        k_scale, (), minval=SCALE_INTERVAL[0], maxval=SCALE_INTERVAL[1]
    )
    control_points = None
    if control_point_jitter > 0:
        n_cp = tuple(
            max(2, int(math.ceil(s / control_point_spacing)) + 1)
            for s in crop_size
        )
        control_points = (
            jax.random.normal(k_cp, (ndim, *n_cp), jnp.float32)
            * control_point_jitter
        )

    grid = deformation_grid(
        crop_size, padded.shape[1:], rotation, scale, control_points
    )
    return jax.vmap(lambda ch: map_coordinates_linear(ch, grid))(padded)


def elastic_deform_batch(
    crop_size: Tuple[int, ...],
    control_point_spacing: int,
    control_point_jitter: float,
):
    """Batched channels-last deform: ``(B, *padded, C), key -> (B, *crop, C)``
    (one independent deformation per batch element). Traceable; composes
    with the jitted train step."""

    def fn(raw: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
        keys = jax.random.split(key, raw.shape[0])

        def one(x, k):
            out = elastic_deform_device(
                jnp.moveaxis(x, -1, 0),
                crop_size,
                control_point_spacing,
                control_point_jitter,
                k,
            )
            return jnp.moveaxis(out, 0, -1)

        return jax.vmap(one)(raw, keys)

    return fn
