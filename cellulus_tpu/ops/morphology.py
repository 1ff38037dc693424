"""On-device morphology: Euclidean-disk dilation/erosion and halo removal.

The reference's "cell" post-processing thresholds two Euclidean distance
transforms on the host (reference ``segment.py:41-51``):

    expanded = dtedt(seg == 0) < grow_distance
    keep     = dtedt(expanded) >= shrink_distance

Thresholded EDTs are exactly binary morphology with a Euclidean disk:
``dist(p, fg) < r``  <=>  ``p in dilate(fg, {o : |o| < r})``, and
``dist(p, ~A) >= r`` <=> ``p in erode(A, {o : |o| < r})``. Both lower to a
single conv with a disk kernel on the MXU, with zero padding reproducing
scipy's within-array distance semantics. Results are bit-identical to the
scipy path (see tests/test_morphology.py).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def disk_kernel(radius: float, ndim: int) -> np.ndarray:
    """Binary Euclidean ball: offsets with squared norm < radius^2."""
    r = max(0, int(np.ceil(radius)) - 1)
    axes = [np.arange(-r, r + 1)] * ndim
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=0)
    return ((grid**2).sum(axis=0) < radius**2).astype(np.float32)


def halo_removal_body(
    segmentation, grow_distance: float, shrink_distance: float
):
    """Traceable grow/shrink halo removal (composable inside larger jits)."""
    ndim = segmentation.ndim
    grow_k = jnp.asarray(disk_kernel(grow_distance, ndim))
    shrink_k = jnp.asarray(disk_kernel(shrink_distance, ndim))

    def conv_valid(x, k):
        x = x[None, ..., None]  # (1, *spatial, 1)
        kernel = k[..., None, None]  # (*k, 1, 1)
        dn = lax.conv_dimension_numbers(
            x.shape,
            kernel.shape,
            ("NHWC", "HWIO", "NHWC") if ndim == 2 else ("NDHWC", "DHWIO", "NDHWC"),
        )
        out = lax.conv_general_dilated(
            x, kernel, (1,) * ndim, "VALID", dimension_numbers=dn
        )
        return out[0, ..., 0]

    fg = (segmentation > 0).astype(jnp.float32)
    # out-of-array is neither foreground nor background: pad with 0s for
    # the dilation (not fg) and pad ~expanded with 0s for the erosion
    # (outside doesn't count as background either). scipy's EDT leaves
    # the all-foreground case undefined (garbage distances); here it is
    # defined as distance = inf, i.e. nothing is removed.
    rg = (grow_k.shape[0] - 1) // 2
    expanded = (
        conv_valid(jnp.pad(fg, rg, constant_values=0.0), grow_k) > 0.5
    )
    rs = (shrink_k.shape[0] - 1) // 2
    not_expanded = 1.0 - expanded.astype(jnp.float32)
    near_background = (
        conv_valid(jnp.pad(not_expanded, rs, constant_values=0.0), shrink_k)
        > 0.5
    )
    return jnp.where(near_background, 0, segmentation)


@lru_cache(maxsize=None)
def _halo_removal_fn(grow_distance: float, shrink_distance: float, ndim: int):
    del ndim  # shape-inferred by the body; kept for cache-key stability

    @jax.jit
    def run(segmentation):
        return halo_removal_body(segmentation, grow_distance, shrink_distance)

    return run


def remove_halo_device(
    segmentation: np.ndarray, grow_distance: float, shrink_distance: float
) -> np.ndarray:
    """Device-side grow/shrink halo removal; exact scipy-EDT parity."""
    seg = np.asarray(segmentation)
    run = _halo_removal_fn(float(grow_distance), float(shrink_distance), seg.ndim)
    return np.asarray(run(seg.astype(np.int32))).astype(segmentation.dtype)
