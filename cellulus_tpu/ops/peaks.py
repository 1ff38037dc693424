"""Local-maximum peak detection (skimage ``peak_local_max`` semantics).

Used to seed mean-shift from minima of the smoothed offset-magnitude field
(reference ``detect.py:128-132``): peaks of the *negated* smoothed magnitude.
Semantics of ``peak_local_max(image)`` with defaults: 3^d maximum filter,
border of width 1 excluded, coordinates sorted by peak intensity descending.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi


def peak_local_max(image: np.ndarray, min_distance: int = 1) -> np.ndarray:
    """Return ``(P, ndim)`` integer peak coordinates (row-major order, i.e.
    (y, x) in 2D), intensity-descending."""
    size = 2 * min_distance + 1
    maxed = ndi.maximum_filter(image, size=size, mode="constant", cval=-np.inf)
    mask = image == maxed
    # exclude borders of width min_distance
    for d in range(image.ndim):
        sl = [slice(None)] * image.ndim
        sl[d] = slice(0, min_distance)
        mask[tuple(sl)] = False
        sl[d] = slice(image.shape[d] - min_distance, image.shape[d])
        mask[tuple(sl)] = False
    coords = np.argwhere(mask)
    if len(coords) == 0:
        return coords.astype(np.int64)
    values = image[tuple(coords.T)]
    order = np.argsort(-values, kind="stable")
    return coords[order]


# ---------------------------------------------------------------------------
# Device path: gaussian smoothing (separable shifts) + peak mask (max pool)
# in ONE jitted dispatch. Replaces the per-sample host scipy
# gaussian_filter + peak_local_max of the seeded detect variant
# (reference ``detect.py:128-132``) — on the 1-core host those serialized
# against every other stage; here only the tiny argwhere stays on host.
# ---------------------------------------------------------------------------

from functools import lru_cache  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage's kernel: exp(-x^2/(2 sigma^2)) normalized to sum 1."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@lru_cache(maxsize=16)
def _smooth_peak_kernel(ndim: int, sigma: float, min_distance: int):
    radius = int(4.0 * sigma + 0.5)  # scipy truncate=4.0 default
    weights = jnp.asarray(_gaussian_kernel1d(sigma, radius))

    @jax.jit
    def run(image):
        # separable gaussian, scipy mode='reflect' == numpy 'symmetric'
        sm = image
        for ax in range(ndim):
            pad = [(0, 0)] * ndim
            pad[ax] = (radius, radius)
            p = jnp.pad(sm, pad, mode="symmetric")

            def sl(t):
                idx = [slice(None)] * ndim
                idx[ax] = slice(t, t + sm.shape[ax])
                return p[tuple(idx)]

            # scipy correlate1d's symmetric-kernel order: center tap first,
            # then paired taps outward — matching its f32 rounding exactly
            acc = weights[radius] * sl(radius)
            for k in range(1, radius + 1):
                acc = acc + weights[radius + k] * (
                    sl(radius + k) + sl(radius - k)
                )
            sm = acc
        # peaks of the NEGATED smooth field (seeds sit at offset minima):
        # 3^d max filter with -inf borders (scipy mode='constant', cval=-inf)
        neg = -sm
        size = 2 * min_distance + 1
        padded = jnp.pad(
            neg,
            [(min_distance, min_distance)] * ndim,
            mode="constant",
            constant_values=-jnp.inf,
        )
        maxed = jax.lax.reduce_window(
            padded,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(size,) * ndim,
            window_strides=(1,) * ndim,
            padding="VALID",
        )
        mask = neg == maxed
        # exclude borders of width min_distance (peak_local_max default)
        interior = jnp.zeros_like(mask)
        core = tuple(
            slice(min_distance, s - min_distance) for s in mask.shape
        )
        interior = interior.at[core].set(True)
        return sm, mask & interior

    return run


def smooth_peak_seeds(
    offset_magnitude: np.ndarray, sigma: float = 2.0, min_distance: int = 1
) -> np.ndarray:
    """Device-computed mean-shift seeds: ``(P, ndim)`` x-first float32
    coordinates of the local minima of the gaussian-smoothed offset
    magnitude, intensity-descending (parity with
    ``peak_local_max(-gaussian_filter(x, sigma))`` + flip, tested in
    tests/test_detect_variants.py).

    Parity contract: peak COORDINATES equal the scipy oracle's exactly
    (strict-maximum test on a value-preserving smoother); the descending
    ORDER may swap peaks whose smoothed values are ULP-ties, since the
    device gaussian and scipy's correlate1d accumulate in different
    orders. Set ``CELLULUS_TPU_CHECK_SEEDS=1`` to cross-check both
    properties against the oracle at runtime (warns on divergence)."""
    run = _smooth_peak_kernel(
        offset_magnitude.ndim, float(sigma), int(min_distance)
    )
    sm, mask = run(jnp.asarray(offset_magnitude, jnp.float32))
    mask = np.asarray(mask)
    coords = np.argwhere(mask)
    if len(coords) == 0:
        return np.zeros((0, offset_magnitude.ndim), np.float32)
    values = -np.asarray(sm)[tuple(coords.T)]
    order = np.argsort(-values, kind="stable")
    result = np.flip(coords[order], 1).astype(np.float32)

    from ..utils.env import env_flag

    if env_flag("CELLULUS_TPU_CHECK_SEEDS"):
        # debug cross-check against the scipy oracle. The contract (see
        # docstring): peak COORDINATES are exact; the intensity-descending
        # ORDER can swap among ULP-tied peaks, because the device's
        # separable shift-accumulate gaussian and scipy's correlate1d sum
        # in different orders (measured ~4/2039 swaps at |delta| <= 6e-8
        # on a real 512^2 field). Opt-in: re-runs the host path per call.
        import warnings

        expect = np.flip(
            peak_local_max(
                -ndi.gaussian_filter(
                    np.asarray(offset_magnitude, np.float32), sigma
                ),
                min_distance=min_distance,
            ),
            1,
        ).astype(np.float32)
        same_set = result.shape == expect.shape and np.array_equal(
            np.asarray(sorted(map(tuple, result.tolist()))),
            np.asarray(sorted(map(tuple, expect.tolist()))),
        )
        if not same_set:
            warnings.warn(
                f"device seed COORDINATES diverged from the scipy oracle "
                f"({result.shape[0]} vs {expect.shape[0]} peaks) — labels "
                "may differ from the reference host path",
                RuntimeWarning,
            )
        elif not np.array_equal(result, expect):
            n = int((result != expect).any(1).sum())
            warnings.warn(
                f"device seed ORDER swapped {n}/{len(result)} ULP-tied "
                "peaks vs the scipy oracle (coordinates exact; benign "
                "float-accumulation-order effect)",
                RuntimeWarning,
            )
    return result
