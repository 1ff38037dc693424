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
