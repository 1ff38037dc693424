"""Connected components and size filtering (host side).

Replaces ``skimage.measure.label`` / reference ``utils/misc.py:11-25`` with a
scipy-based implementation (skimage semantics: full connectivity — 8 in 2D,
26 in 3D — and labels relabeled consecutively from 1).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi


def label(array: np.ndarray) -> np.ndarray:
    """Connected-component labeling of ``array != 0`` with full connectivity.

    Components of *different* input ids stay separate components (matching
    ``skimage.measure.label`` on an id image, where each distinct value forms
    its own components).
    """
    structure = np.ones((3,) * array.ndim, dtype=bool)
    out = np.zeros(array.shape, dtype=np.int32)
    next_label = 0
    for value in np.unique(array):
        if value == 0:
            continue
        comp, n = ndi.label(array == value, structure=structure)
        mask = comp > 0
        out[mask] = comp[mask] + next_label
        next_label += n
    return out


def size_filter(
    segmentation: np.ndarray, min_size: int, filter_non_connected: bool = True
) -> np.ndarray:
    """Drop components smaller than ``min_size`` pixels, then relabel
    (reference ``utils/misc.py:11-25``)."""
    if min_size == 0:
        return segmentation

    filter_labels = label(segmentation) if filter_non_connected else segmentation
    ids, sizes = np.unique(filter_labels, return_counts=True)
    small = ids[sizes < min_size]
    segmentation = segmentation.copy()
    segmentation[np.isin(filter_labels, small)] = 0
    return label(segmentation)
