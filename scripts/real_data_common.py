"""Shared derivations for the TissueNet study scripts.

run_real_tissuenet.py (train+infer) and sweep_detect_tissuenet.py
(re-clustering sweeps on the saved embeddings) must derive IDENTICAL
object_size / upsampled GT, or the sweep's scores stop being comparable
to the run's — keep the single source of truth here.
"""

from __future__ import annotations

import numpy as np


def gt_upsample(gt: np.ndarray, k) -> np.ndarray:
    """Nearest-neighbour k-x upsample of instance labels (trailing 2 dims).

    Integral ``k`` keeps the original exact ``np.repeat`` (bit-stable with
    every committed result); fractional ``k`` (the paper's Table-2 scale
    sweep, BASELINE.md:28) uses order-0 ``ndimage.zoom``.
    """
    if float(k).is_integer():
        k = int(k)
        return np.repeat(np.repeat(gt, k, axis=-2), k, axis=-1)
    from scipy import ndimage

    zoom = [1] * (gt.ndim - 2) + [float(k), float(k)]
    return ndimage.zoom(gt, zoom, order=0)


def derive_object_size(gt: np.ndarray, k) -> int:
    """Median-instance-area equivalent diameter at scale ``k`` (the same
    derivation the reference's demos do by eye from the data)."""
    areas = np.concatenate(
        [np.bincount(g.ravel().astype(np.int64))[1:] for g in gt]
    )
    areas = areas[areas > 0] * float(k) * float(k)
    return int(round(2.0 * np.sqrt(np.median(areas) / np.pi)))
