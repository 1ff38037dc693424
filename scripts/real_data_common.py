"""Shared derivations for the TissueNet study scripts.

run_real_tissuenet.py (train+infer) and sweep_detect_tissuenet.py
(re-clustering sweeps on the saved embeddings) must derive IDENTICAL
object_size / upsampled GT, or the sweep's scores stop being comparable
to the run's — keep the single source of truth here.
"""

from __future__ import annotations

import numpy as np


def gt_upsample(gt: np.ndarray, k: int) -> np.ndarray:
    """Nearest-neighbour k-x upsample of instance labels (trailing 2 dims)."""
    return np.repeat(np.repeat(gt, k, axis=-2), k, axis=-1)


def derive_object_size(gt: np.ndarray, k: int) -> int:
    """Median-instance-area equivalent diameter at scale ``k`` (the same
    derivation the reference's demos do by eye from the data)."""
    areas = np.concatenate(
        [np.bincount(g.ravel().astype(np.int64))[1:] for g in gt]
    )
    areas = areas[areas > 0] * k * k
    return int(round(2.0 * np.sqrt(np.median(areas) / np.pi)))
