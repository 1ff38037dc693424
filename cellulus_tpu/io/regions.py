"""Boundary-aware region reads shared by the training sampler and the
streaming tiled-inference scheduler."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def read_reflect_region(
    read_fn,
    spatial: Sequence[int],
    origin: Sequence[int],
    size: Sequence[int],
    dtype=np.float32,
) -> np.ndarray:
    """Read ``(C, *size)`` at ``origin`` (spatial coords, may be negative or
    stick out), reflecting at the dataset boundary.

    Args:
        read_fn: ``read_fn(lo, hi) -> (C, *(hi - lo))`` for in-bounds
            ``lo``/``hi`` spatial corner tuples.
        spatial: full spatial extent.
    """
    lo = [max(0, o) for o in origin]
    hi = [min(sp, o + s) for o, s, sp in zip(origin, size, spatial)]
    data = np.asarray(read_fn(tuple(lo), tuple(hi)), dtype=dtype)
    pad = [(0, 0)] + [
        (lo_d - o, (o + s) - hi_d)
        for o, s, lo_d, hi_d in zip(origin, size, lo, hi)
    ]
    if any(p != (0, 0) for p in pad):
        data = np.pad(data, pad, mode="reflect")
    return data
