"""Synthetic blob data for tests and benchmarks.

The reference test suite references a ``test_data.zarr`` it never generates
(see SURVEY.md §4); this module creates it: bright blobs (cells) on a dark
background, plus ground-truth instance labels, in the ``(s, c, [z,] y, x)``
layout with ``axis_names`` attributes.
"""

from __future__ import annotations

import numpy as np

from cellulus_tpu.io import zarr


def make_blobs(
    num_samples: int, size: int, ndim: int, seed: int = 0, num_blobs: int = 12
):
    """Return ``(raw (s, 1, *sp) uint8, labels (s, 1, *sp) uint16)``."""
    rng = np.random.default_rng(seed)
    spatial = (size,) * ndim
    raw = np.zeros((num_samples, 1, *spatial), dtype=np.float32)
    labels = np.zeros((num_samples, 1, *spatial), dtype=np.uint16)
    grid = np.stack(
        np.meshgrid(*[np.arange(s) for s in spatial], indexing="ij"), axis=0
    )
    for s in range(num_samples):
        next_id = 1
        for _ in range(num_blobs):
            radius = rng.uniform(size * 0.04, size * 0.09)
            center = rng.uniform(radius, size - radius, size=ndim)
            dist2 = np.zeros(spatial)
            for d in range(ndim):
                dist2 += (grid[d] - center[d]) ** 2
            mask = dist2 < radius**2
            if (labels[s, 0][mask] != 0).any():
                continue  # keep blobs disjoint
            labels[s, 0][mask] = next_id
            intensity = rng.uniform(0.6, 1.0)
            raw[s, 0][mask] = np.maximum(
                raw[s, 0][mask],
                intensity * np.exp(-dist2[mask] / (2 * (radius / 1.5) ** 2)),
            )
            next_id += 1
        raw[s, 0] += rng.normal(0, 0.02, spatial).clip(0)
    raw8 = (raw.clip(0, 1) * 255).astype(np.uint8)
    return raw8, labels


def make_blob_container(path, num_samples=2, size=128, ndim=2, seed=0):
    """Write train/validate/groundtruth datasets into a zarr container."""
    raw, labels = make_blobs(num_samples, size, ndim, seed)
    axis_names = ["s", "c"] + ["z", "y", "x"][-ndim:]
    f = zarr.open(path, "a")
    for name, data in (
        ("train", raw),
        ("validate", raw),
        ("groundtruth", labels),
    ):
        f[name] = data
        f[name].attrs.update(
            {"axis_names": axis_names, "resolution": [1] * ndim}
        )
    return path
