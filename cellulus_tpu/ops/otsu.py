"""Otsu thresholding (skimage ``threshold_otsu`` semantics, 256 bins).

Used to split the TTA-uncertainty channel into foreground/background
(reference ``detect.py:88-91`` via ``skimage.filters.threshold_otsu``).
Provided both as numpy (host) and jax (device) implementations with
identical semantics: 256-bin histogram over [min, max], maximize
inter-class variance, return the bin center.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def threshold_otsu(image: np.ndarray, nbins: int = 256) -> float:
    image = np.asarray(image).ravel()
    counts, edges = np.histogram(image, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2
    counts = counts.astype(np.float64)

    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    m1 = np.cumsum(counts * centers) / np.maximum(w1, 1e-12)
    m2 = (np.cumsum((counts * centers)[::-1]) / np.maximum(w2[::-1], 1e-12))[::-1]
    variance12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    idx = int(np.argmax(variance12))
    return float(centers[idx])


def threshold_otsu_jax(image: jnp.ndarray, nbins: int = 256) -> jnp.ndarray:
    """Device-side Otsu; jit-compatible. Returns a scalar array."""
    flat = image.ravel()
    lo = jnp.min(flat)
    hi = jnp.max(flat)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    # histogram with traced range: bucketize manually
    scaled = (flat - lo) / span * nbins
    idx = jnp.clip(scaled.astype(jnp.int32), 0, nbins - 1)
    counts = jnp.zeros((nbins,), jnp.float32).at[idx].add(1.0)
    edges = lo + span * jnp.arange(nbins + 1) / nbins
    centers = (edges[:-1] + edges[1:]) / 2

    w1 = jnp.cumsum(counts)
    w2 = jnp.cumsum(counts[::-1])[::-1]
    m1 = jnp.cumsum(counts * centers) / jnp.maximum(w1, 1e-12)
    m2 = (jnp.cumsum((counts * centers)[::-1]) / jnp.maximum(w2[::-1], 1e-12))[::-1]
    variance12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    best = jnp.argmax(variance12)
    return centers[best]
