"""Anchor/reference pixel-pair sampling.

Reference parity (``datasets/zarr_dataset.py:177-248``):

- anchors are uniform integer coordinates in ``[kappa, output - kappa]``
  (inclusive) per spatial dim, ``num_anchors = density * unbiased[0] *
  unbiased[1]`` (only the first two dims, even in 3D — reference
  ``zarr_dataset.py:244-245``),
- each anchor is repeated ``num_references = density * kappa^2 * pi`` times,
- reference pixels are ``anchor + offset`` with the offset drawn uniformly
  from the non-zero integer lattice points strictly inside the kappa-disk.

The reference draws offsets by rejection sampling; here the valid offset
lattice is precomputed once (it is a static set), and sampling is a single
uniform index draw — equivalent in distribution, and jit-friendly because
all shapes are static.

Coordinates are x-first: component 0 is x (fastest-varying axis), matching
the reference's gather convention (``models/unet.py:108-124``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import numpy as np


def disk_offsets(radius: float, num_spatial_dims: int) -> np.ndarray:
    """All non-zero integer offsets with squared norm < radius^2, ``(M, D)``."""
    r = int(math.ceil(radius))
    axes = [np.arange(-r, r + 1)] * num_spatial_dims
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(
        -1, num_spatial_dims
    )
    sq = (grid**2).sum(axis=1)
    keep = (sq < radius**2) & (sq > 0)
    return grid[keep].astype(np.int32)


def num_anchors(
    density: float, unbiased_shape: Tuple[int, ...], count_mode: str = "reference"
) -> int:
    """Anchors per crop. ``"reference"`` replicates the reference's formula,
    which uses only the first two dims even in 3D (reference
    ``zarr_dataset.py:244-245``) — starving 3D crops of pairs by the ratio of
    the remaining extent; ``"all_dims"`` scales with the full unbiased
    volume."""
    if count_mode == "all_dims":
        return int(density * math.prod(unbiased_shape))
    return int(density * unbiased_shape[0] * unbiased_shape[1])


def _ball_volume(radius: float, ndim: int) -> float:
    return math.pi ** (ndim / 2) / math.gamma(ndim / 2 + 1) * radius**ndim


def num_references(
    density: float, kappa: float, num_spatial_dims: int = 2,
    count_mode: str = "reference",
) -> int:
    """References per anchor: ``density * |kappa-disk|`` in the reference
    (2D area even in 3D, reference ``zarr_dataset.py:247-248``);
    ``"all_dims"`` uses the kappa-ball volume of the actual dimensionality."""
    if count_mode == "all_dims":
        return int(density * _ball_volume(kappa, num_spatial_dims))
    return int(density * kappa**2 * math.pi)


@dataclass
class PairSampler:
    """Samples (anchor, reference) coordinate pairs for one crop.

    All shapes are static per configuration: ``sample()`` returns arrays of
    shape ``(num_pairs, D)`` with ``num_pairs = num_anchors * num_references``.
    """

    output_shape: Tuple[int, ...]
    density: float
    kappa: float
    count_mode: str = "reference"

    def __post_init__(self):
        self.num_spatial_dims = len(self.output_shape)
        self.unbiased_shape = tuple(
            int(s - 2 * self.kappa) for s in self.output_shape
        )
        if any(s <= 0 for s in self.unbiased_shape):
            raise ValueError(
                f"output shape {self.output_shape} too small for kappa="
                f"{self.kappa}"
            )
        self.n_anchors = num_anchors(
            self.density, self.unbiased_shape, self.count_mode
        )
        self.n_references = num_references(
            self.density, self.kappa, self.num_spatial_dims, self.count_mode
        )
        if self.n_anchors < 1 or self.n_references < 1:
            raise ValueError(
                "density/kappa too small: no pairs would be sampled "
                f"(anchors={self.n_anchors}, references={self.n_references})"
            )
        self._offsets = disk_offsets(self.kappa, self.num_spatial_dims)

    @property
    def num_pairs(self) -> int:
        return self.n_anchors * self.n_references

    def sample(self, rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
        """Draw ``(anchors, references)`` of shape ``(num_pairs, D)`` (int32).

        Coordinates are x-first: component ``d`` indexes spatial axis
        ``D-1-d`` of the prediction, so its bound is
        ``output_shape[D-1-d]`` (for the reference's square/cubic crops this
        equals the reference's ``output_shape[d]`` bound,
        ``zarr_dataset.py:202-235``; for anisotropic crops the reference's
        convention would index out of bounds).
        """
        k = int(self.kappa)
        bounds = list(reversed(self.output_shape))  # per x-first component
        lows = [k] * self.num_spatial_dims
        highs = [int(s) - k + 1 for s in bounds]
        anchors = np.stack(
            [
                rng.integers(lo, hi, size=self.n_anchors)
                for lo, hi in zip(lows, highs)
            ],
            axis=1,
        ).astype(np.int32)
        anchors = np.repeat(anchors, self.n_references, axis=0)
        idx = rng.integers(0, len(self._offsets), size=len(anchors))
        references = anchors + self._offsets[idx]
        return anchors, references

    def device_sampler(self):
        """Return a jit-able ``sample(key, batch) -> (anchors, references)``
        drawing the pairs on device with ``jax.random``.

        Same distribution as :meth:`sample`, but no host work and no
        host->device coordinate transfer per step (the coordinates for a
        252^2 crop are ~10 MB/batch — shipping an RNG key is 8 bytes).
        """
        import jax.numpy as jnp

        grouped = self.device_sampler_grouped()
        n_refs = self.n_references

        def sample(key, batch: int):
            anchors_u, references = grouped(key, batch)
            anchors = jnp.repeat(anchors_u, n_refs, axis=1)  # (B, n_pairs, D)
            return anchors, references.reshape(
                batch, -1, self.num_spatial_dims
            )

        return sample

    def device_sampler_grouped(self):
        """Like :meth:`device_sampler` but keeps the (anchor, reference)
        grouping: returns ``(anchors (B, A, D), references (B, A, R, D))``
        with each anchor listed once. Lets the train step gather each anchor
        embedding once and broadcast over its R references — the gradient
        scatter then touches A instead of A*R indices (TPU scatters are
        serialized; this is the difference between ~5k and ~145k updates per
        sample for default configs).
        """
        import jax
        import jax.numpy as jnp

        offsets = jnp.asarray(self._offsets)
        k = int(self.kappa)
        lows = jnp.asarray([k] * self.num_spatial_dims, jnp.int32)
        # x-first components: component d indexes spatial axis D-1-d
        highs = jnp.asarray(
            [int(s) - k + 1 for s in reversed(self.output_shape)], jnp.int32
        )
        n_anchors, n_refs = self.n_anchors, self.n_references

        def sample(key, batch: int):
            k_anchor, k_off = jax.random.split(key)
            anchors = jax.random.randint(
                k_anchor,
                (batch, n_anchors, self.num_spatial_dims),
                lows,
                highs,
                dtype=jnp.int32,
            )
            idx = jax.random.randint(
                k_off,
                (batch, n_anchors, n_refs),
                0,
                len(self._offsets),
                dtype=jnp.int32,
            )
            references = anchors[:, :, None, :] + offsets[idx]
            return anchors, references

        return sample
