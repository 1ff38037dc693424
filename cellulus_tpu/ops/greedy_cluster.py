"""Greedy seed-and-grow clustering of embeddings, fully on device.

Replaces the reference's torch host-loop clusterer (reference
``utils/greedy_cluster.py:46-120`` / ``:176-253``) with one
``lax.while_loop`` over full spatial arrays (no dynamic-size masked gathers —
foreground masking is applied arithmetically so every iteration is a fixed
set of vectorized ops):

per iteration (matching the reference exactly):
- pick the unclustered foreground pixel with the highest certainty score
  (score = min-max-inverted uncertainty channel),
- stop when the best score < ``seed_thresh`` (0.9),
- propose all foreground pixels with Gaussian affinity
  ``exp(-||e - e_seed||^2 / (2 bw^2)) > 0.5``,
- accept the proposal as a new instance if it is larger than
  ``min_object_size`` and more than half of it is still unclustered,
- mark the proposal clustered either way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_instances",))
def _greedy_cluster_kernel(
    embeddings: jnp.ndarray,  # (P, D) absolute embeddings, flattened spatial
    seed_score: jnp.ndarray,  # (P,) in [0, 1], 0 outside foreground
    fg: jnp.ndarray,  # (P,) bool foreground
    bandwidth: jnp.ndarray,
    min_object_size: jnp.ndarray,
    seed_thresh: float = 0.9,
    min_unclustered_sum: int = 0,
    max_instances: int = 8192,
):
    P, D = embeddings.shape
    inv_two_bw2 = 1.0 / (2.0 * bandwidth * bandwidth)

    def cond(state):
        unclustered, instance_map, count, stop = state
        return (~stop) & (jnp.sum(unclustered & fg) > min_unclustered_sum) & (
            count <= max_instances
        )

    def body(state):
        unclustered, instance_map, count, stop = state
        masked_score = seed_score * (unclustered & fg).astype(jnp.float32)
        seed = jnp.argmax(masked_score)
        seed_ok = masked_score[seed] >= seed_thresh
        center = embeddings[seed]
        diff = embeddings - center[None, :]
        affinity = jnp.exp(-jnp.sum(diff * diff, axis=1) * inv_two_bw2)
        proposal = (affinity > 0.5) & fg
        prop_size = jnp.sum(proposal)
        still_free = jnp.sum(proposal & unclustered)
        accept = (
            seed_ok
            & (prop_size > min_object_size)
            & (still_free.astype(jnp.float32) / jnp.maximum(prop_size, 1) > 0.5)
        )
        instance_map = jnp.where(
            accept & proposal, count.astype(instance_map.dtype), instance_map
        )
        count = jnp.where(accept, count + 1, count)
        unclustered = unclustered & ~(proposal & seed_ok)
        unclustered = unclustered.at[seed].set(False)
        return unclustered, instance_map, count, ~seed_ok

    state = (
        jnp.ones((P,), bool),
        jnp.zeros((P,), jnp.int32),
        jnp.int32(1),
        jnp.bool_(False),
    )
    unclustered, instance_map, count, _ = jax.lax.while_loop(cond, body, state)
    return instance_map, count - 1


def greedy_cluster(
    prediction: np.ndarray,
    fg_mask: np.ndarray,
    bandwidth: float,
    min_object_size: float,
    seed_thresh: float = 0.9,
    min_unclustered_sum: int = 0,
    max_instances: int = 8192,
) -> np.ndarray:
    """Cluster one sample's prediction into instances.

    Args:
        prediction: ``(D+1, *spatial)``: offset channels (x-first) followed
            by the uncertainty channel.
        fg_mask: ``(*spatial,)`` boolean foreground.

    Returns:
        ``(*spatial,)`` int32 instance map (background 0).
    """
    prediction = np.asarray(prediction, dtype=np.float32)
    ndim = prediction.ndim - 1
    offsets = prediction[:ndim]
    uncertainty = prediction[ndim]

    # absolute embeddings: offsets + pixel coordinate grid (x-first channels)
    from .mean_shift import add_coordinate_grid

    absolute = add_coordinate_grid(offsets)

    # min-max inverted score: low uncertainty -> score near 1
    lo, hi = uncertainty.min(), uncertainty.max()
    denom = lo - hi if lo != hi else 1.0
    score = (uncertainty - hi) / denom

    P = int(np.prod(uncertainty.shape))
    emb = absolute.reshape(ndim, P).T
    labels, _ = _greedy_cluster_kernel(
        jnp.asarray(emb),
        jnp.asarray(score.ravel()),
        jnp.asarray(fg_mask.ravel().astype(bool)),
        jnp.float32(bandwidth),
        jnp.float32(min_object_size),
        seed_thresh=seed_thresh,
        min_unclustered_sum=min_unclustered_sum,
        max_instances=max_instances,
    )
    return np.asarray(labels).reshape(uncertainty.shape)
