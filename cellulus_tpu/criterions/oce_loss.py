"""Object-centric-embedding (OCE) loss.

A single fused reduction replacing the reference's module
(reference ``criterions/oce_loss.py:53-63``):

    loss = sum_pairs (1 - exp(-||e_a - sg(e_r)||^2 / tau))
         + lambda_reg * sum_pairs ||e_a||

The reference embedding carries a stop-gradient (the reference ``.detach()``s
it), and the loss is an un-normalized sum over all sampled pairs. Note the
code's Gaussian non-linearity ``1 - exp(-d^2/tau)`` is authoritative over the
paper's sigmoid (see SURVEY.md C6).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def oce_loss(
    anchor_embedding: jnp.ndarray,
    reference_embedding: jnp.ndarray,
    temperature: float,
    regularizer_weight: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute (total, oce, regularization) losses.

    Args:
        anchor_embedding: ``(B, P, D)`` absolute embeddings at anchor pixels.
        reference_embedding: ``(B, P, D)`` absolute embeddings at reference
            pixels; gradients are stopped through this argument.
    """
    reference = jax.lax.stop_gradient(reference_embedding)
    diff = anchor_embedding - reference
    sq_dist = jnp.sum(diff * diff, axis=-1)
    oce = jnp.sum(1.0 - jnp.exp(-sq_dist / temperature))
    reg = regularizer_weight * jnp.sum(
        jnp.linalg.norm(anchor_embedding, axis=-1)
    )
    return oce + reg, oce, reg
