"""Packed-matmul filter gradient == XLA's native conv gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cellulus_tpu.ops.conv_vjp import _dimension_numbers, conv_valid_packed


def _plain(x, w, ndim):
    return lax.conv_general_dilated(
        x, w, (1,) * ndim, "VALID", dimension_numbers=_dimension_numbers(ndim)
    )


@pytest.mark.parametrize(
    "ndim,k,ci,co,size",
    [
        (2, 3, 5, 7, 12),
        (2, 1, 6, 4, 9),
        (3, 3, 3, 4, 8),
        (3, 1, 4, 3, 6),
    ],
)
def test_grad_matches_native(ndim, k, ci, co, size):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, *(size,) * ndim, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*(k,) * ndim, ci, co)) * 0.1, jnp.float32)
    g = jnp.asarray(
        rng.normal(size=(2, *(size - k + 1,) * ndim, co)), jnp.float32
    )

    def loss_packed(x, w):
        return jnp.sum(conv_valid_packed(x, w, ndim) * g)

    def loss_plain(x, w):
        return jnp.sum(_plain(x, w, ndim) * g)

    # identical forward
    np.testing.assert_array_equal(
        np.asarray(conv_valid_packed(x, w, ndim)), np.asarray(_plain(x, w, ndim))
    )
    (dx_a, dw_a) = jax.grad(loss_packed, argnums=(0, 1))(x, w)
    (dx_b, dw_b) = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_a), np.asarray(dx_b), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_a), np.asarray(dw_b), rtol=1e-5, atol=1e-4)


def test_full_forward_grads_match():
    """Parameter gradients of the full U-Net forward are unchanged."""
    from cellulus_tpu.models import UNetSpec, forward, init_params

    spec = UNetSpec(1, 2, 8, 2, 12, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(1)
    raw = jnp.asarray(rng.random((2, 60, 60, 1)), jnp.float32)

    def loss(p, packed):
        out = forward(spec, p, raw, jnp.float32, packed_dw=packed)
        return jnp.sum(out**2)

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_packed = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_packed)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4
        )
