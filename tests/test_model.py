"""U-Net geometry, forward-shape, gather and loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellulus_tpu.criterions import oce_loss
from cellulus_tpu.models import (
    UNetSpec,
    compute_geometry,
    forward,
    init_params,
    select_and_add_coordinates,
    tta_embeddings,
)


def test_geometry_reference_case():
    # the reference hardcodes output = crop - 16 for the default config
    # (reference datasets/zarr_dataset.py:94)
    g = compute_geometry((252, 252), [[2, 2]])
    assert g.output_size == (236, 236)
    assert g.context == (8, 8)


def test_geometry_two_levels():
    g = compute_geometry((252, 252), [[2, 2], [2, 2]])
    # 252-4=248 pool 124-4=120 pool 60-4=56; up 112-4=108; up 216-4=212
    assert g.output_size == (212, 212)


def test_geometry_anisotropic_3d():
    g = compute_geometry((60, 100, 100), [[1, 2, 2]])
    # z never pooled: 60-4=56 -> 52 -> up 52-4=48
    # y/x: 96 -> 48 -> 44 -> up 88 -> 84
    assert g.output_size == (48, 84, 84)


def test_geometry_too_small_raises():
    with pytest.raises(ValueError):
        compute_geometry((16, 16), [[2, 2]])


@pytest.mark.parametrize("ndim", [2, 3])
def test_forward_shape_matches_geometry(ndim):
    size = 60 if ndim == 2 else 36
    factors = [[2] * ndim]
    spec = UNetSpec(1, ndim, 8, 2, 16, tuple(tuple(f) for f in factors), ndim)
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((1, *(size,) * ndim, 1))
    out = forward(spec, params, x)
    g = compute_geometry((size,) * ndim, factors)
    assert out.shape == (1, *g.output_size, ndim)


def test_forward_translation_equivariance():
    """Valid convs + 2x pool: shifting the input by the downsampling factor
    shifts the output by the same amount."""
    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(1), spec)
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.normal(size=(1, 64, 64, 1)).astype(np.float32))
    out_a = forward(spec, params, big[:, : 60, : 60])
    out_b = forward(spec, params, big[:, 2 : 62, 2 : 62])
    np.testing.assert_allclose(
        np.asarray(out_a[:, 2:, 2:]), np.asarray(out_b[:, :-2, :-2]), atol=2e-4
    )


def test_select_and_add_coordinates_2d():
    out = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 5, 7, 2)).astype(np.float32)
    )
    coords = jnp.array([[[3, 1], [6, 4]], [[0, 0], [2, 3]]])  # (x, y)
    emb = select_and_add_coordinates(out, coords)
    assert emb.shape == (2, 2, 2)
    np.testing.assert_allclose(
        np.asarray(emb[0, 0]), np.asarray(out[0, 1, 3]) + np.array([3, 1]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(emb[1, 1]), np.asarray(out[1, 3, 2]) + np.array([2, 3]), rtol=1e-6
    )


def test_select_and_add_coordinates_3d():
    out = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 5, 6, 3)).astype(np.float32)
    )
    coords = jnp.array([[[2, 3, 1]]])  # (x, y, z)
    emb = select_and_add_coordinates(out, coords)
    np.testing.assert_allclose(
        np.asarray(emb[0, 0]),
        np.asarray(out[0, 1, 3, 2]) + np.array([2, 3, 1]),
        rtol=1e-6,
    )


def test_oce_loss_golden():
    # hand-computed: pairs at distance d: contribution 1 - exp(-d^2/tau)
    anchor = jnp.array([[[0.0, 0.0], [1.0, 0.0]]])
    reference = jnp.array([[[3.0, 4.0], [1.0, 0.0]]])  # d=5, d=0
    loss, oce, reg = oce_loss(anchor, reference, temperature=10.0, regularizer_weight=0.0)
    expected = (1 - np.exp(-25.0 / 10.0)) + 0.0
    np.testing.assert_allclose(float(oce), expected, rtol=1e-6)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


def test_oce_loss_regularizer():
    anchor = jnp.array([[[3.0, 4.0]]])  # norm 5
    loss, oce, reg = oce_loss(anchor, anchor, temperature=10.0, regularizer_weight=0.1)
    np.testing.assert_allclose(float(reg), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(oce), 0.0, atol=1e-7)


def test_oce_loss_stop_gradient():
    anchor = jnp.array([[[1.0, 2.0]]])
    reference = jnp.array([[[0.5, 1.0]]])

    def f_ref(r):
        return oce_loss(anchor, r, 10.0, 1e-5)[0]

    grad_r = jax.grad(f_ref)(reference)
    assert float(jnp.abs(grad_r).sum()) == 0.0

    def f_anchor(a):
        return oce_loss(a, reference, 10.0, 1e-5)[0]

    grad_a = jax.grad(f_anchor)(anchor)
    assert float(jnp.abs(grad_a).sum()) > 0.0


def test_tta_embeddings_shape_and_determinism():
    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(0), spec)
    raw = jnp.ones((60, 60, 1)) * 0.3
    out = tta_embeddings(spec, params, raw, jax.random.PRNGKey(5), 0.01, 2)
    assert out.shape == (44, 44, 3)
    # uncertainty channel must be non-negative
    assert float(out[..., -1].min()) >= 0.0
    out2 = tta_embeddings(spec, params, raw, jax.random.PRNGKey(5), 0.01, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_remat_grads_identical():
    """jax.checkpoint rematerialization changes memory, not math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cellulus_tpu.models import UNetSpec, forward, init_params

    spec = UNetSpec(1, 2, 8, 2, 12, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(0), spec)
    raw = jnp.asarray(
        np.random.default_rng(2).random((2, 60, 60, 1)), jnp.float32
    )

    def loss(p, remat):
        return jnp.sum(forward(spec, p, raw, jnp.float32, remat=remat) ** 2)

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_remat = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_remat)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
