"""Fused [3,1,1,3] Pallas conv pass == XLA conv pass (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellulus_tpu.models import UNetSpec, init_params
from cellulus_tpu.models.unet import _conv_pass, forward
from cellulus_tpu.ops.pallas_conv import conv_pass_2d


@pytest.fixture(scope="module")
def small_model():
    spec = UNetSpec(1, 2, 8, 2, 8, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(0), spec)
    return spec, params


@pytest.mark.parametrize("level,cin,shape", [
    ("level0", 1, (2, 20, 24)),
    ("level1", 8, (1, 18, 22)),
])
def test_fused_pass_matches_xla(small_model, level, cin, shape):
    _, params = small_model
    pp = params["down"][level]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((*shape, cin), np.float32))
    ref = _conv_pass(x, pp, 2, jnp.float32)
    got = conv_pass_2d(x, pp, jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=5e-6)


def test_forward_fused_matches_xla(small_model, monkeypatch):
    """Full U-Net forward with fused passes == plain forward (interpret)."""
    import cellulus_tpu.ops.pallas_conv as pc

    spec, params = small_model
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 36, 36, 1), np.float32))

    orig = pc.conv_pass_2d
    monkeypatch.setattr(
        pc, "conv_pass_2d",
        lambda x_, p_, dt, interpret=False: orig(x_, p_, dt, interpret=True),
    )
    ref = forward(spec, params, x, jnp.float32)
    got = forward(spec, params, x, jnp.float32, fused_conv_pass=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)
