"""Pallas VMEM-resident 3x3 weight-grad kernel: numerics vs oracles.

Interpret mode on CPU (the real lowering is exercised on TPU by
scripts/diag_dw_pallas.py and the train-step integration). Bit-equality
with jax.grad is not required — both paths accumulate in f32 but tile the
pixel reduction differently; the assertion is tight relative tolerance
against the f32 numpy oracle, same as tests/test_conv_vjp.py's bar.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellulus_tpu.models.unet import _dimension_numbers
from cellulus_tpu.ops.pallas_dw import _np_reference_dw, conv3x3_dw


@pytest.mark.parametrize(
    "B,H,W,Ci,Co",
    [
        (2, 20, 18, 8, 16),   # tiny, ragged rows (H % TR != 0 after padding)
        (1, 33, 35, 16, 8),   # odd extents
        (2, 66, 66, 32, 32),  # TR boundary crossing
    ],
)
def test_pallas_dw_matches_oracle(B, H, W, Ci, Co):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((B, H, W, Ci)).astype(np.float32)
    g = rng.standard_normal((B, H - 2, W - 2, Co)).astype(np.float32)

    got = np.asarray(conv3x3_dw(jnp.asarray(x), jnp.asarray(g), interpret=True))
    assert got.shape == (3, 3, Ci, Co)

    # bf16 inputs -> compare against the bf16-quantized oracle
    xq = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
    gq = np.asarray(jnp.asarray(g, jnp.bfloat16), np.float32)
    want = _np_reference_dw(xq, gq)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_pallas_dw_matches_jax_grad():
    """Against XLA's own filter gradient (both bf16 operands, f32 accum)."""
    rng = np.random.default_rng(5)
    B, H, W, Ci, Co = 2, 40, 36, 16, 24
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.bfloat16)
    g = jnp.asarray(
        rng.standard_normal((B, H - 2, W - 2, Co)), jnp.bfloat16
    )
    w0 = jnp.zeros((3, 3, Ci, Co), jnp.bfloat16)

    def loss(w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID",
            dimension_numbers=_dimension_numbers(2),
        )
        return (out.astype(jnp.float32) * g.astype(jnp.float32)).sum()

    want = np.asarray(jax.grad(loss)(w0), np.float32)
    got = np.asarray(conv3x3_dw(x, g, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-1)


def test_conv_valid_pallas_grads_match_plain():
    """conv_valid_pallas (train_config.pallas_dw): identical forward and
    matching gradients vs the plain conv on both the 3x3 Pallas path and
    the 1x1 native-fallback path."""
    import jax.numpy as jnp

    from cellulus_tpu.ops.conv_vjp import conv_valid_pallas

    rng = np.random.default_rng(9)
    for k, Ci, Co in ((3, 8, 16), (1, 8, 16)):
        x = jnp.asarray(rng.standard_normal((2, 20, 22, Ci)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((k, k, Ci, Co)) * 0.1, jnp.float32
        )
        g_shape = (2, 20 - k + 1, 22 - k + 1, Co)
        ct = jnp.asarray(rng.standard_normal(g_shape), jnp.float32)

        def plain_loss(x, w):
            out = jax.lax.conv_general_dilated(
                x, w, (1, 1), "VALID",
                dimension_numbers=_dimension_numbers(2),
            )
            return (out * ct).sum()

        def pallas_loss(x, w):
            return (conv_valid_pallas(x, w, 2) * ct).sum()

        fwd_p = conv_valid_pallas(x, w, 2)
        fwd_n = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=_dimension_numbers(2)
        )
        np.testing.assert_array_equal(np.asarray(fwd_p), np.asarray(fwd_n))

        dx_n, dw_n = jax.grad(plain_loss, argnums=(0, 1))(x, w)
        dx_p, dw_p = jax.grad(pallas_loss, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(
            np.asarray(dx_p), np.asarray(dx_n), rtol=1e-5, atol=1e-5
        )
        # 3x3 path quantizes operands to bf16 inside the kernel
        tol = 2e-2 if k == 3 else 1e-5
        np.testing.assert_allclose(
            np.asarray(dw_p), np.asarray(dw_n), rtol=tol, atol=tol * 10
        )
