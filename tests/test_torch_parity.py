"""Numerical parity with PyTorch conv semantics + checkpoint import tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cellulus_tpu.models import UNetSpec, forward, init_params
from cellulus_tpu.models.torch_import import torch_state_dict_to_params
from tests.torch_reference import TorchOCEModel, copy_jax_params_to_torch


def _build_pair(ndim=2, factors=((2, 2),), num_fmaps=8, inc=2, fil=16):
    spec = UNetSpec(1, ndim, num_fmaps, inc, fil, tuple(factors), ndim)
    params = init_params(jax.random.PRNGKey(0), spec)
    model = TorchOCEModel(1, ndim, num_fmaps, inc, fil, list(factors), ndim)
    copy_jax_params_to_torch(params, model)
    model.eval()
    return spec, params, model


@pytest.mark.parametrize(
    "ndim,factors,size",
    [
        (2, ((2, 2),), 60),
        (2, ((2, 2), (2, 2)), 76),
        (3, ((1, 2, 2),), 36),
    ],
)
def test_forward_matches_torch(ndim, factors, size):
    spec, params, model = _build_pair(ndim=ndim, factors=factors)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, *(size,) * ndim)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    mine = forward(spec, params, jnp.asarray(np.moveaxis(x, 1, -1)))
    mine = np.moveaxis(np.asarray(mine), -1, 1)
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=2e-4, rtol=1e-4)


def test_torch_checkpoint_roundtrip(tmp_path):
    """Save a reference-format .pth, re-import, verify identical weights."""
    spec, params, model = _build_pair(factors=((2, 2), (2, 2)))
    path = tmp_path / "ckpt.pth"
    torch.save(
        {
            "iteration": 41,
            "lowest_loss": 0.125,
            "model_state_dict": model.state_dict(),
            "optim_state_dict": {},
            "logger_data": {"loss": [1.0]},
        },
        path,
    )
    from cellulus_tpu.utils.checkpoint import load_checkpoint

    state = load_checkpoint(path)
    assert state["iteration"] == 41
    assert state["lowest_loss"] == 0.125
    imported = state["params"]
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(imported)
    assert len(flat_a) == len(flat_b)
    # identical tree structure => leaves align pairwise
    for a, b in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(imported)[0],
    ):
        assert a[0] == b[0]
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_torch_import_rejects_garbage():
    with pytest.raises(ValueError):
        torch_state_dict_to_params({"some.unrelated.key": np.zeros((1,))})


def test_torch_export_roundtrip(tmp_path):
    """params -> .pth -> params is exact, and the exported state_dict loads
    into the reference-shaped torch model."""
    import jax

    from cellulus_tpu.models.torch_export import save_torch_checkpoint
    from cellulus_tpu.utils.checkpoint import load_checkpoint

    spec, params, model = _build_pair(factors=((2, 2), (2, 2)))
    path = tmp_path / "export.pth"
    save_torch_checkpoint(path, params, iteration=7, lowest_loss=0.5)

    # the exported state dict must load into the torch reference model
    state = torch.load(path, map_location="cpu", weights_only=False)
    model2 = TorchOCEModel(1, 2, 8, 2, 16, [[2, 2], [2, 2]], 2)
    model2.load_state_dict(state["model_state_dict"], strict=True)

    # and re-importing gives back the identical params
    reimported = load_checkpoint(path)
    assert reimported["iteration"] == 7
    for a, b in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(reimported["params"])[0],
    ):
        assert a[0] == b[0]
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_tiled_prediction_matches_torch_forward():
    """With TTA noise off (p=0, 1 iteration), the tiled sliding-window
    prediction must reproduce the torch model's whole-image forward: valid
    convs make tiling exact, so seams must be invisible."""
    from cellulus_tpu.configs import InferenceConfig
    from cellulus_tpu.predict import predict_sample

    spec, params, model = _build_pair()
    rng = np.random.default_rng(4)
    raw = rng.random((1, 100, 120)).astype(np.float32)
    ic = InferenceConfig(
        crop_size=[52, 52], num_infer_iterations=1, p_salt_pepper=0.0
    )
    mine = predict_sample(spec, params, raw, ic, 1.0, sample_seed=0)

    # torch reference: reflect-pad by the context, full forward
    context = 8
    padded = np.pad(raw, ((0, 0), (context, context), (context, context)),
                    mode="reflect")
    with torch.no_grad():
        ref = model(torch.from_numpy(padded[None]))[0].numpy()
    assert ref.shape == (2, 100, 120)
    np.testing.assert_allclose(mine[:2], ref, atol=3e-4, rtol=1e-3)
    # uncertainty channel is exactly 0 with a single noiseless pass
    np.testing.assert_allclose(mine[2], 0.0, atol=1e-6)


def test_torch_export_roundtrip_fmap_inc_factor_1(tmp_path):
    """fmap_inc_factor=1 makes every level's channel counts identical, so
    the up-path cannot be identified by input width — the importer must
    fall back to positional mapping instead of raising (and the roundtrip
    must stay exact so weights land on their own spatial levels)."""
    import jax

    from cellulus_tpu.models.torch_export import save_torch_checkpoint
    from cellulus_tpu.utils.checkpoint import load_checkpoint

    spec, params, _ = _build_pair(factors=((2, 2), (2, 2)), inc=1)
    path = tmp_path / "export_inc1.pth"
    save_torch_checkpoint(path, params, iteration=3, lowest_loss=1.0)
    reimported = load_checkpoint(path)
    for a, b in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(reimported["params"])[0],
    ):
        assert a[0] == b[0]
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
