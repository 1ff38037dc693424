"""Numerical parity with PyTorch conv semantics + checkpoint import tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cellulus_tpu.models import UNetSpec, forward, init_params
from cellulus_tpu.models.torch_import import torch_state_dict_to_params
from tests.torch_reference import TorchOCEModel, copy_jax_params_to_torch


def _build_pair(
    ndim=2, factors=((2, 2),), num_fmaps=8, inc=2, fil=16, constant_upsample=True
):
    spec = UNetSpec(
        1, ndim, num_fmaps, inc, fil, tuple(factors), ndim,
        constant_upsample=constant_upsample,
    )
    params = init_params(jax.random.PRNGKey(0), spec)
    model = TorchOCEModel(
        1, ndim, num_fmaps, inc, fil, list(factors), ndim,
        constant_upsample=constant_upsample,
    )
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


@pytest.mark.parametrize(
    "ndim,factors,num_fmaps,inc,fil,in_ch",
    [
        (2, ((2, 2),), 8, 2, 16, 1),          # reference 2D demo shape
        (2, ((2, 2), (2, 2), (2, 2)), 6, 3, 12, 1),  # >= 3 levels deep
        (3, ((1, 2, 2), (2, 2, 2)), 4, 2, 8, 2),     # anisotropic 3D, 2ch
        (2, ((2, 2), (2, 2)), 8, 1, 8, 1),           # degenerate inc=1
    ],
)
def test_replica_state_dict_is_genuine_funlib_layout(
    ndim, factors, num_fmaps, inc, fil, in_ch
):
    """The torch replica's state_dict must be EXACTLY the key->shape layout
    a genuine funlib UNet (constant_upsample=True, as the reference builds
    it) emits — generated independently in funlib_state_dict_spec.py from
    the funlib module structure. This pins every replica-based parity and
    importer test to the real checkpoint format, not to the replica's own
    conventions."""
    from tests.funlib_state_dict_spec import expected_funlib_keys

    model = TorchOCEModel(in_ch, ndim, num_fmaps, inc, fil, list(factors), ndim)
    got = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    want = expected_funlib_keys(
        in_ch, ndim, num_fmaps, inc, fil, list(factors), ndim
    )
    assert got == want


@pytest.mark.parametrize(
    "ndim,factors,inc",
    [
        (2, ((2, 2), (2, 2), (2, 2)), 3),  # >= 3 levels, growing channels
        (3, ((1, 2, 2), (1, 2, 2)), 2),    # anisotropic 3D
        (2, ((2, 2), (2, 2), (2, 2)), 1),  # inc=1: positional up mapping
    ],
)
def test_torch_import_adversarial_architectures(tmp_path, ndim, factors, inc):
    """Deep / anisotropic / degenerate-channel checkpoints import exactly:
    the re-imported params match the originals leaf-for-leaf, and the jax
    forward matches the torch model that wrote the checkpoint."""
    spec, params, model = _build_pair(
        ndim=ndim, factors=factors, num_fmaps=4, inc=inc, fil=8
    )
    path = tmp_path / "adversarial.pth"
    torch.save(
        {"iteration": 1, "lowest_loss": 9.9,
         "model_state_dict": model.state_dict()},
        path,
    )
    from cellulus_tpu.utils.checkpoint import load_checkpoint

    imported = load_checkpoint(path)["params"]
    for a, b in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(imported)[0],
    ):
        assert a[0] == b[0]
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    # forward parity through the imported weights (torch wrote, jax runs);
    # input extents must survive the valid-conv shrinkage of every level
    if ndim == 3:
        shape = (1, 1, 28, 76, 76)  # z sees convs only (factors are 1 in z)
    else:
        shape = (1, 1, 92, 92)
    x = np.random.default_rng(1).normal(size=shape).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    mine = forward(spec, params, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(mine), -1, 1), ref, atol=3e-4, rtol=1e-3
    )


@pytest.mark.parametrize(
    "ndim,factors,inc,size",
    [
        (2, ((2, 2), (2, 2)), 2, 76),    # growing channels
        (3, ((1, 2, 2),), 2, 36),        # anisotropic 3D
        (2, ((2, 2), (2, 2)), 1, 76),    # inc=1: positional tconv mapping
    ],
)
def test_transposed_conv_forward_matches_torch(ndim, factors, inc, size):
    """constant_upsample=False: our block-matmul transposed-conv upsample
    must match torch ConvTranspose semantics (kernel = stride = factor)
    end-to-end through the U-Net."""
    spec, params, model = _build_pair(
        ndim=ndim, factors=factors, num_fmaps=4, inc=inc, fil=8,
        constant_upsample=False,
    )
    assert "up_tconv" in params
    rng = np.random.default_rng(0)
    if ndim == 3:
        shape = (2, 1, 28, size, size)
    else:
        shape = (2, 1, size, size)
    x = rng.normal(size=shape).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    mine = forward(spec, params, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(mine), -1, 1), ref, atol=3e-4, rtol=1e-3
    )


@pytest.mark.parametrize("inc", [2, 1])
def test_transposed_conv_checkpoint_roundtrip(tmp_path, inc):
    """A funlib constant_upsample=False checkpoint imports exactly
    (leaf-for-leaf) and exports back to an identical state_dict."""
    spec, params, model = _build_pair(
        factors=((2, 2), (2, 2)), num_fmaps=4, inc=inc, fil=8,
        constant_upsample=False,
    )
    from tests.funlib_state_dict_spec import expected_funlib_keys

    got = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    want = expected_funlib_keys(
        1, 2, 4, inc, 8, [(2, 2), (2, 2)], 2, constant_upsample=False
    )
    assert got == want

    imported = torch_state_dict_to_params(
        {k: v.numpy() for k, v in model.state_dict().items()}
    )
    for a, b in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(imported)[0],
    ):
        assert a[0] == b[0]
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    from cellulus_tpu.models.torch_export import params_to_torch_state_dict

    exported = params_to_torch_state_dict(params)
    assert set(exported) == set(got)
    for k, v in exported.items():
        np.testing.assert_array_equal(v.numpy(), model.state_dict()[k].numpy())


def test_torch_import_refuses_multi_head_upsample():
    """Multi-head funlib UNets (num_heads > 1) are out of scope; the
    importer must refuse rather than mis-assign r_up.1.* weights."""
    _, _, model = _build_pair()
    sd = dict(model.state_dict())
    sd["backbone.r_up.1.0.up.weight"] = np.zeros((16, 16, 2, 2), np.float32)
    sd["backbone.r_up.1.0.up.bias"] = np.zeros((16,), np.float32)
    with pytest.raises(ValueError, match="multi-head"):
        torch_state_dict_to_params(sd)


def test_upsample_mode_mismatch_raises():
    """spec/params upsample-mode disagreement must fail loudly both ways
    (silently ignoring imported tconv weights would be wrong)."""
    spec_t, params_t, _ = _build_pair(
        num_fmaps=4, fil=8, constant_upsample=False
    )
    spec_n, params_n, _ = _build_pair(num_fmaps=4, fil=8)
    x = jnp.zeros((1, 28, 28, 1), np.float32)
    with pytest.raises(ValueError, match="constant_upsample"):
        forward(spec_t, params_n, x)
    with pytest.raises(ValueError, match="constant_upsample"):
        forward(spec_n, params_t, x)


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
