"""Spatially-sharded forward (halo exchange over the mesh) must be
bit-identical to the unsharded forward on the reflect-padded input."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cellulus_tpu.models import UNetSpec, compute_geometry, forward, init_params
from cellulus_tpu.parallel.spatial import (
    make_spatial_mesh,
    plan_spatial_split,
    sharded_forward,
)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_forward_matches_reference(n_shards):
    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(0), spec)
    H, context = plan_spatial_split(spec, n_shards, min_h_local=12)
    W = 60
    rng = np.random.default_rng(0)
    raw = rng.normal(size=(1, H, W, 1)).astype(np.float32)

    mesh = make_spatial_mesh(n_shards)
    out_sharded = np.asarray(
        sharded_forward(spec, params, jnp.asarray(raw), mesh)
    )

    # reference: reflect-pad along the sharded axis only, plain forward
    padded = np.pad(
        raw, ((0, 0), (context, context), (0, 0), (0, 0)), mode="reflect"
    )
    out_ref = np.asarray(forward(spec, params, jnp.asarray(padded)))
    assert out_sharded.shape == out_ref.shape
    np.testing.assert_allclose(out_sharded, out_ref, atol=2e-5, rtol=1e-5)


def test_plan_spatial_split_consistency():
    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    H, context = plan_spatial_split(spec, 4)
    assert H % 4 == 0
    h_local = H // 4
    g = compute_geometry(
        (h_local + 2 * context, h_local + 2 * context),
        spec.downsampling_factors,
    )
    assert g.output_size[0] == h_local


def test_sharded_forward_rejects_uneven_split():
    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(0), spec)
    mesh = make_spatial_mesh(4)
    with pytest.raises(ValueError):
        sharded_forward(
            spec, params, jnp.zeros((1, 30, 60, 1)), mesh
        )


def test_spatial_shards_pipeline_equality(blob_container_2d, tmp_path, monkeypatch):
    """`inference_config.spatial_shards` (the user surface of the sharded
    forward, VERDICT r4 item 7) must produce the SAME pipeline outputs as
    the default tiled path: with `p_salt_pepper=0` every TTA copy equals
    the raw input, so tiled and whole-sample sharded forwards are
    bit-identical and detect/segment inherit the equality."""
    import cellulus_tpu
    from cellulus_tpu.io import zarr
    from tests.test_pipeline import _experiment

    monkeypatch.chdir(tmp_path)
    out_tiled = tmp_path / "out_tiled.zarr"
    config = _experiment(blob_container_2d, out_tiled)
    config.inference_config.p_salt_pepper = 0.0
    config.inference_config.num_infer_iterations = 2
    cellulus_tpu.train(config)
    config.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"
    cellulus_tpu.infer(config)

    out_sharded = tmp_path / "out_sharded.zarr"
    config2 = _experiment(blob_container_2d, out_sharded)
    config2.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"
    config2.inference_config.p_salt_pepper = 0.0
    config2.inference_config.num_infer_iterations = 2
    config2.inference_config.spatial_shards = 2
    cellulus_tpu.infer(config2)

    a = zarr.open(out_tiled, "r")
    b = zarr.open(out_sharded, "r")
    np.testing.assert_array_equal(
        np.asarray(a["embeddings"][:]), np.asarray(b["embeddings"][:])
    )
    np.testing.assert_array_equal(
        np.asarray(a["segmentation"][:]), np.asarray(b["segmentation"][:])
    )
