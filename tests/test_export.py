"""Serving export: StableHLO artifact roundtrip (jax.export)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from cellulus_tpu.configs import InferenceConfig
from cellulus_tpu.export import (
    ARTIFACT_NAME,
    META_NAME,
    export_predictor,
    load_predictor,
)
from cellulus_tpu.models import UNetSpec, init_params, tta_embeddings


def _setup():
    spec = UNetSpec(1, 2, 8, 2, 12, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(3), spec)
    ic = InferenceConfig(
        crop_size=[52, 52],
        num_infer_iterations=2,
        p_salt_pepper=0.1,
        tile_batch_size=2,
    )
    return spec, params, ic


def test_export_roundtrip(tmp_path):
    spec, params, ic = _setup()
    out = export_predictor(spec, params, ic, tmp_path / "artifact")
    assert (out / ARTIFACT_NAME).exists()
    meta = json.loads((out / META_NAME).read_text())
    assert meta["tile_batch_size"] == 2
    assert meta["in_tile"] == [52, 52]
    assert meta["out_tile"] == [36, 36]
    assert meta["out_channels"] == 3

    predict, meta2 = load_predictor(out)
    assert meta2 == meta
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.random((2, 52, 52, 1)), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2, dtype=jnp.uint32))
    got = np.asarray(predict(tiles, keys))
    assert got.shape == (2, 36, 36, 3)

    # identical to calling the live model with the same keys
    want = np.asarray(
        jax.vmap(
            lambda t, k: tta_embeddings(
                spec, params, t, k, ic.p_salt_pepper, ic.num_infer_iterations
            )
        )(tiles, keys)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_from_experiment_cli(tmp_path, blob_container_2d):
    """TOML -> checkpoint -> `cellulus-tpu export` -> loadable artifact."""
    from cellulus_tpu.cli import main
    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.models import spec_from_config
    from cellulus_tpu.train import pack_state
    from cellulus_tpu.utils.checkpoint import save_checkpoint

    toml_text = f"""\
experiment_name = "exp"

[model_config]
num_fmaps = 8
fmap_inc_factor = 2
features_in_last_layer = 12
checkpoint = "{tmp_path / 'model.ckpt'}"

[inference_config]
crop_size = [52, 52]
num_infer_iterations = 2
tile_batch_size = 2

[inference_config.dataset_config]
container_path = "{blob_container_2d}"
dataset_name = "train"
"""
    cfg_path = tmp_path / "infer.toml"
    cfg_path.write_text(toml_text)
    config = ExperimentConfig.from_toml(cfg_path)
    spec = spec_from_config(config.model_config, 1, 2)
    params = init_params(jax.random.PRNGKey(0), spec)
    save_checkpoint(
        tmp_path / "model.ckpt", pack_state(5, 1.0, params, None, {})
    )

    out_dir = tmp_path / "served"
    main(["export", str(cfg_path), str(out_dir)])
    predict, meta = load_predictor(out_dir)
    assert meta["num_infer_iterations"] == 2
    # the preprocessing scale is resolved from the dataset dtype and
    # recorded so a serving fleet can reproduce the pipeline's inputs
    from cellulus_tpu.datasets import normalization_factor_for
    from cellulus_tpu.io import zarr as cz

    raw_dtype = cz.open(str(blob_container_2d), "r")["train"].dtype
    assert meta["normalization_factor"] == normalization_factor_for(raw_dtype)
    tiles = jnp.zeros((2, 52, 52, 1), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2, dtype=jnp.uint32))
    out = np.asarray(predict(tiles, keys))
    assert out.shape == (2, 36, 36, 3)
    assert np.isfinite(out).all()


def test_cross_platform_export(tmp_path):
    """A CPU host can lower a multi-platform (tpu+cpu) artifact and still
    run it locally — the CI-builds-TPU-artifacts claim in docs/serving.md."""
    spec, params, ic = _setup()
    out = export_predictor(
        spec, params, ic, tmp_path / "multi", platforms=("cpu", "tpu")
    )
    meta = json.loads((out / META_NAME).read_text())
    assert set(meta["platforms"]) == {"cpu", "tpu"}
    predict, _ = load_predictor(out)
    tiles = jnp.zeros((2, 52, 52, 1), jnp.float32)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(2, dtype=jnp.uint32))
    got = np.asarray(predict(tiles, keys))
    assert got.shape == (2, 36, 36, 3) and np.isfinite(got).all()
