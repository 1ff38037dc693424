"""CLI entry point tests."""


import numpy as np
import pytest

from cellulus_tpu import cli
from cellulus_tpu.io import zarr


def _write_toml(path, container):
    path.write_text(
        f"""
experiment_name = "cli-test"
object_size = 10

[model_config]
num_fmaps = 8
fmap_inc_factor = 2
features_in_last_layer = 8

[train_config]
batch_size = 2
crop_size = [36, 36]
kappa = 6.0
max_iterations = 1
num_workers = 1
elastic_deform = false

[train_config.train_data_config]
container_path = "{container}"
dataset_name = "train"
"""
    )


def test_cli_train(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    toml = tmp_path / "train.toml"
    _write_toml(toml, blob_container_2d)
    cli.train([str(toml)])
    assert (tmp_path / "models" / "best_loss.ckpt").exists()


def test_cli_main_dispatch(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    toml = tmp_path / "train.toml"
    _write_toml(toml, blob_container_2d)
    cli.main(["train", str(toml)])
    assert (tmp_path / "models" / "best_loss.ckpt").exists()


def test_cli_requires_config():
    with pytest.raises(SystemExit):
        cli.train([])


def test_snapshot_written(blob_container_2d, tmp_path, monkeypatch):
    """save_snapshot_every=1 writes raw + mean-centered prediction zarr."""
    monkeypatch.chdir(tmp_path)
    import cellulus_tpu
    from cellulus_tpu.configs import ExperimentConfig

    config = ExperimentConfig(
        **{
            "model_config": {"num_fmaps": 8, "fmap_inc_factor": 2,
                             "features_in_last_layer": 8},
            "train_config": {
                "batch_size": 2,
                "crop_size": [36, 36],
                "kappa": 6.0,
                "max_iterations": 1,
                "num_workers": 1,
                "elastic_deform": False,
                "save_snapshot_every": 1,
                "train_data_config": {
                    "container_path": str(blob_container_2d),
                    "dataset_name": "train",
                },
            },
        }
    )
    cellulus_tpu.train(config)
    f = zarr.open(tmp_path / "snapshots.zarr", "r")
    raw = f["0/raw"]
    pred = f["0/prediction"]
    assert raw.shape == (2, 1, 36, 36)
    assert pred.shape == (2, 2, 20, 20)
    assert pred.attrs["offset"] == [8.0, 8.0]
    # mean-centering: per-sample per-channel spatial mean is ~0
    data = np.asarray(pred[...])
    np.testing.assert_allclose(
        data.reshape(2, 2, -1).mean(axis=2), 0.0, atol=1e-5
    )
