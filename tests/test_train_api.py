"""End-to-end training smoke test (reference parity: ``tests/test_api.py``)."""

import numpy as np
import pytest

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig


@pytest.fixture
def experiment_config(blob_container_2d):
    return ExperimentConfig(
        **{
            "experiment_name": "train-test",
            "object_size": 10,
            "model_config": {"num_fmaps": 12, "fmap_inc_factor": 2},
            "train_config": {
                "batch_size": 4,
                "crop_size": [36, 36],
                "kappa": 6.0,
                "max_iterations": 2,
                "num_workers": 2,
                "elastic_deform": False,
                "save_model_every": 1000,
                "save_snapshot_every": 1000,
                "train_data_config": {
                    "container_path": str(blob_container_2d),
                    "dataset_name": "train",
                },
                "validate_data_config": {
                    "container_path": str(blob_container_2d),
                    "dataset_name": "validate",
                },
            },
        }
    )


def test_train_api(experiment_config, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    state = cellulus_tpu.train(experiment_config)
    assert state["iteration"] == 1
    assert np.isfinite(state["lowest_loss"])
    assert len(state["logger_data"]["loss"]) == 2
    # a checkpoint and the loss csv were produced
    assert (tmp_path / "models" / "best_loss.ckpt").exists()
    assert (tmp_path / "loss.csv").exists()


def test_train_resume(experiment_config, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cellulus_tpu.train(experiment_config)
    ckpt = tmp_path / "models" / "000001.ckpt"
    assert ckpt.exists()
    experiment_config.model_config.checkpoint = ckpt
    experiment_config.train_config.max_iterations = 3
    state = cellulus_tpu.train(experiment_config)
    assert state["iteration"] == 2
    assert len(state["logger_data"]["loss"]) == 3


def test_corrupt_validation_data_aborts(blob_container_2d, tmp_path, monkeypatch):
    """Corrupt validation chunks must abort training loudly — only MISSING
    validation data degrades to 'validation disabled'."""
    import shutil

    import pytest

    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.io.zarr import CorruptChunkError

    import cellulus_tpu

    monkeypatch.chdir(tmp_path)
    container = tmp_path / "data.zarr"
    shutil.copytree(blob_container_2d, container)
    for chunk in (container / "validate").iterdir():
        if not chunk.name.startswith("."):
            chunk.write_bytes(b"garbage")

    config = ExperimentConfig(
        **{
            "object_size": 10,
            "model_config": {
                "num_fmaps": 6,
                "fmap_inc_factor": 2,
                "features_in_last_layer": 8,
            },
            "train_config": {
                "batch_size": 1,
                "crop_size": [36, 36],
                "kappa": 6.0,
                "max_iterations": 1,
                "num_workers": 0,
                "elastic_deform": False,
                "train_data_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
                "validate_data_config": {
                    "container_path": str(container),
                    "dataset_name": "validate",
                },
            },
        }
    )
    with pytest.raises(CorruptChunkError):
        cellulus_tpu.train(config)
