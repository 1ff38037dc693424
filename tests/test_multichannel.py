"""Multi-channel raw data through train + predict."""

import numpy as np
import pytest

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig
from cellulus_tpu.io import zarr


@pytest.fixture(scope="module")
def multichannel_container(tmp_path_factory):
    path = tmp_path_factory.mktemp("mc") / "mc.zarr"
    rng = np.random.default_rng(0)
    raw = (rng.random((2, 3, 96, 96)) * 255).astype(np.uint8)
    f = zarr.open(path, "a")
    f["train"] = raw
    f["train"].attrs["axis_names"] = ["s", "c", "y", "x"]
    return path


def test_train_and_infer_multichannel(multichannel_container, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "out.zarr"
    config = ExperimentConfig(
        **{
            "object_size": 10,
            "normalization_factor": 1.0 / 255,
            "model_config": {"num_fmaps": 8, "fmap_inc_factor": 2,
                             "features_in_last_layer": 8},
            "train_config": {
                "batch_size": 2,
                "crop_size": [36, 36],
                "kappa": 6.0,
                "max_iterations": 1,
                "num_workers": 1,
                "elastic_deform": False,
                "train_data_config": {
                    "container_path": str(multichannel_container),
                    "dataset_name": "train",
                },
            },
            "inference_config": {
                "crop_size": [52, 52],
                "num_infer_iterations": 1,
                "dataset_config": {
                    "container_path": str(multichannel_container),
                    "dataset_name": "train",
                },
                "prediction_dataset_config": {
                    "container_path": str(out),
                    "dataset_name": "embeddings",
                },
                "detection_dataset_config": {
                    "container_path": str(out),
                    "dataset_name": "detection",
                    "secondary_dataset_name": "embeddings",
                },
            },
        }
    )
    cellulus_tpu.train(config)
    config.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"
    cellulus_tpu.infer(config)
    f = zarr.open(out, "r")
    assert f["embeddings"].shape == (2, 3, 96, 96)  # 2 offsets + std
    assert np.isfinite(np.asarray(f["embeddings"][0])).all()
    assert f["detection"].shape == (2, 1, 96, 96)
