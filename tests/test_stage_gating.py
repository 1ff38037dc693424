"""Inference stage gating: only configured stages run (reference
infer.py:69-80 semantics)."""

import numpy as np
import pytest

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig
from cellulus_tpu.io import zarr


@pytest.fixture(scope="module")
def trained(blob_container_2d, tmp_path_factory):
    work = tmp_path_factory.mktemp("gating")
    import os

    cwd = os.getcwd()
    os.chdir(work)
    try:
        config = ExperimentConfig(
            **{
                "object_size": 10,
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
                        "container_path": str(blob_container_2d),
                        "dataset_name": "train",
                    },
                },
            }
        )
        cellulus_tpu.train(config)
    finally:
        os.chdir(cwd)
    return work / "models" / "best_loss.ckpt"


def test_predict_only(trained, blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "out.zarr"
    config = ExperimentConfig(
        **{
            "object_size": 10,
            "model_config": {"num_fmaps": 8, "fmap_inc_factor": 2,
                             "features_in_last_layer": 8,
                             "checkpoint": str(trained)},
            "inference_config": {
                "crop_size": [52, 52],
                "num_infer_iterations": 1,
                "dataset_config": {
                    "container_path": str(blob_container_2d),
                    "dataset_name": "train",
                },
                "prediction_dataset_config": {
                    "container_path": str(out),
                    "dataset_name": "embeddings",
                },
            },
        }
    )
    result = cellulus_tpu.infer(config)
    assert result is None  # no evaluation stage
    f = zarr.open(out, "r")
    assert "embeddings" in f
    assert "detection" not in f
    assert "segmentation" not in f


def test_missing_checkpoint_raises(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = ExperimentConfig(
        **{
            "object_size": 10,
            "model_config": {"num_fmaps": 8, "fmap_inc_factor": 2,
                             "checkpoint": str(tmp_path / "nope.ckpt")},
            "inference_config": {
                "crop_size": [52, 52],
                "dataset_config": {
                    "container_path": str(blob_container_2d),
                    "dataset_name": "train",
                },
            },
        }
    )
    with pytest.raises(FileNotFoundError):
        cellulus_tpu.infer(config)


def test_full_pipeline_with_seeds(trained, blob_container_2d, tmp_path,
                                  monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "out.zarr"
    config = ExperimentConfig(
        **{
            "object_size": 10,
            "model_config": {"num_fmaps": 8, "fmap_inc_factor": 2,
                             "features_in_last_layer": 8,
                             "checkpoint": str(trained)},
            "inference_config": {
                "crop_size": [52, 52],
                "num_infer_iterations": 1,
                "use_seeds": True,
                "dataset_config": {
                    "container_path": str(blob_container_2d),
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
    cellulus_tpu.infer(config)
    f = zarr.open(out, "r")
    assert f["detection"].shape == (2, 1, 128, 128)
    assert np.asarray(f["detection"][...]).dtype == np.uint16
