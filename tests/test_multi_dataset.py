"""Multi-dataset training tests."""

import numpy as np
import pytest

import cellulus_tpu
from cellulus_tpu.configs import DatasetConfig, ExperimentConfig
from cellulus_tpu.datasets import get_dataset
from cellulus_tpu.datasets.zarr_dataset import ConcatDataset


def _ds(container, name, crop=36):
    return get_dataset(
        dataset_config=DatasetConfig(container_path=container, dataset_name=name),
        crop_size=(crop, crop),
        elastic_deform=False,
        control_point_spacing=16,
        control_point_jitter=2.0,
        density=0.1,
        kappa=6.0,
        normalization_factor=None,
        output_shape=(crop - 16, crop - 16),
        seed=1,
    )


def test_concat_dataset_mixes(blob_container_2d):
    a = _ds(blob_container_2d, "train")
    b = _ds(blob_container_2d, "validate")
    mixture = ConcatDataset([a, b])
    it = mixture.iterate(0)
    crops = [next(it)[0] for _ in range(4)]
    assert all(c.shape == (1, 36, 36) for c in crops)


def test_concat_dataset_rejects_mismatch(blob_container_2d, blob_container_3d):
    a = _ds(blob_container_2d, "train")
    b3 = get_dataset(
        dataset_config=DatasetConfig(
            container_path=blob_container_3d, dataset_name="train"
        ),
        crop_size=(36, 36, 36),
        elastic_deform=False,
        control_point_spacing=16,
        control_point_jitter=2.0,
        density=0.1,
        kappa=3.0,
        normalization_factor=None,
        output_shape=(20, 20, 20),
    )
    with pytest.raises(ValueError):
        ConcatDataset([a, b3])


def test_train_with_multiple_datasets(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
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
                "train_data_configs": [
                    {
                        "container_path": str(blob_container_2d),
                        "dataset_name": "train",
                    },
                    {
                        "container_path": str(blob_container_2d),
                        "dataset_name": "validate",
                    },
                ],
            },
        }
    )
    state = cellulus_tpu.train(config)
    assert np.isfinite(state["lowest_loss"])
