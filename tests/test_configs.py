"""Config-system tests: reference TOML compatibility, validation, metadata."""

import numpy as np
import pytest

from cellulus_tpu.configs import DatasetConfig, ExperimentConfig
from cellulus_tpu.io import DatasetMetaData, zarr


def test_reference_toml_loads_verbatim(tmp_path, blob_container_2d):
    """A TOML in the reference's exact format (cf. reference
    tests/train.toml) must load unchanged."""
    toml = tmp_path / "train.toml"
    toml.write_text(
        f"""
experiment_name = "Train test"
object_size = 10.0

[model_config]

num_fmaps = 12
fmap_inc_factor = 2

[train_config]

batch_size = 32

[train_config.train_data_config]

container_path = "{blob_container_2d}"
dataset_name = "train"

[train_config.validate_data_config]
container_path = "{blob_container_2d}"
dataset_name = "validate"
"""
    )
    config = ExperimentConfig.from_toml(toml)
    assert config.experiment_name == "Train test"
    assert config.object_size == 10.0
    assert config.model_config.num_fmaps == 12
    assert config.model_config.fmap_inc_factor == 2
    assert config.model_config.features_in_last_layer == 64  # default
    assert config.model_config.downsampling_factors == [[2, 2]]
    assert config.train_config.batch_size == 32
    assert config.train_config.crop_size == [252, 252]  # default
    assert config.train_config.initial_learning_rate == 4e-5
    assert config.train_config.train_data_config.dataset_name == "train"
    assert config.train_config.validate_data_config.dataset_name == "validate"


def test_inference_defaults_match_reference():
    from cellulus_tpu.configs import InferenceConfig

    ic = InferenceConfig()
    assert ic.crop_size == [252, 252]
    assert ic.p_salt_pepper == 0.01
    assert ic.num_infer_iterations == 16
    assert ic.clustering == "meanshift"
    assert ic.use_seeds is False
    assert ic.num_bandwidths == 1
    assert ic.reduction_probability == 0.1
    assert ic.post_processing == "cell"
    assert ic.grow_distance == 3
    assert ic.shrink_distance == 6


def test_invalid_clustering_rejected():
    from cellulus_tpu.configs import InferenceConfig

    with pytest.raises(ValueError):
        InferenceConfig(clustering="kmeans")


def test_model_config_requires_ints():
    from cellulus_tpu.configs import ModelConfig

    with pytest.raises(TypeError):
        ModelConfig(num_fmaps=12.5, fmap_inc_factor=2)


def test_meta_data_errors(tmp_path):
    f = zarr.open(tmp_path / "c.zarr", "a")
    f["no_axes"] = np.zeros((2, 1, 8, 8))
    with pytest.raises(RuntimeError, match="axis_names"):
        DatasetMetaData.from_dataset_config(
            DatasetConfig(container_path=tmp_path / "c.zarr", dataset_name="no_axes")
        )
    f["bad"] = np.zeros((2, 8, 8))
    f["bad"].attrs["axis_names"] = ["s", "y", "x"]  # no channel dim
    with pytest.raises(RuntimeError, match="channel"):
        DatasetMetaData.from_dataset_config(
            DatasetConfig(container_path=tmp_path / "c.zarr", dataset_name="bad")
        )
    with pytest.raises(RuntimeError, match="does not contain|has no"):
        DatasetMetaData.from_dataset_config(
            DatasetConfig(container_path=tmp_path / "c.zarr", dataset_name="missing")
        )


def test_meta_data_layouts():
    meta = DatasetMetaData((4, 2, 64, 64), ["s", "c", "y", "x"])
    assert meta.num_samples == 4
    assert meta.num_channels == 2
    assert meta.num_spatial_dims == 2
    assert meta.spatial_array == (64, 64)
    meta3 = DatasetMetaData((1, 1, 32, 64, 64), ["s", "c", "z", "y", "x"])
    assert meta3.num_spatial_dims == 3
    assert meta3.spatial_array == (32, 64, 64)


def test_validation_loss_logged(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import cellulus_tpu

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
    state = cellulus_tpu.train(config)
    assert len(state["logger_data"]["val_loss"]) == 1
    assert np.isfinite(state["logger_data"]["val_loss"][0])


def test_dw_paths_mutually_exclusive():
    import pytest

    from cellulus_tpu.configs import TrainConfig

    with pytest.raises(ValueError, match="mutually exclusive"):
        TrainConfig(pallas_dw=True, packed_dw=True)
