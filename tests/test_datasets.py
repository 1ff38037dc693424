"""ZarrDataset / BatchLoader tests on synthetic data."""

import numpy as np
import pytest

from cellulus_tpu.configs import DatasetConfig
from cellulus_tpu.datasets import BatchLoader, get_dataset, normalization_factor_for


def test_normalization_factors():
    assert normalization_factor_for(np.uint8) == 1.0 / 255
    assert normalization_factor_for(np.uint16) == 1.0 / 65535
    assert normalization_factor_for(np.float32) == 1.0


def _make_dataset(container, elastic=False, crop=64):
    return get_dataset(
        dataset_config=DatasetConfig(container_path=container, dataset_name="train"),
        crop_size=(crop, crop),
        elastic_deform=elastic,
        control_point_spacing=16,
        control_point_jitter=2.0,
        density=0.1,
        kappa=10.0,
        normalization_factor=None,
        output_shape=(crop - 16, crop - 16),
        seed=1,
    )


def test_dataset_yields_normalized_crops(blob_container_2d):
    ds = _make_dataset(blob_container_2d)
    crop, anchors, refs = next(iter(ds))
    assert crop.shape == (1, 64, 64)
    assert crop.dtype == np.float32
    assert 0.0 <= crop.min() and crop.max() <= 1.0
    assert crop.max() > 0.0  # zero-crop rejection
    assert anchors.shape == refs.shape == (ds.sampler.num_pairs, 2)


def test_dataset_elastic_deform(blob_container_2d):
    ds = _make_dataset(blob_container_2d, elastic=True)
    crop, _, _ = next(iter(ds))
    assert crop.shape == (1, 64, 64)
    assert np.isfinite(crop).all()
    assert crop.max() > 0.0


def test_batch_loader(blob_container_2d):
    ds = _make_dataset(blob_container_2d)
    with BatchLoader(ds, batch_size=4, num_workers=2) as loader:
        raw, anchors, refs = next(iter(loader))
    assert raw.shape == (4, 1, 64, 64)
    assert anchors.shape[0] == 4 and refs.shape[0] == 4


def test_dataset_crop_size_validation(blob_container_2d):
    with pytest.raises(ValueError):
        get_dataset(
            dataset_config=DatasetConfig(
                container_path=blob_container_2d, dataset_name="train"
            ),
            crop_size=(64, 64, 64),  # 3 dims for a 2D dataset
            elastic_deform=False,
            control_point_spacing=16,
            control_point_jitter=2.0,
            density=0.1,
            kappa=10.0,
            normalization_factor=None,
        )
