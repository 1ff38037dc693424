"""Pipelined inference must produce identical outputs to the staged path."""

import numpy as np

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig
from cellulus_tpu.io import zarr


def _config(container, out, pipelined):
    return ExperimentConfig(
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
                    "container_path": str(container),
                    "dataset_name": "train",
                },
            },
            "inference_config": {
                "crop_size": [68, 68],
                "num_infer_iterations": 2,
                "pipelined": pipelined,
                "dataset_config": {
                    "container_path": str(container),
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
                "segmentation_dataset_config": {
                    "container_path": str(out),
                    "dataset_name": "segmentation",
                    "secondary_dataset_name": "detection",
                },
            },
        }
    )


def test_pipelined_matches_staged(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = _config(blob_container_2d, tmp_path / "a.zarr", False)
    cellulus_tpu.train(config)
    config.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"
    cellulus_tpu.infer(config)

    config2 = _config(blob_container_2d, tmp_path / "b.zarr", True)
    config2.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"
    cellulus_tpu.infer(config2)

    a = zarr.open(tmp_path / "a.zarr", "r")
    b = zarr.open(tmp_path / "b.zarr", "r")
    for name in ("embeddings", "detection", "binary-segmentation",
                 "centered-embeddings", "segmentation"):
        np.testing.assert_array_equal(
            np.asarray(a[name][...]), np.asarray(b[name][...]), err_msg=name
        )


def test_pipelined_ram_gate(blob_container_2d, tmp_path, monkeypatch):
    """A tiny RAM budget caps the stage workers (with a warning) instead of
    holding every in-flight sample's embeddings unbounded — and the output
    still matches the staged path bit-for-bit (per-sample RNG streams)."""
    import warnings

    monkeypatch.chdir(tmp_path)
    config = _config(blob_container_2d, tmp_path / "a.zarr", False)
    cellulus_tpu.train(config)
    config.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"
    cellulus_tpu.infer(config)

    # 128x128 2D sample: ~0.2 MB of embeddings; 0.0005 GB forces workers=1
    monkeypatch.setenv("CELLULUS_TPU_PIPELINE_RAM_GB", "0.0005")
    config2 = _config(blob_container_2d, tmp_path / "b.zarr", True)
    config2.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cellulus_tpu.infer(config2)
    assert any("capping stage workers" in str(x.message) for x in w), [
        str(x.message) for x in w
    ]

    a = zarr.open(tmp_path / "a.zarr", "r")
    b = zarr.open(tmp_path / "b.zarr", "r")
    np.testing.assert_array_equal(
        np.asarray(a["segmentation"][...]), np.asarray(b["segmentation"][...])
    )

    # the TOML-settable pipeline_ram_gb field takes precedence over the env
    # var (here: a generous env budget, a tiny config budget -> still caps)
    monkeypatch.setenv("CELLULUS_TPU_PIPELINE_RAM_GB", "64")
    config3 = _config(blob_container_2d, tmp_path / "c.zarr", True)
    config3.inference_config.pipeline_ram_gb = 0.0005
    config3.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cellulus_tpu.infer(config3)
    assert any("capping stage workers" in str(x.message) for x in w)
    c = zarr.open(tmp_path / "c.zarr", "r")
    np.testing.assert_array_equal(
        np.asarray(a["segmentation"][...]), np.asarray(c["segmentation"][...])
    )
