"""3D pipeline test: anisotropic U-Net, tiled inference over a volume."""

import numpy as np

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig
from cellulus_tpu.io import zarr


def test_full_pipeline_3d(blob_container_3d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "out3d.zarr"
    config = ExperimentConfig(
        **{
            "experiment_name": "pipeline-3d",
            "object_size": 6,
            "model_config": {
                "num_fmaps": 8,
                "fmap_inc_factor": 2,
                "features_in_last_layer": 8,
                "downsampling_factors": [[1, 2, 2]],
            },
            "train_config": {
                "batch_size": 1,
                "crop_size": [24, 28, 28],
                "kappa": 3.0,
                "max_iterations": 1,
                "num_workers": 1,
                "elastic_deform": False,
                "train_data_config": {
                    "container_path": str(blob_container_3d),
                    "dataset_name": "train",
                },
            },
            "inference_config": {
                "crop_size": [28, 36, 36],
                "num_infer_iterations": 1,
                "clustering": "greedy",
                "dataset_config": {
                    "container_path": str(blob_container_3d),
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
    state = cellulus_tpu.train(config)
    assert np.isfinite(state["lowest_loss"])  # regression: aniso 3D sampling
    assert np.isfinite(state["logger_data"]["loss"]).all()
    config.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"
    cellulus_tpu.infer(config)

    f = zarr.open(out, "r")
    emb = f["embeddings"]
    assert emb.shape == (1, 4, 48, 48, 48)  # 3 offsets + uncertainty
    assert emb.attrs["axis_names"] == ["s", "c", "z", "y", "x"]
    assert np.isfinite(np.asarray(emb[0])).all()
    assert f["detection"].shape == (1, 1, 48, 48, 48)
    assert f["segmentation"].shape == (1, 1, 48, 48, 48)
