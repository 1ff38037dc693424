"""In-suite quality gate: the full pipeline must actually LEARN.

Every other test in the suite trains <=3 iterations; a change that silently
breaks learning (loss wiring, sampler distribution, geometry) would pass
them all. This gate trains a tiny model to convergence on deterministic
synthetic blobs ON CPU and asserts the end-to-end pipeline (train ->
predict -> detect -> segment -> evaluate) reaches F1 >= 0.9 — the
reference's only test is a 1-iteration smoke (reference
``tests/test_api.py:4-8``); this exceeds it. Budget: ~2 min single-core.

The config is the validated 2D recipe (docs/validation.md) scaled down:
grid loss (key-driven, no host pair sampling), small crops, lr raised for
the shorter schedule. Seeded end to end.
"""

import os
from pathlib import Path

import numpy as np
import pytest

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig
from cellulus_tpu.io import zarr
from tests.synthetic import make_blob_container

ITERS = int(os.environ.get("CELLULUS_TPU_GATE_ITERS", "400"))


@pytest.mark.quality_gate
def test_learning_quality_gate(tmp_path, monkeypatch):
    size = 128
    container = tmp_path / "data.zarr"
    make_blob_container(container, num_samples=2, size=size, ndim=2, seed=11)
    monkeypatch.chdir(tmp_path)

    config = ExperimentConfig(
        **{
            "experiment_name": "quality-gate",
            "object_size": int(size * 0.13),
            "model_config": {
                "num_fmaps": 16,
                "fmap_inc_factor": 2,
                "features_in_last_layer": 24,
                "downsampling_factors": [[2, 2]],
            },
            "train_config": {
                "batch_size": 4,
                "kappa": 5.0,
                "loss_mode": "grid",
                "density": 0.2,
                "crop_size": [76, 76],
                "max_iterations": ITERS,
                "initial_learning_rate": 1e-3,
                "num_workers": 0,
                "elastic_deform": False,
                "save_model_every": ITERS - 1,
                "save_snapshot_every": 10**9,
                "save_best_model_every": 50,
                "train_data_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
            },
            "inference_config": {
                "crop_size": [76, 76],
                "tile_batch_size": 4,
                "dataset_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
                "prediction_dataset_config": {
                    "container_path": "out.zarr",
                    "dataset_name": "embeddings",
                },
                "detection_dataset_config": {
                    "container_path": "out.zarr",
                    "dataset_name": "detection",
                    "secondary_dataset_name": "embeddings",
                },
                "segmentation_dataset_config": {
                    "container_path": "out.zarr",
                    "dataset_name": "segmentation",
                    "secondary_dataset_name": "detection",
                },
                "evaluation_dataset_config": {
                    "container_path": "out.zarr",
                    "dataset_name": "groundtruth",
                    "secondary_dataset_name": "segmentation",
                },
            },
        }
    )

    cellulus_tpu.train(config)

    src = zarr.open(container, "r")
    out = zarr.open("out.zarr", "a")
    out["groundtruth"] = np.asarray(src["groundtruth"][...])
    out["groundtruth"].attrs.update(src["groundtruth"].attrs.asdict())

    config.model_config.checkpoint = Path("models") / "best_loss.ckpt"
    results = cellulus_tpu.infer(config)

    f1 = max(r["F1"] for r in results.values())
    seg = max(r["SEG"] for r in results.values())
    assert f1 >= 0.9, (
        f"quality gate failed: best F1 {f1:.3f} < 0.9 (SEG {seg:.3f}) — "
        "the pipeline no longer learns; results: "
        + ", ".join(
            f"bw{i}: F1={r['F1']:.3f}" for i, r in sorted(results.items())
        )
    )
