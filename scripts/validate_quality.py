"""Quality validation: train on synthetic blobs to convergence and verify
the full pipeline produces accurate instance segmentations (F1/SEG).

This is the framework's end-to-end correctness proof on a task with known
ground truth — analogous to the reference's 2D demo (BASELINE.md: 5000
iters, ~20 min on M2 Max). Prints per-stage [perf] lines and final metrics.

Usage: python scripts/validate_quality.py [--iters N] [--size S]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--size", type=int, default=None,
                    help="sample extent per dim (default 512 for 2D, 128 for 3D)")
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--ndim", type=int, default=2, choices=(2, 3))
    ap.add_argument("--loss-mode", default="pairs", choices=("pairs", "grid", "dense"))
    ap.add_argument(
        "--pair-count-mode", default="reference", choices=("reference", "all_dims")
    )
    ap.add_argument("--density", type=float, default=None)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse workdir/models/best_loss.ckpt; run infer only")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    if args.size is None:
        args.size = 512 if args.ndim == 2 else 128

    import cellulus_tpu
    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.io import zarr
    from synthetic import make_blob_container

    work = Path(args.workdir or tempfile.mkdtemp(prefix="cellulus_val_"))
    work.mkdir(parents=True, exist_ok=True)
    os.chdir(work)
    container = work / "data.zarr"
    if not (container / "train").exists():
        make_blob_container(
            container,
            num_samples=args.samples,
            size=args.size,
            ndim=args.ndim,
            seed=11,
        )

    object_size = int(args.size * 0.13)
    if args.ndim == 2:
        model_config = {"num_fmaps": 64, "fmap_inc_factor": 3}
        crop = [252, 252]
        batch = 8
        kappa = 10.0
    else:
        model_config = {
            "num_fmaps": 24,
            "fmap_inc_factor": 3,
            "downsampling_factors": [[1, 2, 2]],
        }
        crop = [40, 76, 76]
        batch = 2
        kappa = 8.0
    config = ExperimentConfig(
        **{
            "experiment_name": "quality-validation",
            "object_size": object_size,
            "model_config": model_config,
            "train_config": {
                "batch_size": batch,
                "kappa": kappa,
                "loss_mode": args.loss_mode,
                "pair_count_mode": args.pair_count_mode,
                # 3D defaults: 0.3 compensates the reference's 2-dim pair
                # formula in reference mode; with all_dims, 0.05 targets
                # ~124k pairs/crop (the proven regime: F1 1.000 / SEG 0.693
                # at 2500 iters; 0.1 = 497k pairs over-constrains and
                # collapses to F1 0.26 — see docs/validation.md)
                "density": args.density
                if args.density is not None
                else (
                    0.1 if args.ndim == 2
                    else (0.05 if args.pair_count_mode == "all_dims" else 0.3)
                ),
                "crop_size": crop,
                "max_iterations": args.iters,
                "initial_learning_rate": args.lr,
                "num_workers": 4,
                "elastic_deform": True,
                "precision": "bfloat16",
                "save_model_every": max(500, args.iters // 2),
                "save_snapshot_every": 10**9,
                "save_best_model_every": 100,
                "train_data_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
            },
            "inference_config": {
                "crop_size": crop,
                "tile_batch_size": 4,
                "transfer_precision": "float16",
                "dataset_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
                "prediction_dataset_config": {
                    "container_path": str(work / "out.zarr"),
                    "dataset_name": "embeddings",
                },
                "detection_dataset_config": {
                    "container_path": str(work / "out.zarr"),
                    "dataset_name": "detection",
                    "secondary_dataset_name": "embeddings",
                },
                "segmentation_dataset_config": {
                    "container_path": str(work / "out.zarr"),
                    "dataset_name": "segmentation",
                    "secondary_dataset_name": "detection",
                },
                "evaluation_dataset_config": {
                    "container_path": str(work / "out.zarr"),
                    "dataset_name": "groundtruth",
                    "secondary_dataset_name": "segmentation",
                },
            },
        }
    )

    if not args.skip_train:
        cellulus_tpu.train(config)

    # stage ground truth next to outputs for evaluation
    import shutil

    if (work / "out.zarr").exists():
        shutil.rmtree(work / "out.zarr")
    src = zarr.open(container, "r")
    out = zarr.open(work / "out.zarr", "a")
    out["groundtruth"] = np.asarray(src["groundtruth"][...])
    out["groundtruth"].attrs.update(src["groundtruth"].attrs.asdict())

    config.model_config.checkpoint = work / "models" / "best_loss.ckpt"
    results = cellulus_tpu.infer(config)
    print("RESULTS:", results)
    f1 = results[0]["F1"]
    seg = results[0]["SEG"]
    print(f"F1={f1:.3f} SEG={seg:.3f} (workdir: {work})")
    return results


if __name__ == "__main__":
    main()
