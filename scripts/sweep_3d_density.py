"""3D pair-density stability sweep: locate the collapse boundary.

Round-2 observation (docs/validation.md): 3D blobs train to F1 1.000 at
density 0.05 (all_dims) but collapse to one cluster at density 0.1 — the
2D default! This sweep maps the boundary (density x lr) so the
check_3d_density_envelope guard and the docs table rest on measurements,
not two points.

Each cell trains a small 3D model for --iters iterations and runs the full
pipeline; reports best-bandwidth F1. Runs on whatever backend is active
(TPU when attached). Results append to scripts/sweep_3d_density.csv.

Usage: python scripts/sweep_3d_density.py [--iters 1500] \
         [--densities 0.025,0.05,0.075,0.1] [--lrs 4e-4]
"""

import argparse
import csv
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

OUT_CSV = REPO / "scripts" / "sweep_3d_density.csv"


def run_cell(density, lr, iters, size, workdir):
    import cellulus_tpu
    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.io import zarr
    from synthetic import make_blob_container

    work = Path(workdir)
    work.mkdir(parents=True, exist_ok=True)
    os.chdir(work)
    container = work / "data.zarr"
    if not (container / "train").exists():
        make_blob_container(container, num_samples=2, size=size, ndim=3, seed=11)

    config = ExperimentConfig(
        **{
            "experiment_name": "sweep3d",
            "object_size": int(size * 0.13),
            "model_config": {
                "num_fmaps": 24,
                "fmap_inc_factor": 3,
                "downsampling_factors": [[1, 2, 2]],
            },
            "train_config": {
                "batch_size": 2,
                "kappa": 8.0,
                "loss_mode": "pairs",
                "pair_count_mode": "all_dims",
                "density": density,
                "crop_size": [40, 76, 76],
                "max_iterations": iters,
                "initial_learning_rate": lr,
                "num_workers": 4,
                # host elastic serializes on the 1-core build host — the
                # sweep uses the on-device warp (+ device pair sampling,
                # the key-driven step it requires); distributions match the
                # host path (tests/test_elastic_jax.py, sampler parity)
                "elastic_deform": True,
                "elastic_on_device": True,
                "device_pair_sampling": True,
                "precision": "bfloat16",
                "save_model_every": max(500, iters // 2),
                "save_snapshot_every": 10**9,
                "save_best_model_every": 100,
                "train_data_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
            },
            "inference_config": {
                "crop_size": [40, 76, 76],
                "tile_batch_size": 4,
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

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the envelope guard fires on purpose
        cellulus_tpu.train(config)

    if (work / "out.zarr").exists():
        shutil.rmtree(work / "out.zarr")
    src = zarr.open(container, "r")
    out = zarr.open(work / "out.zarr", "a")
    out["groundtruth"] = np.asarray(src["groundtruth"][...])
    out["groundtruth"].attrs.update(src["groundtruth"].attrs.asdict())

    config.model_config.checkpoint = work / "models" / "best_loss.ckpt"
    results = cellulus_tpu.infer(config)
    best = max(results.values(), key=lambda r: r["F1"])
    return best["F1"], best["SEG"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--densities", default="0.025,0.05,0.075,0.1")
    ap.add_argument("--lrs", default="4e-4")
    args = ap.parse_args()

    densities = [float(d) for d in args.densities.split(",")]
    lrs = [float(x) for x in args.lrs.split(",")]

    # idempotency: a (density, lr, iters) cell already recorded with a
    # numeric F1 is skipped, so a reboot-interrupted sweep re-run only pays
    # for the missing cells (error rows are retried)
    done = set()
    if OUT_CSV.exists():
        for row in csv.reader(OUT_CSV.open()):
            if len(row) >= 4 and row[0] != "density":
                try:
                    float(row[3])
                except ValueError:
                    continue
                done.add((float(row[0]), float(row[1]), int(row[2])))

    new_file = not OUT_CSV.exists()
    with open(OUT_CSV, "a", newline="") as fh:
        w = csv.writer(fh)
        if new_file:
            w.writerow(["density", "lr", "iters", "F1", "SEG", "seconds"])
        for lr in lrs:
            for d in densities:
                if (d, lr, args.iters) in done:
                    print(f"density={d} lr={lr} iters={args.iters}: "
                          "already recorded, skipping", flush=True)
                    continue
                t0 = time.time()
                work = tempfile.mkdtemp(prefix=f"sweep3d_d{d}_lr{lr}_")
                try:
                    f1, seg = run_cell(d, lr, args.iters, args.size, work)
                except Exception as e:  # record the failure, keep sweeping
                    print(f"density={d} lr={lr} FAILED: {e}", flush=True)
                    w.writerow([d, lr, args.iters, "error", "error",
                                round(time.time() - t0, 1)])
                    fh.flush()
                    continue
                dt = time.time() - t0
                print(
                    f"density={d} lr={lr}: F1={f1:.3f} SEG={seg:.3f} "
                    f"({dt:.0f}s)",
                    flush=True,
                )
                w.writerow([d, lr, args.iters, round(f1, 4), round(seg, 4),
                            round(dt, 1)])
                fh.flush()
                shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
