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
    ap.add_argument("--checkpoint", default="models/best_loss.ckpt",
                    help="checkpoint to score, relative to the workdir "
                         "(with --skip-train: walk a run's numbered "
                         "checkpoints)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--precision", default="bfloat16",
                    choices=("bfloat16", "float32"),
                    help="training compute dtype (A/B the bf16 lever the "
                         "roofline analysis points at, docs/tpu_design.md)")
    ap.add_argument("--results-json", default=None,
                    help="append {args, F1, SEG, train_secs} as one JSON "
                         "line to this file (study bookkeeping)")
    ap.add_argument("--fast", action="store_true",
                    help="TPU fast path (on-device elastic + 4 steps per "
                         "dispatch + device pair sampling): keeps the train "
                         "wall time device-dominated so precision A/Bs "
                         "measure compute, not the 1-core host's elastic "
                         "workers")
    ap.add_argument("--steps-per-dispatch", type=int, default=None,
                    help="override the --fast bundle's steps_per_dispatch=4 "
                         "(unbundles the K-step scan lever for protocol "
                         "discrimination runs)")
    ap.add_argument("--transfer-precision", default="float16",
                    choices=("float16", "float32"),
                    help="inference d2h embedding transfer dtype (this "
                         "script's historical protocol is float16)")
    ap.add_argument("--mean-shift-max-iter", type=int, default=None,
                    help="cap detect's mean-shift fit iterations "
                         "(inference_config.mean_shift_max_iterations; "
                         "sklearn-parity default 300)")
    ap.add_argument("--seed", type=int, default=0,
                    help="train_config.seed (init + sampling streams); "
                         "non-zero seeds drive run-to-run variance cells")
    args = ap.parse_args()
    if args.size is None:
        args.size = 512 if args.ndim == 2 else 128

    import cellulus_tpu
    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.io import zarr
    from synthetic import make_blob_container

    # resolve BEFORE chdir: relative paths must not re-resolve later
    work = Path(args.workdir or tempfile.mkdtemp(prefix="cellulus_val_")).resolve()
    if args.results_json:
        args.results_json = str(Path(args.results_json).resolve())
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
                **({"elastic_on_device": True,
                    # 2D bundles the K-step scan (quality gates pass with
                    # it); 3D does NOT: at the validated 3D point the
                    # recipe is marginally stable and spd=4 has never
                    # produced a good run (0/6) while spd=1 seed-matches
                    # the density sweep's F1 0.957 — see
                    # docs/validation.md "round-5 verdict"
                    "steps_per_dispatch": (
                        args.steps_per_dispatch
                        if args.steps_per_dispatch is not None
                        else (4 if args.ndim == 2 else 1)
                    ),
                    "device_pair_sampling": args.loss_mode == "pairs"}
                   if args.fast else {}),
                **({"steps_per_dispatch": args.steps_per_dispatch}
                   if args.steps_per_dispatch is not None and not args.fast
                   else {}),
                "seed": args.seed,
                "precision": args.precision,
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
                "transfer_precision": args.transfer_precision,
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

    train_secs = None
    if not args.skip_train:
        import time

        t0 = time.perf_counter()
        cellulus_tpu.train(config)
        train_secs = round(time.perf_counter() - t0, 1)
        print(f"[perf] train wall ({args.precision}): {train_secs}s "
              f"for {args.iters} iters")

    # stage ground truth next to outputs for evaluation
    import shutil

    if (work / "out.zarr").exists():
        shutil.rmtree(work / "out.zarr")
    src = zarr.open(container, "r")
    out = zarr.open(work / "out.zarr", "a")
    out["groundtruth"] = np.asarray(src["groundtruth"][...])
    out["groundtruth"].attrs.update(src["groundtruth"].attrs.asdict())

    if args.mean_shift_max_iter is not None:
        config.inference_config.mean_shift_max_iterations = (
            args.mean_shift_max_iter
        )
    config.model_config.checkpoint = work / args.checkpoint
    results = cellulus_tpu.infer(config)
    print("RESULTS:", results)
    f1 = results[0]["F1"]
    seg = results[0]["SEG"]
    print(f"F1={f1:.3f} SEG={seg:.3f} (workdir: {work})")
    if args.results_json:
        import json

        row = {
            "ndim": args.ndim, "iters": args.iters, "size": args.size,
            "precision": args.precision, "loss_mode": args.loss_mode,
            "pair_count_mode": args.pair_count_mode,
            "density": args.density, "lr": args.lr,
            "train_secs": train_secs,
            "F1": round(float(f1), 3), "SEG": round(float(seg), 3),
        }
        # protocol-deviation fields: only stamped when they deviate, so the
        # queue done-checks (which filter on the historical fields) keep
        # matching only protocol-default rows
        if args.steps_per_dispatch is not None:
            row["steps_per_dispatch"] = args.steps_per_dispatch
        if args.transfer_precision != "float16":
            row["transfer_precision"] = args.transfer_precision
        if args.seed != 0:
            row["seed"] = args.seed
        if args.skip_train:
            row["skip_train"] = True
        if args.checkpoint != "models/best_loss.ckpt":
            row["checkpoint"] = args.checkpoint
        if args.mean_shift_max_iter is not None:
            row["mean_shift_max_iter"] = args.mean_shift_max_iter
        path = Path(args.results_json)
        path.parent.mkdir(parents=True, exist_ok=True)
        with path.open("a") as fh:
            fh.write(json.dumps(row) + "\n")
    return results


if __name__ == "__main__":
    main()
