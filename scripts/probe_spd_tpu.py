"""On-device steps_per_dispatch parity probe.

CPU parity tests (tests/test_train_loop.py::test_steps_per_dispatch_*)
prove the K-step lax.scan dispatch reproduces single-step per-iteration
losses in 2D and 3D at float32. This probe runs the SAME pairing on the
live backend (TPU) at a chosen precision, where the round-4 3D precision
A/B cells (spd=4) systematically underperformed the single-step density
sweep. The deterministic round-robin BatchLoader + key-driven fold_in
streams make two same-seed runs batch-identical, so the per-iteration
loss curves must match elementwise if the scan path is numerically
faithful on this backend.

Usage: python scripts/probe_spd_tpu.py [--iters 200] [--ndim 3]
           [--precision bfloat16] [--density 0.025] [--spds 1,4]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def run(spd, args, container, work):
    import os

    import cellulus_tpu
    from cellulus_tpu.configs import ExperimentConfig

    wd = work / f"spd{spd}"
    wd.mkdir(parents=True, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        if args.ndim == 3:
            model = {"num_fmaps": 24, "fmap_inc_factor": 3,
                     "downsampling_factors": [[1, 2, 2]]}
            crop, batch, kappa = [40, 76, 76], 2, 8.0
        else:
            model = {"num_fmaps": 24, "fmap_inc_factor": 3}
            crop, batch, kappa = [140, 140], 2, 10.0
        config = ExperimentConfig(
            **{
                "experiment_name": f"probe-spd{spd}",
                "object_size": 16,
                "model_config": model,
                "train_config": {
                    "batch_size": batch,
                    "kappa": kappa,
                    "loss_mode": "pairs",
                    "pair_count_mode": "all_dims",
                    "density": args.density,
                    "crop_size": crop,
                    "max_iterations": args.iters,
                    "initial_learning_rate": 4e-4,
                    "num_workers": 4,
                    "elastic_deform": True,
                    "elastic_on_device": True,
                    "device_pair_sampling": True,
                    "steps_per_dispatch": spd,
                    "precision": args.precision,
                    "save_model_every": 10**9,
                    "save_snapshot_every": 10**9,
                    "save_best_model_every": 10**9,
                    "train_data_config": {
                        "container_path": str(container),
                        "dataset_name": "train",
                    },
                },
            }
        )
        state = cellulus_tpu.train(config)
        return np.asarray(state["logger_data"]["loss"], dtype=np.float64)
    finally:
        os.chdir(cwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--ndim", type=int, default=3, choices=(2, 3))
    ap.add_argument("--precision", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--density", type=float, default=0.025)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--spds", default="1,4")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    if args.size is None:
        args.size = 128 if args.ndim == 3 else 256

    from synthetic import make_blob_container

    work = Path(tempfile.mkdtemp(prefix="probe_spd_"))
    container = work / "data.zarr"
    make_blob_container(container, num_samples=2, size=args.size,
                        ndim=args.ndim, seed=11)

    curves = {}
    for spd in [int(s) for s in args.spds.split(",")]:
        curves[spd] = run(spd, args, container, work)
        print(f"spd={spd}: loss[0]={curves[spd][0]:.6g} "
              f"loss[-1]={curves[spd][-1]:.6g} "
              f"mean={curves[spd].mean():.6g}", flush=True)

    spds = sorted(curves)
    ref = curves[spds[0]]
    for spd in spds[1:]:
        c = curves[spd]
        n = min(len(ref), len(c))
        rel = np.abs(c[:n] - ref[:n]) / np.maximum(np.abs(ref[:n]), 1e-9)
        first_bad = int(np.argmax(rel > 1e-3)) if (rel > 1e-3).any() else -1
        print(
            f"spd={spds[0]} vs spd={spd}: max rel diff {rel.max():.3g} "
            f"(median {np.median(rel):.3g}); first >1e-3 at iteration "
            f"{first_bad if first_bad >= 0 else 'never'}"
        )
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
