"""Sweep the cell-mode halo-removal radii (grow/shrink) for SEG.

Motivation (scripts/analyze_seg_gap.py): the achieved 2D SEG 0.882 equals
a ~2-px uniform boundary erosion, and the reference's default
grow=3/shrink=6 halo removal (reference inference_config.py:158-159)
nets a ~3-px erosion by construction — the boundary error is largely a
POST-PROCESSING choice, not an embedding-quality limit. This sweep
re-runs ONLY the segment+evaluate stages over (grow, shrink) combinations
on a saved quality-run workdir (no retraining, seconds per cell).

Usage:
  python scripts/validate_quality.py --workdir /tmp/q2d   # once (TPU)
  python scripts/sweep_grow_shrink.py --workdir /tmp/q2d [--size 512]

Results append to scripts/sweep_grow_shrink.csv.
"""

from __future__ import annotations

import argparse
import csv
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT_CSV = REPO / "scripts" / "sweep_grow_shrink.csv"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True,
                    help="a completed validate_quality workdir")
    ap.add_argument("--size", type=int, default=512,
                    help="sample extent (for the min_size derivation)")
    ap.add_argument("--ndim", type=int, default=2, choices=(2, 3))
    ap.add_argument(
        "--combos",
        default="3:6,2:4,3:4,3:3,4:4,4:5,5:5,4:6,5:6,6:6",
        help="comma-separated grow:shrink pairs (3:6 = reference default)",
    )
    args = ap.parse_args()

    from cellulus_tpu.configs import InferenceConfig
    from cellulus_tpu.evaluate import evaluate
    from cellulus_tpu.segment import segment

    # resolve BEFORE chdir: a relative --workdir must not re-resolve later
    work = Path(args.workdir).resolve()
    os.chdir(work)  # evaluate writes results_bandwidth-*.txt in cwd
    object_size = int(args.size * 0.13)

    combos = [
        tuple(int(v) for v in c.split(":")) for c in args.combos.split(",")
    ]
    if args.ndim == 2:
        min_size = int(0.1 * np.pi * object_size**2 / 4)
    else:
        min_size = int(0.1 * 4.0 / 3.0 * np.pi * object_size**3 / 8)
    new_file = not OUT_CSV.exists()
    with open(OUT_CSV, "a", newline="") as fh:
        w = csv.writer(fh)
        if new_file:
            w.writerow(["ndim", "grow", "shrink", "F1", "SEG", "seconds"])
        for grow, shrink in combos:
            ic = InferenceConfig(
                **{
                    "crop_size": [252, 252],
                    "post_processing": "cell",
                    "grow_distance": grow,
                    "shrink_distance": shrink,
                    "min_size": min_size,
                    "dataset_config": {
                        "container_path": str(work / "data.zarr"),
                        "dataset_name": "train",
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
                }
            )
            seg_dir = work / "out.zarr" / "segmentation"
            if seg_dir.exists():
                shutil.rmtree(seg_dir)
            t0 = time.time()
            segment(ic)
            results = evaluate(ic)
            dt = time.time() - t0
            f1, seg_score = results[0]["F1"], results[0]["SEG"]
            print(
                f"grow={grow} shrink={shrink}: F1={f1:.3f} "
                f"SEG={seg_score:.3f} ({dt:.1f}s)",
                flush=True,
            )
            w.writerow([args.ndim, grow, shrink, round(f1, 4),
                        round(seg_score, 4), round(dt, 1)])
            fh.flush()


if __name__ == "__main__":
    main()
