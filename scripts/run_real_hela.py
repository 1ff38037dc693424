"""Train + infer + score on REAL HeLa microscopy pixels (vendored panels).

End-to-end real-data quality run for docs/validation.md: unsupervised
training on the two recovered real panels (scripts/extract_real_hela.py),
full inference on the clean 253x253 panel, and F1/SEG scored against the
classical silver truth (scripts/make_hela_pseudo_gt.py).

Model/recipe mirrors the reference's HeLa demo (reference
``docs/examples/2d/02-train.py``: num_fmaps=24, fmap_inc_factor=3, 5000
iterations, defaults elsewhere), with the crop size reduced to fit the
253px panel and bandwidth swept (the reference demo hand-picks one).

Usage: python scripts/run_real_hela.py [--iters N] [--skip-train] [--workdir D]
"""

import argparse
import os
import shutil
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
VENDORED = REPO / "examples" / "real-data" / "vendored"


def write_container(path, arrays, names=("train",)):
    from cellulus_tpu.io import zarr

    f = zarr.open(path, "a")
    for name in names:
        f[name] = arrays
        f[name].attrs.update(
            {"axis_names": ["s", "c", "y", "x"], "resolution": [1, 1]}
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--crop", type=int, default=140)
    ap.add_argument("--num-bandwidths", type=int, default=5)
    args = ap.parse_args()

    import cellulus_tpu
    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.io import zarr

    work = Path(
        args.workdir or (REPO / "examples" / "real-data" / "hela_run")
    ).resolve()  # resolve BEFORE chdir: relative --workdir must not re-resolve later
    work.mkdir(parents=True, exist_ok=True)
    os.chdir(work)

    panel = np.load(VENDORED / "hela_panel.npy")  # (253, 253) float32 [0,1]
    large = np.load(VENDORED / "hela_large.npy")  # (507, 507)
    silver = np.load(VENDORED / "hela_panel_silver_gt.npy")

    # two containers (different sample extents); training concatenates them
    # — guard each separately (a deleted large.zarr with a surviving
    # panel.zarr would otherwise never be regenerated)
    if not (work / "panel.zarr" / "train").exists():
        write_container(work / "panel.zarr", panel[None, None].astype(np.float32))
    if not (work / "large.zarr" / "train").exists():
        write_container(work / "large.zarr", large[None, None].astype(np.float32))

    # nuclei here are ~23 px across (silver-truth median area 417 px)
    object_size = 23
    config = ExperimentConfig(
        **{
            "experiment_name": "real-hela",
            "object_size": object_size,
            "normalization_factor": 1.0,  # pixels already in [0,1]
            "model_config": {"num_fmaps": 24, "fmap_inc_factor": 3},
            "train_config": {
                "crop_size": [args.crop, args.crop],
                "batch_size": 8,
                "max_iterations": args.iters,
                "initial_learning_rate": 4e-4,
                "density": 0.1,
                "kappa": 10.0,
                "num_workers": 4,
                "elastic_deform": True,
                "precision": "bfloat16",
                "save_model_every": max(1000, args.iters // 2),
                "save_snapshot_every": 10**9,
                "save_best_model_every": 100,
                "train_data_configs": [
                    {"container_path": str(work / "large.zarr"),
                     "dataset_name": "train"},
                    {"container_path": str(work / "panel.zarr"),
                     "dataset_name": "train"},
                ],
            },
            "inference_config": {
                "crop_size": [args.crop, args.crop],
                "tile_batch_size": 4,
                "num_bandwidths": args.num_bandwidths,
                # the reference's HeLa demo setting (reference
                # docs/examples/2d/03-infer.py:93): nuclei data — partition
                # by raw intensity inside each detection, which trims the
                # foreground spill of the uncertainty-channel Otsu
                "post_processing": "nucleus",
                "dataset_config": {
                    "container_path": str(work / "panel.zarr"),
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

    if (work / "out.zarr").exists():
        shutil.rmtree(work / "out.zarr")
    out = zarr.open(work / "out.zarr", "a")
    out["groundtruth"] = silver[None, None].astype(np.uint16)
    out["groundtruth"].attrs.update(
        {"axis_names": ["s", "c", "y", "x"], "resolution": [1, 1]}
    )

    config.model_config.checkpoint = work / "models" / "best_loss.ckpt"
    results = cellulus_tpu.infer(config)

    print("RESULTS vs silver truth (per bandwidth):")
    best = None
    for i, r in sorted(results.items()):
        print(f"  bandwidth[{i}]: F1={r['F1']:.3f} SEG={r['SEG']:.3f}")
        if best is None or r["F1"] > best[1]["F1"]:
            best = (i, r)
    print(
        f"BEST: bandwidth[{best[0]}] F1={best[1]['F1']:.3f} "
        f"SEG={best[1]['SEG']:.3f} (45 silver-truth nuclei)"
    )

    # overlay previews for visual audit
    from PIL import Image
    from scipy import ndimage

    seg = np.asarray(zarr.open(work / "out.zarr", "r")["segmentation"][0, best[0]])
    base = (np.clip(panel, 0, 1) * 255).astype(np.uint8)
    rgb = np.stack([base] * 3, -1)
    rng = np.random.default_rng(0)
    colors = rng.integers(60, 255, (int(seg.max()) + 1, 3), dtype=np.uint8)
    colors[0] = 0
    edge = ndimage.maximum_filter(seg, 3) != ndimage.minimum_filter(seg, 3)
    rgb[edge] = colors[seg[edge].astype(int)]
    Image.fromarray(rgb).resize((506, 506), Image.NEAREST).save(
        work / "hela_segmentation_overlay.png"
    )
    print(f"overlay: {work / 'hela_segmentation_overlay.png'}")
    return results


if __name__ == "__main__":
    main()
