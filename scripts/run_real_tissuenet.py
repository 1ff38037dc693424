"""Train + infer + score on REAL TissueNet tissue panels (vendored).

Second real-microscopy quality run, this one against REAL ground truth:
the raw panels and GT instance labels recovered from the paper's own
appendix figure by scripts/extract_real_tissuenet.py, with the paper's
printed per-panel F1 values as the yardstick (PAPER_F1 there).

Per tissue: unsupervised training on the five recovered 2-channel
panels, full inference (predict/detect/segment) with a bandwidth sweep,
and per-panel F1/SEG against the recovered real GT. Panels are upsampled
2x (bilinear raw / nearest GT) so cell diameters (~20 px) sit in the
regime the reference's demos use (object_size ~23-30); IoU-based metrics
are resolution-invariant up to boundary rounding.

Model/recipe mirrors the reference's 2D demo (reference
``docs/examples/2d/02-train.py``: num_fmaps=24, fmap_inc_factor=3, 5000
iterations) with "cell" post-processing (whole-cell GT) and object_size
derived from the recovered GT's median instance area.

Usage:
  python scripts/run_real_tissuenet.py --tissue immune [--iters N]
      [--skip-train] [--scale 2]
"""

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))
VENDORED = REPO / "examples" / "real-data" / "vendored" / "tissuenet"

from extract_real_tissuenet import PAPER_F1  # noqa: E402


def upsample_bilinear(x: np.ndarray, k: int) -> np.ndarray:
    """(... , y, x) float -> bilinear k-x upsample of the trailing 2 dims."""
    from scipy import ndimage

    zoom = [1] * (x.ndim - 2) + [k, k]
    return ndimage.zoom(x, zoom, order=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tissue", default="immune",
                    choices=("immune", "skin", "lung", "pancreas", "all"))
    ap.add_argument("--iters", type=int, default=5000)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--scale", type=float, default=2,
                    help="upsample factor for raw/GT (fractional values "
                         "supported for the paper's Table-2 scale sweep; "
                         "crop auto-clamps to the scaled panel size)")
    ap.add_argument("--crop", type=int, default=140)
    ap.add_argument("--num-bandwidths", type=int, default=5)
    ap.add_argument("--bandwidth", type=float, default=None,
                    help="override the sweep's base bandwidth "
                         "(default: 0.5 * object_size)")
    ap.add_argument("--lr-milestones", type=int, nargs="*", default=None,
                    help="iterations at which lr is divided by 10 "
                         "(paper recipe style)")
    ap.add_argument("--num-fmaps", type=int, default=24,
                    help="U-Net base feature maps (24 = reference demo, "
                         "64 = paper Appendix A recipe)")
    ap.add_argument("--grad-clip", type=float, default=None,
                    help="clip gradient global norm (train_config."
                    "grad_clip_norm) — the pancreas retrain at lr 4e-4 "
                    "diverged without it")
    ap.add_argument("--log-grad-norm", action="store_true",
                    help="record the raw gradient norm in loss.csv "
                    "(train_config.log_grad_norm)")
    ap.add_argument("--lr", type=float, default=4e-4,
                    help="initial learning rate (4e-4 = reference demo, "
                         "4e-5 = paper Appendix A recipe)")
    ap.add_argument("--threshold-quantile", type=float, default=None,
                    help="per-sample foreground quantile (0-100) instead "
                         "of Otsu (q90 beat Otsu by +0.09 mean panel F1 "
                         "on immune, detect_sweep.json)")
    ap.add_argument("--fast", action="store_true",
                    help="TPU fast path: elastic augmentation on device + "
                         "4 steps per dispatch — the 1-core host's elastic "
                         "workers cap training at ~1.8 it/s otherwise")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (e.g. while the TPU is held or "
                         "wedged); flips the JAX platform before first use")
    ap.add_argument("--resume", action="store_true",
                    help="resume training from the latest numbered "
                         "checkpoint in <workdir>/models (for runs stopped "
                         "via the STOP sentinel or interrupted)")
    ap.add_argument("--skip-infer", action="store_true",
                    help="train only (score later with --skip-train)")
    ap.add_argument("--checkpoint", default=None,
                    help="score THIS checkpoint instead of best_loss.ckpt "
                         "(path relative to the workdir; use with "
                         "--skip-train and --results-tag for a "
                         "checkpoint-vs-F1 curve)")
    ap.add_argument("--keep-out", action="store_true",
                    help="keep out_<tag>.zarr after a tagged run (the "
                         "detect sweep re-clusters those embeddings)")
    ap.add_argument("--results-tag", default=None,
                    help="write results_<tag>.json and a throwaway "
                         "out_<tag>.zarr instead of clobbering the "
                         "canonical results.json/out.zarr (overlay "
                         "preview is skipped)")
    ap.add_argument("--save-every", type=int, default=None,
                    help="numbered-checkpoint cadence (default "
                         "max(1000, iters//2)); 1000 gives the "
                         "checkpoint-vs-F1 curve its x-axis")
    ap.add_argument("--normalize-per-panel", action="store_true",
                    help="stretch each panel/channel so its 99.5th "
                         "percentile maps to 1.0 — the recovered figure "
                         "panels carry arbitrary display dimming (immune "
                         "panel 3's membrane p99 is 0.28); TissueNet's own "
                         "pipeline normalizes per image")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cellulus_tpu
    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.evaluate import compute_F1, compute_pairwise_IoU
    from cellulus_tpu.io import zarr

    work = Path(
        args.workdir or (REPO / "examples" / "real-data" / f"tissuenet_{args.tissue}")
    ).resolve()  # resolve BEFORE chdir: relative --workdir must not re-resolve later
    work.mkdir(parents=True, exist_ok=True)
    os.chdir(work)
    out_name = f"out_{args.results_tag}.zarr" if args.results_tag else "out.zarr"

    tissues = (
        ("immune", "skin", "lung", "pancreas")
        if args.tissue == "all"
        else (args.tissue,)
    )
    raw = np.concatenate(
        [np.load(VENDORED / f"{t}_raw.npy") for t in tissues]
    )  # (5T, 2, 126, 126)
    gt = np.concatenate(
        [np.load(VENDORED / f"{t}_gt.npy") for t in tissues]
    )  # (5T, 126, 126)
    paper_f1 = [f for t in tissues for f in PAPER_F1[t]]
    panel_names = [f"{t}/{i}" for t in tissues for i in range(5)]
    # keep integral scales as ints: the data.zarr source_stamp of every
    # committed workdir recorded e.g. 3, and 3.0 would force regeneration
    k = int(args.scale) if float(args.scale).is_integer() else args.scale
    if args.normalize_per_panel:
        p = np.percentile(raw, 99.5, axis=(-2, -1), keepdims=True)
        raw = np.clip(raw / np.maximum(p, 1e-3), 0.0, 1.0)
    from real_data_common import derive_object_size, gt_upsample

    raw_up = upsample_bilinear(raw.astype(np.float32), k)
    gt_up = gt_upsample(gt, k)

    # object size from the recovered GT's median instance area (upsampled)
    object_size = derive_object_size(gt, k)
    print(f"{args.tissue}: object_size {object_size} (at {k}x, from the "
          "median GT instance area)")

    # clamp the train/infer crop to the scaled panel (low scales shrink
    # panels below the 140 default), keeping a U-Net-valid size
    panel = min(raw_up.shape[-2:])
    if args.crop > panel:
        from cellulus_tpu.models import compute_geometry as _geom

        crop = panel
        while crop > 16:
            try:
                _geom((crop, crop), [[2, 2]])
                break
            except Exception:
                crop -= 1
        print(f"crop {args.crop} > {panel}px panel at scale {k}; using {crop}")
        args.crop = crop

    # regenerate data.zarr when the flags that shape its pixels change —
    # reusing a container built under different --scale/--tissue/
    # --normalize-per-panel would silently train and score on stale data
    # while results.json records the new flags
    data_stamp = {
        "tissue": args.tissue,
        "scale": k,
        "normalize_per_panel": bool(args.normalize_per_panel),
    }
    f = zarr.open(work / "data.zarr", "a")
    existing = (
        f["train"].attrs.get("source_stamp")
        if (work / "data.zarr" / "train").exists()
        else None
    )
    if existing != data_stamp:
        if existing is not None:
            print(f"data.zarr stamp {existing} != {data_stamp}; regenerating")
            shutil.rmtree(work / "data.zarr")
            f = zarr.open(work / "data.zarr", "a")
        f["train"] = raw_up
        f["train"].attrs.update(
            {
                "axis_names": ["s", "c", "y", "x"],
                "resolution": [1, 1],
                "source_stamp": data_stamp,
            }
        )

    config = ExperimentConfig(
        **{
            "experiment_name": f"real-tissuenet-{args.tissue}",
            "object_size": object_size,
            "normalization_factor": 1.0,  # pixels already in [0, 1]
            "model_config": {"num_fmaps": args.num_fmaps,
                             "fmap_inc_factor": 3},
            "train_config": {
                "crop_size": [args.crop, args.crop],
                "batch_size": 8,
                "max_iterations": args.iters,
                "initial_learning_rate": args.lr,
                "density": 0.1,
                "kappa": 10.0,
                "num_workers": 4,
                "elastic_deform": True,
                **({"elastic_on_device": True, "steps_per_dispatch": 4}
                   if args.fast else {}),
                "precision": "bfloat16",
                "save_model_every": (
                    args.save_every
                    if args.save_every is not None
                    else max(1000, args.iters // 2)
                ),
                "save_snapshot_every": 10**9,
                "save_best_model_every": 100,
                **({"lr_milestones": args.lr_milestones}
                   if args.lr_milestones else {}),
                **({"grad_clip_norm": args.grad_clip}
                   if args.grad_clip is not None else {}),
                **({"log_grad_norm": True} if args.log_grad_norm else {}),
                "train_data_configs": [
                    {"container_path": str(work / "data.zarr"),
                     "dataset_name": "train"},
                ],
            },
            "inference_config": {
                "crop_size": [args.crop, args.crop],
                "tile_batch_size": 4,
                "num_bandwidths": args.num_bandwidths,
                **({"bandwidth": args.bandwidth} if args.bandwidth else {}),
                **({"threshold_quantile": args.threshold_quantile}
                   if args.threshold_quantile else {}),
                # whole-cell ground truth -> "cell" halo-removal mode
                "post_processing": "cell",
                "dataset_config": {
                    "container_path": str(work / "data.zarr"),
                    "dataset_name": "train",
                },
                "prediction_dataset_config": {
                    "container_path": str(work / out_name),
                    "dataset_name": "embeddings",
                },
                "detection_dataset_config": {
                    "container_path": str(work / out_name),
                    "dataset_name": "detection",
                    "secondary_dataset_name": "embeddings",
                },
                "segmentation_dataset_config": {
                    "container_path": str(work / out_name),
                    "dataset_name": "segmentation",
                    "secondary_dataset_name": "detection",
                },
                "evaluation_dataset_config": {
                    "container_path": str(work / out_name),
                    "dataset_name": "groundtruth",
                    "secondary_dataset_name": "segmentation",
                },
            },
        }
    )

    if not args.skip_train:
        if args.resume:
            ckpts = sorted(
                (work / "models").glob("[0-9]" * 6 + "*.ckpt"),
                key=lambda p: int(p.stem),
            )
            if ckpts:
                config.model_config.checkpoint = ckpts[-1]
                print(f"resuming from {ckpts[-1]}")
        cellulus_tpu.train(config)
        config.model_config.checkpoint = None

    if args.skip_infer:
        return

    if (work / out_name).exists():
        shutil.rmtree(work / out_name)
    out = zarr.open(work / out_name, "a")
    out["groundtruth"] = gt_up[:, None].astype(np.uint16)
    out["groundtruth"].attrs.update(
        {"axis_names": ["s", "c", "y", "x"], "resolution": [1, 1]}
    )

    ckpt = (
        (work / args.checkpoint)
        if args.checkpoint
        else work / "models" / "best_loss.ckpt"
    )
    if not ckpt.exists():
        # gitignored models/ is reboot-wiped scratch; committed runs keep
        # their checkpoints under git-tracked ckpt/ (round-3 lesson) —
        # fall back there so --skip-train scoring survives reboots
        alt = work / "ckpt" / ckpt.name
        if alt.exists():
            print(f"{ckpt} missing; using committed {alt}")
            ckpt = alt
    config.model_config.checkpoint = ckpt
    results = cellulus_tpu.infer(config)

    # per-panel scores at the best aggregate-F1 bandwidth
    best_bw = max(sorted(results), key=lambda i: results[i]["F1"])
    seg = np.asarray(zarr.open(work / out_name, "r")["segmentation"])
    rows = []
    for s in range(seg.shape[0]):
        res = compute_pairwise_IoU(seg[s, best_bw], gt_up[s])
        if res is None:
            continue
        IoU, seg_sum, n_gt = res
        f1, tp, fp, fn = compute_F1(IoU)
        rows.append(
            {"panel": panel_names[s], "F1": round(f1, 3),
             "SEG": round(seg_sum / max(n_gt, 1), 3),
             "paper_F1": paper_f1[s], "n_gt": n_gt}
        )
    summary = {
        "tissue": args.tissue,
        "iters": args.iters,
        "object_size": object_size,
        # provenance: which flags + which checkpoint produced these scores
        # (a later re-predict into the same workdir makes old results.json
        # files silently stale otherwise)
        "flags": {k: v for k, v in vars(args).items()
                  if k not in ("workdir",)},
        "checkpoint_mtime": int(ckpt.stat().st_mtime) if ckpt.exists() else None,
        "best_bandwidth_index": best_bw,
        "aggregate": {kk: round(vv, 3) for kk, vv in results[best_bw].items()},
        "paper_mean_panel_F1": round(float(np.mean(paper_f1)), 3),
        "mean_panel_F1": round(float(np.mean([r["F1"] for r in rows])), 3),
        "per_panel": rows,
        "per_tissue_mean_F1": {
            t: round(float(np.mean(
                [r["F1"] for r in rows if r["panel"].startswith(t + "/")]
            )), 3)
            for t in tissues
        },
    }
    print("RESULTS vs recovered real GT:")
    print(json.dumps(summary, indent=2))
    results_name = (
        f"results_{args.results_tag}.json" if args.results_tag else "results.json"
    )
    (work / results_name).write_text(json.dumps(summary, indent=2))

    if args.results_tag:
        # tagged runs are throwaway probes (checkpoint-vs-F1 curves): keep
        # only the scores, not ~35 MB of embeddings per tag, and leave the
        # canonical out.zarr/overlay untouched — unless the detect sweep
        # asked for the embeddings (--keep-out)
        if not args.keep_out:
            shutil.rmtree(work / out_name, ignore_errors=True)
        return summary

    # overlay previews for visual audit (panel 2 = 50th percentile)
    from PIL import Image
    from scipy import ndimage

    s = 2
    base = (np.clip(raw_up[s, 0], 0, 1) * 255).astype(np.uint8)  # nuclear
    memb = (np.clip(raw_up[s, 1], 0, 1) * 255).astype(np.uint8)
    rgb = np.stack([base, memb, memb], -1)
    lab = seg[s, best_bw]
    edge = ndimage.maximum_filter(lab, 3) != ndimage.minimum_filter(lab, 3)
    rgb[edge] = [255, 255, 0]
    Image.fromarray(rgb).resize((504, 504), Image.NEAREST).save(
        work / f"{args.tissue}_overlay.png"
    )
    print(f"overlay: {work / (args.tissue + '_overlay.png')}")
    return summary


if __name__ == "__main__":
    main()
