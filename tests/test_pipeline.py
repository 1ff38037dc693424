"""End-to-end inference pipeline tests: train -> predict -> detect ->
segment -> evaluate on synthetic blobs."""

import numpy as np
import pytest

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig
from cellulus_tpu.io import zarr


def _experiment(container, out_container, clustering="meanshift", post="cell",
                train_iters=2):
    return ExperimentConfig(
        **{
            "experiment_name": "pipeline-test",
            "object_size": 10,
            "model_config": {"num_fmaps": 12, "fmap_inc_factor": 2},
            "train_config": {
                "batch_size": 2,
                "crop_size": [36, 36],
                "kappa": 6.0,
                "max_iterations": train_iters,
                "num_workers": 2,
                "elastic_deform": False,
                "save_model_every": 1000,
                "save_snapshot_every": 1000,
                "train_data_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
            },
            "inference_config": {
                "crop_size": [68, 68],
                "num_infer_iterations": 2,
                "clustering": clustering,
                "post_processing": post,
                "dataset_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
                "prediction_dataset_config": {
                    "container_path": str(out_container),
                    "dataset_name": "embeddings",
                },
                "detection_dataset_config": {
                    "container_path": str(out_container),
                    "dataset_name": "detection",
                    "secondary_dataset_name": "embeddings",
                },
                "segmentation_dataset_config": {
                    "container_path": str(out_container),
                    "dataset_name": "segmentation",
                    "secondary_dataset_name": "detection",
                },
            },
        }
    )


@pytest.mark.parametrize("clustering", ["meanshift", "greedy"])
def test_full_pipeline(blob_container_2d, tmp_path, monkeypatch, clustering):
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "out.zarr"
    config = _experiment(blob_container_2d, out, clustering=clustering)
    cellulus_tpu.train(config)
    config.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"

    cellulus_tpu.infer(config)

    f = zarr.open(out, "r")
    emb = f["embeddings"]
    assert emb.shape == (2, 3, 128, 128)
    assert emb.attrs["axis_names"] == ["s", "c", "y", "x"]
    data = emb[0]
    assert np.isfinite(data).all()
    assert data[-1].min() >= 0  # uncertainty channel

    det = f["detection"]
    assert det.shape == (2, 1, 128, 128)
    assert f["binary-segmentation"].shape == (2, 1, 128, 128)
    assert f["centered-embeddings"].shape == (2, 3, 128, 128)

    seg = f["segmentation"]
    assert seg.shape == (2, 1, 128, 128)
    assert np.asarray(seg[...]).max() >= 0


def test_checkpoint_sweep(blob_container_2d, tmp_path, monkeypatch):
    """`infer --checkpoint-sweep` scores every retained checkpoint against
    ground truth, writes checkpoint_sweep.json with a selected winner, and
    cleans up its throwaway containers."""
    import json
    import shutil

    monkeypatch.chdir(tmp_path)
    out = tmp_path / "out.zarr"
    config = _experiment(blob_container_2d, out)
    # stage GT + evaluation config (evaluate reads GT and segmentation
    # from one container; the sweep restages GT per throwaway container)
    src = zarr.open(blob_container_2d, "r")
    f = zarr.open(out, "a")
    f["groundtruth"] = np.asarray(src["groundtruth"][...])
    f["groundtruth"].attrs.update(src["groundtruth"].attrs.asdict())
    config.inference_config.evaluation_dataset_config = type(
        config.inference_config.dataset_config
    )(
        container_path=str(out),
        dataset_name="groundtruth",
        secondary_dataset_name="segmentation",
    )

    cellulus_tpu.train(config)
    models = tmp_path / "models"
    shutil.copy2(models / "best_loss.ckpt", models / "000001.ckpt")
    shutil.copy2(models / "best_loss.ckpt", models / "000002.ckpt")

    from cellulus_tpu.infer import checkpoint_sweep

    rows = checkpoint_sweep(config, checkpoint_dir=models)
    # training may leave additional numbered checkpoints of its own
    assert {"000001.ckpt", "000002.ckpt", "best_loss.ckpt"} <= set(rows)
    for row in rows.values():
        assert 0.0 <= row["F1"] <= 1.0 and 0.0 <= row["SEG"] <= 1.0
    # identical weights -> identical scores
    assert rows["000001.ckpt"]["F1"] == rows["000002.ckpt"]["F1"]
    report = json.loads((models / "checkpoint_sweep.json").read_text())
    assert report["selected"] in rows
    # throwaway sweep containers removed
    assert not list(tmp_path.glob("*.sweep-*"))


def test_evaluate_stage(blob_container_2d, tmp_path, monkeypatch):
    """Evaluate ground truth against itself: F1 = SEG = 1."""
    monkeypatch.chdir(tmp_path)
    from cellulus_tpu.configs import InferenceConfig
    from cellulus_tpu.evaluate import evaluate

    # copy gt into the expected (s, num_bandwidths, *sp) layout
    src = zarr.open(blob_container_2d, "r")
    gt = np.asarray(src["groundtruth"][...])
    out = tmp_path / "eval.zarr"
    f = zarr.open(out, "a")
    f["groundtruth"] = gt
    f["groundtruth"].attrs["axis_names"] = ["s", "c", "y", "x"]
    f["segmentation"] = gt  # (s, 1, y, x) == one bandwidth
    inference_config = InferenceConfig(
        dataset_config={
            "container_path": str(out),
            "dataset_name": "groundtruth",
        },
        evaluation_dataset_config={
            "container_path": str(out),
            "dataset_name": "groundtruth",
            "secondary_dataset_name": "segmentation",
        },
        num_bandwidths=1,
    )
    results = evaluate(inference_config)
    assert results[0]["F1"] == 1.0
    assert abs(results[0]["SEG"] - 1.0) < 1e-9
    assert (tmp_path / "results_bandwidth-0.txt").exists()


def test_evaluate_metrics_partial_overlap():
    from cellulus_tpu.evaluate import compute_F1, compute_pairwise_IoU

    gt = np.zeros((20, 20), np.uint16)
    gt[2:10, 2:10] = 1  # 64 px
    gt[12:18, 12:18] = 2  # 36 px
    pred = np.zeros((20, 20), np.uint16)
    pred[2:10, 2:10] = 5  # perfect match of gt 1
    pred[12:18, 2:6] = 7  # no overlap with gt 2
    IoU, SEG_sum, n_gt = compute_pairwise_IoU(pred, gt)
    assert n_gt == 2
    assert IoU.shape == (2, 2)
    np.testing.assert_allclose(IoU[0, 0], 1.0)
    f1, tp, fp, fn = compute_F1(IoU)
    assert (tp, fp, fn) == (1, 1, 1)
    np.testing.assert_allclose(SEG_sum, 1.0)


def test_evaluate_matches_reference_formula():
    """Cross-check the bincount-based IoU against a direct O(P*G*N) loop."""
    rng = np.random.default_rng(3)
    pred = rng.integers(0, 5, size=(40, 40)).astype(np.uint16)
    gt = rng.integers(0, 4, size=(40, 40)).astype(np.uint16)
    from cellulus_tpu.evaluate import compute_pairwise_IoU

    IoU, SEG_sum, n_gt = compute_pairwise_IoU(pred, gt)
    pred_ids = np.unique(pred)[1:]
    gt_ids = np.unique(gt)[1:]
    IoU_ref = np.zeros((len(pred_ids), len(gt_ids)))
    IoG_ref = np.zeros_like(IoU_ref)
    for j, p in enumerate(pred_ids):
        for k, g in enumerate(gt_ids):
            inter = ((pred == p) & (gt == g)).sum()
            union = ((pred == p) | (gt == g)).sum()
            IoU_ref[j, k] = inter / union
            IoG_ref[j, k] = inter / (gt == g).sum()
    np.testing.assert_allclose(IoU, IoU_ref, rtol=1e-12)
    np.testing.assert_allclose(SEG_sum, IoU_ref[IoG_ref > 0.5].sum(), rtol=1e-12)


def test_segment_remove_halo():
    from cellulus_tpu.segment import remove_halo

    seg = np.zeros((30, 30), np.uint16)
    seg[5:25, 5:12] = 1
    seg[5:25, 14:21] = 2  # 2-px gap between instances
    out = remove_halo(seg, grow_distance=3, shrink_distance=6)
    # shrink > grow: instances erode, gap widens, ids preserved
    assert set(np.unique(out)) <= {0, 1, 2}
    assert (out == 1).sum() < (seg == 1).sum()
    assert ((out == 1) & (seg != 1)).sum() == 0


def test_segment_nucleus_mode():
    from cellulus_tpu.segment import nucleus_partition

    raw = np.zeros((20, 20), np.float32)
    raw[4:10, 4:10] = 1.0  # bright nucleus inside a larger detection
    seg = np.zeros((20, 20), np.uint16)
    seg[2:12, 2:12] = 3
    out = nucleus_partition(seg, raw)
    assert (out[4:10, 4:10] == 3).all()
    assert out[2, 2] == 0  # dim region dropped


def test_nucleus_partition_bbox_equals_reference_loop():
    """The bbox-confined nucleus partition == the reference's full-image
    per-id loop, on random multi-instance data with touching instances."""
    import numpy as np

    from cellulus_tpu.ops.otsu import threshold_otsu
    from cellulus_tpu.segment import nucleus_partition
    from scipy.ndimage import binary_fill_holes

    def reference_loop(segmentation, raw_image):
        out = np.zeros_like(segmentation)
        ids = np.unique(segmentation)
        ids = ids[ids != 0]
        for id_ in ids:
            id_mask = segmentation == id_
            coords = np.nonzero(id_mask)
            bbox = tuple(
                slice(int(c.min()), int(c.max()) + 1) for c in coords
            )
            values = raw_image[id_mask]
            if values.max() == values.min():
                mask = id_mask
            else:
                thr = threshold_otsu(values)
                mask = id_mask & (raw_image > thr)
            mask_small = binary_fill_holes(mask[bbox])
            mask = mask.copy()
            mask[bbox] = mask_small
            out[mask] = id_
        return out

    rng = np.random.default_rng(3)
    for trial in range(3):
        seg = np.zeros((60, 60), np.uint16)
        for id_ in range(1, 9):
            y, x = rng.integers(0, 44, 2)
            h, w = rng.integers(6, 16, 2)
            seg[y : y + h, x : x + w] = id_  # later boxes overwrite: touching
        raw = rng.random((60, 60)).astype(np.float32)
        raw[seg > 0] += 1.0  # nuclei brighter than background
        np.testing.assert_array_equal(
            nucleus_partition(seg, raw), reference_loop(seg, raw)
        )


def test_nucleus_partition_device_matches_host():
    """The one-dispatch device nucleus kernel (all instances vectorized:
    per-id Otsu + 4-connected hole fill) equals the per-instance host loop
    exactly on realistic (non-nested) multi-instance data — including
    constant-intensity instances, instances with holes, and an
    all-background sample."""
    from cellulus_tpu.ops.nucleus import nucleus_partition_device
    from cellulus_tpu.segment import nucleus_partition

    rng = np.random.default_rng(7)
    for trial in range(3):
        seg = np.zeros((60, 60), np.uint16)
        for id_ in range(1, 9):
            y, x = rng.integers(0, 44, 2)
            h, w = rng.integers(6, 16, 2)
            seg[y : y + h, x : x + w] = id_
        raw = rng.random((60, 60)).astype(np.float32)
        raw[seg > 0] += 1.0
        # carve a dim cavity into instance 1 so hole filling is exercised
        ys, xs = np.nonzero(seg == 1)
        if len(ys) > 9:
            cy, cx = int(np.median(ys)), int(np.median(xs))
            raw[cy : cy + 2, cx : cx + 2] = 0.0
        # make instance 2 constant-intensity (kept whole, no threshold)
        raw[seg == 2] = 0.5
        np.testing.assert_array_equal(
            nucleus_partition_device(seg, raw), nucleus_partition(seg, raw),
            err_msg=f"trial {trial}",
        )

    # all-background
    empty = np.zeros((16, 16), np.uint16)
    np.testing.assert_array_equal(
        nucleus_partition_device(empty, np.zeros((16, 16), np.float32)),
        np.zeros((16, 16), np.uint16),
    )


def test_segment_nucleus_device_stage(blob_container_2d, tmp_path, monkeypatch):
    """device_nucleus=True routes the segment stage through the device
    kernel and the stage output equals the host-path stage bit-for-bit."""
    import cellulus_tpu.segment as segment_mod

    seg = np.zeros((1, 2, 40, 40), np.uint16)
    seg[0, :, 5:20, 5:20] = 1
    seg[0, :, 25:36, 22:38] = 2
    raw = np.zeros((1, 1, 40, 40), np.float32)
    raw[0, 0, 8:17, 8:17] = 1.0
    raw[0, 0, 27:34, 25:36] = 0.8

    def build(out_path, device_nucleus):
        from cellulus_tpu.configs import InferenceConfig

        raw_c = tmp_path / "raw.zarr"
        f = zarr.open(raw_c, "a")
        if "raw" not in f:
            f["raw"] = raw
            f["raw"].attrs.update(
                {"axis_names": ["s", "c", "y", "x"], "resolution": [1, 1]}
            )
        out_c = tmp_path / out_path
        g = zarr.open(out_c, "a")
        g["detection"] = seg
        g["detection"].attrs.update(
            {"axis_names": ["s", "c", "y", "x"], "resolution": [1, 1]}
        )
        return InferenceConfig(
            post_processing="nucleus",
            min_size=4,
            num_bandwidths=2,
            device_nucleus=device_nucleus,
            dataset_config={
                "container_path": str(raw_c), "dataset_name": "raw"
            },
            segmentation_dataset_config={
                "container_path": str(out_c),
                "dataset_name": "segmentation",
                "secondary_dataset_name": "detection",
            },
        )

    calls = []
    import cellulus_tpu.ops.nucleus as nuc_mod

    real = nuc_mod.nucleus_partition_device

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(nuc_mod, "nucleus_partition_device", spy)

    segment_mod.segment(build("host.zarr", False))
    assert not calls
    segment_mod.segment(build("dev.zarr", True))
    assert calls
    a = zarr.open(tmp_path / "host.zarr", "r")["segmentation"]
    b = zarr.open(tmp_path / "dev.zarr", "r")["segmentation"]
    np.testing.assert_array_equal(np.asarray(a[...]), np.asarray(b[...]))


def test_segment_nucleus_split_containers(blob_container_2d, tmp_path):
    """Nucleus-mode segment reads the raw image from the RAW container, not
    the output container (the reference assumes its single-container layout,
    reference segment.py:53 — regression test for the split-container fix)."""
    import numpy as np

    from cellulus_tpu.configs import InferenceConfig
    from cellulus_tpu.segment import segment

    out = tmp_path / "out_only.zarr"  # raw lives elsewhere
    f = zarr.open(out, "a")
    det = np.zeros((2, 1, 128, 128), np.uint16)
    det[:, 0, 30:60, 30:60] = 1
    f["detection"] = det
    f["detection"].attrs.update(
        {"axis_names": ["s", "c", "y", "x"], "resolution": [1, 1]}
    )

    ic = InferenceConfig(
        **{
            "crop_size": [100, 100],
            "post_processing": "nucleus",
            "min_size": 10,
            "dataset_config": {
                "container_path": str(blob_container_2d),
                "dataset_name": "train",
            },
            "segmentation_dataset_config": {
                "container_path": str(out),
                "dataset_name": "segmentation",
                "secondary_dataset_name": "detection",
            },
        }
    )
    segment(ic)
    seg = np.asarray(zarr.open(out, "r")["segmentation"][...])
    assert seg.shape == (2, 1, 128, 128)
