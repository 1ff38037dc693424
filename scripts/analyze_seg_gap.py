"""Why does 3D SEG (0.693) trail 2D SEG (0.882)? Intrinsic or fixable?

Decisive, training-free experiment: perturb the ground truth itself by a
uniform r-voxel per-instance erosion (a perfect segmentation with an
r-voxel boundary error everywhere — the best-case shape of a learned
model's residual) and score it with the REAL evaluate_arrays metric.
If the same physical boundary error costs far more SEG in 3D than in 2D,
the gap is geometric (small-radius spheres: IoU ~ ((R-r)/R)^d), not a
training defect.

Uses the exact fixtures the validated quality runs score against:
2D blobs at size 512 (radii ~20-46 px) and 3D blobs at size 128
(radii ~5-11.5 vox) — see scripts/validate_quality.py defaults.

Run: python scripts/analyze_seg_gap.py   (host-only, a few seconds)
"""

import sys
from pathlib import Path

import numpy as np
from scipy import ndimage

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from synthetic import make_blobs  # noqa: E402

from cellulus_tpu.evaluate import evaluate_arrays  # noqa: E402


def erode_instances(labels: np.ndarray, r: int) -> np.ndarray:
    """Erode every instance independently by an r-voxel ball."""
    out = np.zeros_like(labels)
    struct = ndimage.generate_binary_structure(labels.ndim, 1)
    for lab in np.unique(labels):
        if lab == 0:
            continue
        mask = labels == lab
        out[ndimage.binary_erosion(mask, struct, iterations=r)] = lab
    return out


def radius_stats(labels: np.ndarray) -> tuple[float, float]:
    """Mean equivalent radius and mean boundary fraction of instances."""
    ndim = labels.ndim
    radii, bfracs = [], []
    struct = ndimage.generate_binary_structure(ndim, 1)
    for lab in np.unique(labels):
        if lab == 0:
            continue
        mask = labels == lab
        vol = mask.sum()
        if ndim == 2:
            radii.append(float(np.sqrt(vol / np.pi)))
        else:
            radii.append(float((3 * vol / (4 * np.pi)) ** (1 / 3)))
        shell = mask & ~ndimage.binary_erosion(mask, struct)
        bfracs.append(float(shell.sum() / vol))
    return float(np.mean(radii)), float(np.mean(bfracs))


def main() -> None:
    print("erosion-r | 2D SEG (512^2) | 3D SEG (128^3)")
    rows = {}
    for ndim, size in ((2, 512), (3, 128)):
        _, labels = make_blobs(2, size, ndim, seed=11)
        gt = labels[:, 0]
        r_mean, b_mean = radius_stats(gt[0])
        print(
            f"# {ndim}D: mean equivalent radius {r_mean:.1f} vox, "
            f"boundary-shell fraction {100 * b_mean:.1f}% of volume"
        )
        for r in (1, 2, 3):
            pred = np.stack([erode_instances(g, r) for g in gt])
            res = evaluate_arrays(pred, gt)
            rows.setdefault(r, {})[ndim] = res["SEG"]
    for r in sorted(rows):
        d2 = rows[r].get(2, float("nan"))
        d3 = rows[r].get(3, float("nan"))
        print(f"{r:9d} | {d2:14.3f} | {d3:14.3f}")
    print(
        "\nachieved: 2D SEG 0.882 (2000 it), 3D SEG 0.693 (2500 it) — "
        "compare each to its column above to read off the equivalent "
        "uniform boundary error in voxels."
    )


if __name__ == "__main__":
    main()
