"""Recover REAL TissueNet microscopy panels + real ground truth from the
reference's published results figure.

The build sandbox has zero network egress, so the TissueNet dataset the
reference's paper evaluates on (Table 1) cannot be downloaded. The
reference repository does, however, ship the paper's appendix figure
(``docs/overrides/resources/paper/paper_08.png``) showing, for each of
four TissueNet tissue types (Immune, Skin, Lung, Pancreas), five
percentile samples (0/25/50/75/100th of Cellulus's own F1 distribution)
as aligned panel rows:

  Raw Image / OCE / Predicted Segmentation (with the paper's printed
  per-panel F1) / Ground Truth.

This script inverts the figure rendering to recover:

- **raw** 2-channel images: the panels render nuclear as red and
  membrane as cyan; G and B are equal to within the page's halftone
  dither (measured corr >= 0.995), so ch0 = R and ch1 = (G+B)/2, each
  3x3-median-filtered to suppress the dither. The 0th-percentile panel
  carries a "<Tissue> Dataset" label box that is masked and inpainted.
- **real GT instance labels**: the GT row renders each cell instance
  with a bevel-shaded palette color (hue x brightness, one specular
  highlight per instance) over black. The decoder median-filters the
  dither, classifies pixels into (12 hue bins x 2 brightness levels +
  gray) classes, cuts seams where the value channel dips below 80% of
  its local max (the shading between touching same-color instances),
  takes connected components per class, splits any remaining
  oversized component with >= 2 well-separated specular highlights by
  nearest-highlight assignment, and finally assigns seam/antialiased
  pixels to the nearest instance.

The recovered GT is a faithful but not pixel-perfect decode of the
rendered figure (antialiasing blurs 1-2 px at instance borders);
docs/validation.md labels every number measured against it accordingly.
The paper's printed per-panel F1 values (PAPER_F1 below) are the
comparison yardstick.

Outputs to ``examples/real-data/vendored/tissuenet/``:
  {tissue}_raw.npy  (5, 2, 126, 126) float32 in [0, 1]
  {tissue}_gt.npy   (5, 126, 126)    uint16 instance labels
  {tissue}_preview.png               side-by-side visual audit strip

Usage: python scripts/extract_real_tissuenet.py
"""

from pathlib import Path

import numpy as np
from PIL import Image
from scipy import ndimage

REPO = Path(__file__).resolve().parents[1]
PAGE = Path("/root/reference/docs/overrides/resources/paper/paper_08.png")
OUT_DIR = REPO / "examples" / "real-data" / "vendored" / "tissuenet"

P = 126  # panel edge length in page pixels

# tissue -> (raw_row_top, gt_row_top, (col_lefts...))
LEFT_COLS = (161, 291, 421, 552, 682)
RIGHT_COLS = (862, 992, 1122, 1253, 1383)
BLOCKS = {
    "immune": (224, 615, LEFT_COLS),
    "skin": (224, 615, RIGHT_COLS),
    "lung": (767, 1158, LEFT_COLS),
    "pancreas": (767, 1158, RIGHT_COLS),
}

# the paper's printed F1 on each percentile panel (read from the figure's
# "F1 = ..." boxes at full resolution)
PAPER_F1 = {
    "immune": (0.388, 0.640, 0.716, 0.763, 0.822),
    "skin": (0.271, 0.500, 0.632, 0.684, 0.833),
    "lung": (0.330, 0.491, 0.534, 0.613, 0.762),
    "pancreas": (0.122, 0.615, 0.675, 0.724, 0.840),
}


def _median3(img: np.ndarray) -> np.ndarray:
    return ndimage.median_filter(img.astype(np.float32), size=3)


def _inpaint(vals: np.ndarray, mask: np.ndarray, iters: int = 10) -> np.ndarray:
    """Fill masked pixels by iterated 5x5 neighborhood mean of valid pixels
    (same scheme as scripts/extract_real_hela.py)."""
    out = vals.copy()
    valid = ~mask
    for _ in range(iters):
        if valid.all():
            break
        acc = np.zeros_like(out)
        cnt = np.zeros_like(out)
        v = np.where(valid, out, 0.0)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                acc += np.roll(np.roll(v, dy, 0), dx, 1)
                cnt += np.roll(np.roll(valid.astype(np.float32), dy, 0), dx, 1)
        fill = ~valid & (cnt > 0)
        out[fill] = acc[fill] / cnt[fill]
        valid = valid | fill
    return out


def extract_raw(rgb: np.ndarray, inpaint_label_box: bool) -> np.ndarray:
    """(126,126,3) uint8 figure panel -> (2,126,126) float32 in [0,1]."""
    r = _median3(rgb[..., 0])
    cyan = _median3((rgb[..., 1].astype(np.float32) + rgb[..., 2]) / 2.0)
    chans = np.stack([r, cyan]) / 255.0
    if inpaint_label_box:
        # the dataset-label box: a solid achromatic light-gray rectangle
        # (black text inside) in the top rows. Real white cells are
        # achromatic too, so detect the box by its long horizontal runs of
        # gray fill (morphological opening with a 1x30 element), then mask
        # its padded bounding rectangle only.
        rr, gg, bb = (rgb[..., i].astype(np.int32) for i in range(3))
        achroma = (np.abs(rr - gg) < 24) & (np.abs(gg - bb) < 24)
        grayfill = achroma & (rgb[..., 1] > 170) & (rgb[..., 1] < 250)
        grayfill &= np.arange(rgb.shape[0])[:, None] < 28
        runs = ndimage.binary_opening(grayfill, np.ones((1, 30), bool))
        box = np.zeros(rgb.shape[:2], bool)
        if runs.any():
            ys, xs = np.nonzero(runs)
            box[
                max(ys.min() - 2, 0) : ys.max() + 3,
                max(xs.min() - 2, 0) : xs.max() + 3,
            ] = True
        chans = np.stack([_inpaint(c, box) for c in chans])
    return np.clip(chans, 0.0, 1.0).astype(np.float32)


def decode_gt(rgb: np.ndarray, min_size: int = 12, seam_k: float = 0.80,
              split_factor: float = 1.6) -> np.ndarray:
    """(126,126,3) uint8 rendered GT panel -> (126,126) int32 labels."""
    med = np.stack([_median3(rgb[..., i]) for i in range(3)], -1)
    hsv = np.asarray(
        Image.fromarray(med.astype(np.uint8)).convert("HSV")
    ).astype(np.float32)
    H, S, V = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    bg = V <= 60
    gray = (~bg) & (S < 60)
    centers = np.array(
        [0, 20, 38, 60, 80, 110, 132, 150, 165, 185, 203, 225], np.float32
    )
    d = np.abs(H[..., None] - centers[None, None, :])
    d = np.minimum(d, 256 - d)
    cls = (d.argmin(-1) + 1) * 2 + (V > 150).astype(np.int64)
    cls[gray] = 100 + (V[gray] > 150)
    cls[bg] = 0

    # seam cut: the bevel shading dips between touching same-class cells
    vmax = ndimage.maximum_filter(V, 5)
    seam = (~bg) & (V < seam_k * vmax)

    lab = np.zeros(rgb.shape[:2], np.int32)
    nxt = 0
    for c in np.unique(cls):
        if c == 0:
            continue
        m = (cls == c) & ~seam
        if not m.any():
            continue
        comp, n = ndimage.label(m)
        lab[m] = comp[m] + nxt
        nxt += n
    sizes = np.bincount(lab.ravel())
    lab[np.isin(lab, np.where(sizes < min_size)[0])] = 0

    # split oversized components with >= 2 specular highlights
    Vs = ndimage.gaussian_filter(V, 1.2)
    is_peak = Vs >= ndimage.maximum_filter(Vs, footprint=np.ones((7, 7), bool))
    sizes = np.bincount(lab.ravel())
    live = sizes[1:][sizes[1:] > 0]
    med_sz = np.median(live) if live.size else 0.0
    for lid in np.where(sizes > split_factor * med_sz)[0]:
        if lid == 0:
            continue
        comp = lab == lid
        mk, npk = ndimage.label(comp & is_peak & (Vs > 0.7 * Vs[comp].max()))
        if npk < 2:
            continue
        _, (iy, ix) = ndimage.distance_transform_edt(mk == 0, return_indices=True)
        nearest = mk[iy, ix]
        lab[comp] = np.where(nearest[comp] == 1, lid, nxt + nearest[comp] - 1)
        nxt += npk

    # absorb seam/antialiased pixels into the nearest instance
    fill = (lab == 0) & ~bg
    if fill.any():
        _, (iy, ix) = ndimage.distance_transform_edt(lab == 0, return_indices=True)
        lab[fill] = lab[iy[fill], ix[fill]]
    lab[bg] = 0
    u = np.unique(lab)
    remap = np.zeros(u.max() + 1, np.int32)
    remap[u] = np.arange(len(u))
    return remap[lab]


def preview(raws: np.ndarray, gts: np.ndarray, path: Path) -> None:
    """2-row audit strip: recovered raw (as RGB) on top, GT boundaries on a
    fresh random colorization below."""
    rng = np.random.default_rng(0)
    rows = []
    for arr in (raws, gts):
        cells = []
        for k in range(arr.shape[0]):
            if arr is raws:
                r, c = arr[k]
                img = np.stack([r, c, c], -1)
                cells.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
            else:
                lab = arr[k]
                colors = rng.integers(50, 255, (lab.max() + 1, 3), dtype=np.uint8)
                colors[0] = 0
                edge = ndimage.maximum_filter(lab, 3) != ndimage.minimum_filter(lab, 3)
                img = colors[lab]
                img[edge] = 255
                cells.append(img)
        rows.append(np.concatenate(cells, axis=1))
    strip = np.concatenate(rows, axis=0)
    Image.fromarray(strip).resize(
        (strip.shape[1] * 2, strip.shape[0] * 2), Image.NEAREST
    ).save(path)


def main() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    page = np.asarray(Image.open(PAGE).convert("RGB"))
    for tissue, (raw_r, gt_r, cols) in BLOCKS.items():
        raws, gts = [], []
        for k, c in enumerate(cols):
            raw_rgb = page[raw_r : raw_r + P, c : c + P]
            gt_rgb = page[gt_r : gt_r + P, c : c + P]
            raws.append(extract_raw(raw_rgb, inpaint_label_box=(k == 0)))
            gts.append(decode_gt(gt_rgb))
        raw = np.stack(raws)
        gt = np.stack(gts).astype(np.uint16)
        np.save(OUT_DIR / f"{tissue}_raw.npy", raw)
        np.save(OUT_DIR / f"{tissue}_gt.npy", gt)
        preview(raw, gt, OUT_DIR / f"{tissue}_preview.png")
        counts = [int(g.max()) for g in gt]
        med = [
            float(np.median(np.bincount(g.ravel().astype(np.int64))[1:][
                np.bincount(g.ravel().astype(np.int64))[1:] > 0]))
            for g in gt
        ]
        print(
            f"{tissue}: instances/panel {counts}, median px "
            f"{[round(m) for m in med]}, paper F1 {PAPER_F1[tissue]}"
        )


if __name__ == "__main__":
    main()
