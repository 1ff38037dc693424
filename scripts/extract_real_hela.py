"""Recover REAL HeLa fluorescence microscopy pixels from the reference's
published teaser figure.

The build sandbox has zero network egress, so the reference's
Fluo-N2DL-HeLa download (reference ``docs/examples/2d/01-data.py:28-45``)
cannot run. The reference repository does, however, ship the paper's teaser
figure (``docs/overrides/resources/images/teaser.png``), whose FluoHela
panel is a REAL Fluo-HeLa fluorescence image rendered through matplotlib's
``magma`` colormap. This script inverts that colormap to recover a
single-channel intensity image:

  - panel:   teaser.png rows 689:942, cols 72:325 (253x253 px, ~45 nuclei)
  - inverse: nearest-neighbor match of each RGB pixel against the 256-entry
    magma LUT (mean residual ~10.7/255 RGB units, from the figure's
    antialiased downscaling — magma is the best fit by 7x over the next
    colormap)
  - output:  float32 in [0, 1]; real photon noise, real nucleoli texture,
    real touching-nuclei geometry survive the round trip.

The recovered pixels are vendored at ``examples/real-data/vendored/`` so
the real-data example can run offline. This is NOT a substitute for the
full Fluo-N2DL-HeLa sequence — it is the only real-microscopy signal
reachable from this sandbox, and docs/validation.md labels every number
measured on it accordingly.

Usage: python scripts/extract_real_hela.py
"""

from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parents[1]
TEASER = Path("/root/reference/docs/overrides/resources/images/teaser.png")
OUT_DIR = REPO / "examples" / "real-data" / "vendored"

# (row0, row1, col0, col1) in teaser.png pixel coordinates
# name -> (row0, row1, col0, col1, has_overlays)
PANELS = {
    # bottom-row FluoHela raw panel: clean (no annotation overlays)
    "hela_panel": (689, 942, 72, 325, False),
    # top-row "Raw Image" panel: larger (507x546 incl. caption; trimmed to
    # the image area below) but carries annotation-box overlays that must
    # be masked + inpainted
    "hela_large": (60, 567, 84, 591, True),
}


def magma_lut() -> np.ndarray:
    import matplotlib

    return np.asarray(
        matplotlib.colormaps["magma"](np.linspace(0.0, 1.0, 256))
    )[:, :3] * 255.0


def invert_colormap(rgb: np.ndarray, lut: np.ndarray):
    """Nearest-LUT-entry inversion; returns (values in [0,1], residual)."""
    px = rgb.reshape(-1, 3).astype(np.float32)
    # chunked to bound memory on the 1-core host
    idx = np.empty(len(px), np.int32)
    res = np.empty(len(px), np.float32)
    for s in range(0, len(px), 65536):
        d = ((px[s : s + 65536, None, :] - lut[None, :, :]) ** 2).sum(-1)
        i = d.argmin(1)
        idx[s : s + 65536] = i
        res[s : s + 65536] = np.sqrt(d[np.arange(len(i)), i])
    vals = (idx / 255.0).astype(np.float32).reshape(rgb.shape[:2])
    return vals, res.reshape(rgb.shape[:2])


def annotation_mask(rgb: np.ndarray, residual: np.ndarray) -> np.ndarray:
    """Overlay pixels (green/white/lavender box outlines, numbered circles).

    Primary signal: the colormap-inversion residual itself — overlay colors
    sit far off the magma locus. Dilation closes over the black digit
    glyphs inside the white number circles (black IS a valid magma color,
    so the residual alone misses them)."""
    from scipy import ndimage

    r, g, b = (rgb[..., i].astype(np.int32) for i in range(3))
    green = (g > r + 30) & (g > b + 30)
    off_locus = residual > 40
    return ndimage.binary_dilation(green | off_locus, iterations=4)


def inpaint(vals: np.ndarray, mask: np.ndarray, iters: int = 8) -> np.ndarray:
    """Fill masked pixels by iterated 5x5 neighborhood mean of valid pixels."""
    out = vals.copy()
    valid = ~mask
    for _ in range(iters):
        if valid.all():
            break
        # local sums via cumulative shifts (cheap 5x5 box filter)
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


def main():
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    teaser = np.asarray(Image.open(TEASER).convert("RGB"))
    lut = magma_lut()
    for name, (r0, r1, c0, c1, has_overlays) in PANELS.items():
        rgb = teaser[r0:r1, c0:c1]
        vals, res = invert_colormap(rgb, lut)
        n_masked = 0
        if has_overlays:
            mask = annotation_mask(rgb, res)
            n_masked = int(mask.sum())
            vals = inpaint(vals, mask)
        np.save(OUT_DIR / f"{name}.npy", vals)
        prev = (np.clip(vals, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(prev).save(OUT_DIR / f"{name}_preview.png")
        print(
            f"{name}: {vals.shape} residual mean {res.mean():.2f} "
            f"max {res.max():.0f}; masked+inpainted {n_masked} px "
            f"-> {OUT_DIR / (name + '.npy')}"
        )


if __name__ == "__main__":
    main()
