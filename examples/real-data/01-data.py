"""Prepare a REAL microscopy dataset for cellulus-tpu.

Mirrors the reference's real-data walkthrough (reference
``docs/examples/2d/01-data.py``): download the Fluo-N2DL-HeLa demo subset
(Cell Tracking Challenge) via ``extract_data``, percentile-normalize the tif
images, and write a ``(s, c, y, x)`` zarr dataset with axis metadata.

Offline fallback: without network access (``--synthetic``), the same layout
is generated from synthetic blobs so the rest of the workflow
(02-train.py / 03-infer.py) runs unchanged.

Requires ``tifffile`` for the real path (not bundled in minimal installs);
the zarr writing uses cellulus_tpu's own store.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from cellulus_tpu.io import zarr
from cellulus_tpu.utils.misc import extract_data

ZIP_URL = (
    "https://github.com/funkelab/cellulus/releases/download/"
    "v0.0.1-tag/2d-data-demo.zip"
)


def normalize(img: np.ndarray, pmin=1.0, pmax=99.8) -> np.ndarray:
    """Percentile normalization (csbdeep.utils.normalize semantics)."""
    lo, hi = np.percentile(img, (pmin, pmax))
    return ((img - lo) / max(hi - lo, 1e-20)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true",
                    help="offline fallback: synthetic blobs, same layout")
    ap.add_argument("--data-dir", default="./data")
    args = ap.parse_args()

    out = Path(__file__).parent / "2d-data-demo.zarr"

    if args.synthetic:
        from synthetic import make_blob_container

        make_blob_container(out, num_samples=4, size=512, ndim=2, seed=1)
        print(f"wrote synthetic fallback to {out}")
        return

    import tifffile

    name = "2d-data-demo"
    extract_data(zip_url=ZIP_URL, data_dir=args.data_dir, project_name=name)
    image_filenames = sorted(
        (Path(args.data_dir) / name / "images").glob("*.tif")
    )
    print(f"Number of raw images: {len(image_filenames)}")
    images = np.asarray(
        [normalize(tifffile.imread(f).astype(np.float32))[None] for f in
         image_filenames]
    )

    f = zarr.open(out, "a")
    f["train"] = images
    f["train"].attrs.update(
        {"axis_names": ["s", "c", "y", "x"], "resolution": [1, 1]}
    )
    print(f"wrote {images.shape} to {out}/train")


if __name__ == "__main__":
    main()
