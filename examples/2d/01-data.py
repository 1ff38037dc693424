"""Create a synthetic 2D dataset (bright blobs on dark background).

Writes ``data_2d.zarr`` with ``train``, ``validate`` and ``groundtruth``
datasets in the ``(s, c, y, x)`` layout the pipeline expects.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tests"))
from synthetic import make_blob_container

if __name__ == "__main__":
    path = Path(__file__).parent / "data_2d.zarr"
    make_blob_container(path, num_samples=4, size=512, ndim=2, seed=42)
    print(f"wrote {path}")
