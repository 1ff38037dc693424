"""Create a synthetic 3D dataset (spherical blobs in a volume)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tests"))
from synthetic import make_blob_container

if __name__ == "__main__":
    path = Path(__file__).parent / "data_3d.zarr"
    make_blob_container(path, num_samples=2, size=128, ndim=3, seed=42)
    print(f"wrote {path}")
