"""Misc host utilities (reference parity: ``cellulus/utils/misc.py:28-113``).

``size_filter`` lives in :mod:`cellulus_tpu.ops.components`; re-exported here
for API familiarity.
"""

from __future__ import annotations

import os
from io import BytesIO
from urllib.request import urlopen
from zipfile import ZipFile

from ..ops.components import size_filter  # noqa: F401  (re-export)


def extract_data(zip_url: str, data_dir: str, project_name: str) -> None:
    """Download and unzip ``zip_url`` into ``data_dir`` unless
    ``data_dir/project_name`` already exists."""
    target = os.path.join(data_dir, project_name)
    if os.path.exists(target):
        print(f"Directory already exists at the location {target}")
        return
    os.makedirs(data_dir, exist_ok=True)
    with urlopen(zip_url) as response:
        with ZipFile(BytesIO(response.read())) as zfile:
            zfile.extractall(data_dir)
    print(f"Downloaded and unzipped data to the location {data_dir}")


def visualize_2d(
    image,
    top_right,
    bottom_left,
    bottom_right,
    top_right_label,
    bottom_left_label,
    bottom_right_label,
    image_cmap="magma",
    top_right_cmap=None,
    bottom_left_cmap=None,
    bottom_right_cmap=None,
):
    """2x2 matplotlib grid: raw image + three derived views."""
    import matplotlib.pyplot as plt

    font = {"family": "serif", "color": "white", "weight": "bold", "size": 16}
    plt.figure(figsize=(15, 15))
    panels = [
        (image if image.ndim == 2 else image[0], "IM", image_cmap),
        (top_right, top_right_label, top_right_cmap),
        (bottom_left, bottom_left_label, bottom_left_cmap),
        (bottom_right, bottom_right_label, bottom_right_cmap),
    ]
    for i, (panel, text, cmap) in enumerate(panels, start=1):
        plt.subplot(2, 2, i)
        plt.axis("off")
        plt.imshow(panel, interpolation="None", cmap=cmap)
        plt.text(30, 30, text, fontdict=font)
    plt.tight_layout()
    plt.show()
