"""Misc host utilities (role parity with ``cellulus/utils/misc.py:28-113``;
independent implementation and presentation).

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
    """Fetch ``zip_url`` and unpack it under ``data_dir``.

    Skipped when ``data_dir/project_name`` is already present, so notebook
    cells can re-run safely.
    """
    target = os.path.join(data_dir, project_name)
    if os.path.exists(target):
        print(f"[extract_data] {target} already present - skipping download")
        return
    os.makedirs(data_dir, exist_ok=True)
    print(f"[extract_data] fetching {zip_url} ...")
    with urlopen(zip_url) as response:
        payload = response.read()
    with ZipFile(BytesIO(payload)) as archive:
        archive.extractall(data_dir)
    print(f"[extract_data] unpacked {len(payload)} bytes into {data_dir}")


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
    """2x2 matplotlib grid: raw image plus three derived views.

    Signature kept compatible with the reference notebooks; the rendering
    (axis titles rather than in-image text, compact figure) is this
    package's own.
    """
    import matplotlib.pyplot as plt

    panels = [
        (image if image.ndim == 2 else image[0], "raw", image_cmap),
        (top_right, top_right_label, top_right_cmap),
        (bottom_left, bottom_left_label, bottom_left_cmap),
        (bottom_right, bottom_right_label, bottom_right_cmap),
    ]
    fig, axes = plt.subplots(2, 2, figsize=(10, 10), constrained_layout=True)
    for ax, (panel, title, cmap) in zip(axes.ravel(), panels):
        ax.imshow(panel, interpolation="nearest", cmap=cmap)
        ax.set_title(title, fontsize=11, family="monospace")
        ax.set_axis_off()
    plt.show()
