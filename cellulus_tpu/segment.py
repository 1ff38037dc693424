"""Segment stage: detections -> post-processed instance masks
(reference parity: ``cellulus/segment.py:13-108``).

Two post-processing modes:
- "cell": remove inter-cell halos by growing all instances by
  ``grow_distance`` then shrinking by ``shrink_distance`` (two Euclidean
  distance transforms),
- "nucleus": per-instance intensity Otsu against the raw image + binary
  hole filling inside the instance bounding box.

Both end with a connected-component size filter dropping instances below
``min_size`` pixels.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import binary_fill_holes
from scipy.ndimage import distance_transform_edt as dtedt

from .configs import InferenceConfig
from .io import DatasetMetaData, zarr
from .ops.components import size_filter
from .ops.otsu import threshold_otsu


def remove_halo(
    segmentation: np.ndarray, grow_distance: float, shrink_distance: float
) -> np.ndarray:
    """Grow-then-shrink halo removal ("cell" mode, reference
    ``segment.py:41-51``).

    Degenerate cases where an EDT input has no zeros (all-background or
    fully-expanded images) are given defined semantics — distance = inf —
    instead of scipy's undefined feature-transform output.
    """
    segmentation = np.array(segmentation, copy=True)
    if (segmentation == 0).all():
        return segmentation
    distance_foreground = dtedt(segmentation == 0)
    expanded_mask = distance_foreground < grow_distance
    if expanded_mask.all():
        return segmentation  # no background anywhere: nothing to shrink from
    distance_background = dtedt(expanded_mask)
    segmentation[distance_background < shrink_distance] = 0
    return segmentation


def nucleus_partition(
    segmentation: np.ndarray, raw_image: np.ndarray
) -> np.ndarray:
    """Per-instance intensity Otsu + hole filling ("nucleus" mode,
    reference ``segment.py:52-101``)."""
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


def segment(inference_config: InferenceConfig) -> None:
    dataset_config = inference_config.dataset_config
    meta = DatasetMetaData.from_dataset_config(dataset_config)

    f = zarr.open(inference_config.segmentation_dataset_config.container_path, "a")
    ds_in = f[inference_config.segmentation_dataset_config.secondary_dataset_name]

    ds_out = f.create_dataset(
        inference_config.segmentation_dataset_config.dataset_name,
        shape=(
            meta.num_samples,
            inference_config.num_bandwidths,
            *meta.spatial_array,
        ),
        dtype=np.uint16,
    )
    ds_out.attrs.update(
        {
            "axis_names": ["s", "c"] + ["t", "z", "y", "x"][-meta.num_spatial_dims :],
            "resolution": [1] * meta.num_spatial_dims,
            "offset": [0] * meta.num_spatial_dims,
        }
    )

    if inference_config.post_processing == "cell":
        from .ops.morphology import remove_halo_device

        for sample in range(meta.num_samples):
            for k in range(inference_config.num_bandwidths):
                seg = np.asarray(ds_in[sample, k])
                seg = remove_halo_device(
                    seg,
                    inference_config.grow_distance,
                    inference_config.shrink_distance,
                )
                ds_out[sample, k] = seg
    else:  # nucleus
        ds_raw = f[inference_config.dataset_config.dataset_name]
        for sample in range(meta.num_samples):
            raw_image = np.asarray(ds_raw[sample, 0])
            for k in range(inference_config.num_bandwidths):
                seg = np.asarray(ds_in[sample, k])
                ds_out[sample, k] = nucleus_partition(seg, raw_image)

    for sample in range(meta.num_samples):
        for k in range(inference_config.num_bandwidths):
            filtered = size_filter(
                np.asarray(ds_out[sample, k]), inference_config.min_size
            )
            ds_out[sample, k] = filtered.astype(np.uint16)
