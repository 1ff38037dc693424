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

from functools import lru_cache

from .configs import InferenceConfig
from .io import DatasetMetaData, zarr
from .ops.components import size_filter
from .ops.otsu import threshold_otsu


def want_device_nucleus(inference_config: InferenceConfig) -> bool:
    """Resolve the device-nucleus knob: the ``device_nucleus`` config field
    when set, else the CELLULUS_TPU_DEVICE_NUCLEUS env var. The device path
    vectorizes all instances per sample in one dispatch (ops/nucleus.py)
    where the host path loops instances serially; see the nested-instance
    caveat in :mod:`cellulus_tpu.ops.nucleus`."""
    from .utils.env import resolve_flag

    return resolve_flag(
        getattr(inference_config, "device_nucleus", None),
        "CELLULUS_TPU_DEVICE_NUCLEUS",
    )


def _run_device_jobs(fn, num_samples: int, num_bandwidths: int, label: str) -> None:
    """Run independent ``fn(sample, k)`` jobs over every (sample, bandwidth)
    pair: workers overlap host glue with device compute, and with >1 device
    the jobs round-robin across chips (thread-local ``jax.default_device``)
    so the stage scales with the mesh."""
    import concurrent.futures
    import itertools

    import jax

    from .utils.progress import progress as _progress

    devices = jax.devices()

    def one(args):
        idx, (sample, k) = args
        with jax.default_device(devices[idx % len(devices)]):
            fn(sample, k)

    jobs = list(
        enumerate(itertools.product(range(num_samples), range(num_bandwidths)))
    )
    workers = max(2, min(len(devices), len(jobs)))
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
        list(_progress(pool.map(one, jobs), label, total=len(jobs)))


@lru_cache(maxsize=None)
def _cell_segment_kernel(
    grow_distance: float, shrink_distance: float, min_size: int
):
    """ONE jitted dispatch for the whole "cell" post-processing of a sample:
    halo removal (disk-kernel convs) -> connected-component parents ->
    size filter + consecutive relabel, all on device
    (:func:`~cellulus_tpu.ops.components.filter_relabel_device`). The host
    uploads uint16 detections and downloads uint16 labels — nothing else
    crosses the link (the earlier host epilogue fetched two int32 arrays,
    ~4x the bytes: it dominated segment wall time over the tunnel).

    ``min_size == 0`` keeps the reference semantics: halo removal only, no
    size filter and NO relabel (reference ``segment.py:103-108`` skips
    ``size_filter`` entirely in that case)."""
    import jax
    import jax.numpy as jnp

    from .ops.components import cc_parents, filter_relabel_device
    from .ops.morphology import halo_removal_body

    @jax.jit
    def run(segmentation):
        seg = halo_removal_body(
            segmentation.astype(jnp.int32), grow_distance, shrink_distance
        )
        if min_size == 0:
            return seg.astype(jnp.uint16)
        parents = cc_parents(seg).ravel()
        vals_flat = jnp.concatenate(
            [seg.ravel(), jnp.zeros((1,), seg.dtype)]
        )
        values_at_parent = vals_flat[parents]
        labels = filter_relabel_device(parents, values_at_parent, min_size)
        return labels.reshape(seg.shape)

    return run


def cell_segment_sample(
    segmentation: np.ndarray,
    grow_distance: float,
    shrink_distance: float,
    min_size: int,
) -> np.ndarray:
    """Fused "cell"-mode post-processing: halo removal + CC + size filter +
    relabel in a single device dispatch. Output identical to
    ``size_filter(remove_halo(seg), min_size)``."""
    if segmentation.dtype != np.uint16 and segmentation.size:
        lo, hi = segmentation.min(), segmentation.max()
        if lo < 0 or hi > np.iinfo(np.uint16).max:
            raise ValueError(
                f"cell_segment_sample needs uint16-range labels, got "
                f"[{lo}, {hi}] in dtype {segmentation.dtype} — ids above "
                "65535 would alias after the device-kernel cast"
            )
    seg = np.ascontiguousarray(segmentation, dtype=np.uint16)
    from .utils.profiling import time_device

    labels = time_device(
        "segment.device",
        _cell_segment_kernel(
            float(grow_distance), float(shrink_distance), int(min_size)
        ),
        seg,
    )
    return np.asarray(labels).astype(segmentation.dtype)


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
    reference ``segment.py:52-101``).

    All per-instance work is confined to the instance's bounding box
    (``scipy.ndimage.find_objects``, one pass): the reference's loop scans
    the FULL image per id (``segmentation == id_`` at
    reference ``segment.py:60``), O(ids x pixels) — same outputs,
    O(pixels + sum of bbox areas) here.
    """
    from scipy.ndimage import find_objects

    out = np.zeros_like(segmentation)
    seg_int = segmentation.astype(np.int64, copy=False)
    for idx, bbox in enumerate(find_objects(seg_int)):
        if bbox is None:
            continue
        id_ = idx + 1
        sub_seg = seg_int[bbox]
        sub_raw = raw_image[bbox]
        id_mask = sub_seg == id_
        values = sub_raw[id_mask]
        if values.max() == values.min():
            mask = id_mask
        else:
            thr = threshold_otsu(values)
            mask = id_mask & (sub_raw > thr)
        # hole filling within the bbox, exactly like the reference's
        # per-instance binary_fill_holes on the bbox crop
        out[bbox][binary_fill_holes(mask)] = id_
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
    from .detect import _spatial_attrs

    ds_out.attrs.update(_spatial_attrs(meta))

    if inference_config.post_processing == "cell":
        def cell_job(sample: int, k: int) -> None:
            seg = cell_segment_sample(
                np.asarray(ds_in[sample, k]),
                inference_config.grow_distance,
                inference_config.shrink_distance,
                inference_config.min_size,
            )
            ds_out[sample, k] = seg.astype(np.uint16)

        _run_device_jobs(
            cell_job,
            meta.num_samples,
            inference_config.num_bandwidths,
            "segment",
        )
    else:  # nucleus
        from .utils.progress import progress as _progress

        # the raw image lives in ITS OWN container: the reference reads it
        # from the segmentation container (reference segment.py:53), which
        # only works in its single-container layout — deviation in the
        # user's favor for split-container setups (same-container layouts
        # resolve identically)
        ds_raw = zarr.open(inference_config.dataset_config.container_path, "r")[
            inference_config.dataset_config.dataset_name
        ]
        if want_device_nucleus(inference_config):
            # TPU path: ONE device dispatch per (sample, bandwidth) — all
            # instances threshold/fill simultaneously (ops/nucleus.py) —
            # jobs round-robin the mesh exactly like cell mode above
            from functools import lru_cache as _lru_cache

            from .ops.nucleus import nucleus_partition_device

            @_lru_cache(maxsize=32)
            def raw_sample(sample: int) -> np.ndarray:
                # one zarr read + decompress per sample, shared across the
                # bandwidth jobs (they arrive sample-grouped)
                return np.asarray(ds_raw[sample, 0])

            def nucleus_job(sample: int, k: int) -> None:
                seg = nucleus_partition_device(
                    np.asarray(ds_in[sample, k]), raw_sample(sample)
                )
                filtered = size_filter(seg, inference_config.min_size)
                ds_out[sample, k] = filtered.astype(np.uint16)

            _run_device_jobs(
                nucleus_job,
                meta.num_samples,
                inference_config.num_bandwidths,
                "segment (nucleus, device)",
            )
        else:
            for sample in _progress(
                range(meta.num_samples), "segment (nucleus)",
                total=meta.num_samples,
            ):
                raw_image = np.asarray(ds_raw[sample, 0])
                for k in range(inference_config.num_bandwidths):
                    seg = np.asarray(ds_in[sample, k])
                    seg = nucleus_partition(seg, raw_image)
                    filtered = size_filter(seg, inference_config.min_size)
                    ds_out[sample, k] = filtered.astype(np.uint16)
