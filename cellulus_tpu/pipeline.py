"""Pipelined inference: predict / detect / segment overlap across samples.

The staged path (reference parity) runs each stage over all samples before
the next stage starts (reference ``infer.py:69-80``). This orchestrator
streams instead: while the device predicts sample ``s+1``'s tiles, a worker
processes sample ``s`` through detect + segment; all zarr writebacks are
asynchronous. End-to-end wall time approaches ``max(stage times)`` instead
of their sum, with identical outputs (same stage functions, same RNG
stream handling per sample).

Used by ``infer()`` when ``inference_config.pipelined`` is set and all of
predict/detect/segment are configured; falls back to staged execution
otherwise (e.g. very large samples where keeping one sample's embeddings in
RAM is undesirable is NOT gated here — embeddings of the current sample are
held either way by the detect stage).
"""

from __future__ import annotations

import concurrent.futures

import numpy as np

from .configs import InferenceConfig
from .detect import _spatial_attrs, detect_sample, sample_rng
from .io import DatasetMetaData, zarr
from .io.regions import read_reflect_region
from .ops.components import size_filter
from .predict import predict_sample
from .segment import cell_segment_sample, nucleus_partition


def infer_pipelined(
    spec,
    params,
    inference_config: InferenceConfig,
    normalization_factor: float,
    compute_dtype,
    num_stage_workers: int = None,
) -> None:
    import jax

    if num_stage_workers is None:
        # enough workers to keep every chip's round-robin detect/segment
        # lane busy; 2 suffices single-device (overlap host glue + device)
        num_stage_workers = max(2, len(jax.devices()))

    ic = inference_config
    meta = DatasetMetaData.from_dataset_config(ic.dataset_config)
    D = meta.num_spatial_dims

    # RAM gate: every in-flight sample holds its assembled (D+1, *spatial)
    # float32 embeddings on the host, and while its worker runs detect also
    # holds the mean-centered copy (same shape/dtype) plus the per-bandwidth
    # uint16 detections. Cap the stage workers so the worst case fits the
    # budget (inference_config.pipeline_ram_gb, else the
    # CELLULUS_TPU_PIPELINE_RAM_GB env var, else a quarter of system RAM),
    # and bound the predict loop's run-ahead
    # with a semaphore — a worker cap alone would still let every sample's
    # embeddings queue on the stage pool whenever detect+segment is slower
    # than predict, growing host memory with sample count.
    import os as _os

    spatial_px = int(np.prod(meta.spatial_array))
    emb_bytes = (D + 1) * spatial_px * 4
    sample_bytes = 2 * emb_bytes + ic.num_bandwidths * spatial_px * 2
    budget_gb = getattr(ic, "pipeline_ram_gb", None)
    if budget_gb is None:
        budget_gb = _os.environ.get("CELLULUS_TPU_PIPELINE_RAM_GB")
    if budget_gb is not None:
        budget = float(budget_gb) * (1 << 30)
    else:
        try:
            budget = (
                _os.sysconf("SC_PHYS_PAGES") * _os.sysconf("SC_PAGE_SIZE") / 4
            )
        except (ValueError, OSError):
            budget = 16 * (1 << 30)
    max_workers = max(1, int(budget // sample_bytes) - 1)
    if max_workers < num_stage_workers:
        import warnings

        warnings.warn(
            f"pipelined inference holds ~{sample_bytes / 1e9:.1f} GB per "
            f"in-flight sample (embeddings + detect's centered copy + "
            f"detections); capping stage workers "
            f"{num_stage_workers} -> {max_workers} to fit the host RAM "
            "budget (raise inference_config.pipeline_ram_gb or the "
            "CELLULUS_TPU_PIPELINE_RAM_GB env var to override)",
            RuntimeWarning,
            stacklevel=2,
        )
        num_stage_workers = max_workers

    mesh = None
    if len(jax.devices()) > 1:
        from .parallel import make_mesh

        mesh = make_mesh()

    raw_container = zarr.open(ic.dataset_config.container_path, "r")
    raw_ds = raw_container[ic.dataset_config.dataset_name]
    if normalization_factor is None:
        from .datasets import normalization_factor_for

        normalization_factor = normalization_factor_for(raw_ds.dtype)

    f_pred = zarr.open(ic.prediction_dataset_config.container_path, "a")
    from .models import compute_geometry

    out_tile = compute_geometry(
        tuple(ic.crop_size), spec.downsampling_factors
    ).output_size
    ds_emb = f_pred.create_dataset(
        ic.prediction_dataset_config.dataset_name,
        shape=(meta.num_samples, D + 1, *meta.spatial_array),
        dtype=np.float32,
        chunks=(1, D + 1, *out_tile),
        compressor=None,  # incompressible float payload (see predict.py)
    )
    ds_emb.attrs.update(_spatial_attrs(meta))

    f_det = zarr.open(ic.detection_dataset_config.container_path, "a")
    ds_detection = f_det.create_dataset(
        ic.detection_dataset_config.dataset_name,
        shape=(meta.num_samples, ic.num_bandwidths, *meta.spatial_array),
        dtype=np.uint16,
    )
    ds_binary = f_det.create_dataset(
        "binary-segmentation",
        shape=(meta.num_samples, 1, *meta.spatial_array),
        dtype=np.uint16,
    )
    ds_centered = f_det.create_dataset(
        "centered-embeddings",
        shape=(meta.num_samples, D + 1, *meta.spatial_array),
        dtype=np.float32,
        compressor=None,
    )
    f_seg = zarr.open(ic.segmentation_dataset_config.container_path, "a")
    ds_seg = f_seg.create_dataset(
        ic.segmentation_dataset_config.dataset_name,
        shape=(meta.num_samples, ic.num_bandwidths, *meta.spatial_array),
        dtype=np.uint16,
    )
    for ds in (ds_detection, ds_binary, ds_centered, ds_seg):
        ds.attrs.update(_spatial_attrs(meta))

    raw_for_nucleus = None
    if ic.post_processing == "nucleus":
        raw_for_nucleus = raw_ds

    devices = jax.devices()

    import threading

    # permits = workers that can hold a finished sample + the one sample
    # the predict loop is currently assembling
    inflight = threading.BoundedSemaphore(max(1, num_stage_workers) + 1)

    def process_sample(
        sample: int, embeddings: np.ndarray, embeddings_dev=None
    ) -> None:
        """detect + segment one sample (runs in a worker thread; the
        per-sample RNG stream keeps results identical to the staged path
        regardless of worker scheduling). ``embeddings_dev`` is the
        device-resident copy assembled during predict — detect consumes it
        without re-uploading the sample. With >1 device, samples
        round-robin across chips (thread-local jax.default_device) so the
        detect/segment stages scale with the mesh alongside predict's
        sharded tile batches."""
        try:
            _process_sample(sample, embeddings, embeddings_dev)
        finally:
            inflight.release()  # this sample's arrays are dead: let the
            #  predict loop stage the next one

    def _process_sample(sample, embeddings, embeddings_dev):
        with jax.default_device(devices[sample % len(devices)]):
            # A committed array keeps running ops on ITS device regardless of
            # jax.default_device — move the predict-stage copy to this lane's
            # chip so device-detect round-robins too (no-op on one device;
            # d2d rides ICI on real multi-chip hardware).
            if embeddings_dev is not None:
                embeddings_dev = jax.device_put(
                    embeddings_dev, devices[sample % len(devices)]
                )
            threshold, binary_mask, centered, detections = detect_sample(
                embeddings, ic, D, sample_rng(ic.seed, sample),
                embeddings_device=embeddings_dev,
            )
            print(f"For sample {sample}, binary threshold {threshold} was used.")
            ds_binary[sample, 0] = binary_mask.astype(np.uint16)
            ds_centered[sample] = centered
            ds_detection[sample] = detections
            for k in range(ic.num_bandwidths):
                if ic.post_processing == "cell":
                    seg = cell_segment_sample(
                        detections[k], ic.grow_distance, ic.shrink_distance,
                        ic.min_size,
                    )
                else:
                    raw_image = np.asarray(raw_for_nucleus[sample, 0])
                    seg = nucleus_partition(detections[k], raw_image)
                    seg = size_filter(seg, ic.min_size)
                ds_seg[sample, k] = seg.astype(np.uint16)

    # single writer: overlapping tile writes stay in submission order;
    # detect/segment workers can run >1 sample concurrently (per-sample RNG
    # keeps outputs deterministic; zarr writes are per-array locked)
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as io_pool, \
            concurrent.futures.ThreadPoolExecutor(
                max_workers=max(1, num_stage_workers)
            ) as stage_pool:
        write_futures = []
        stage_futures = []

        for sample in range(meta.num_samples):
            # RAM gate part 2: block until a worker frees a slot before
            # allocating this sample's embeddings (workers + one sample
            # being assembled by predict = the gate's sizing assumption)
            inflight.acquire()

            def source(origin, size, sample=sample):
                return (
                    read_reflect_region(
                        lambda lo, hi: raw_ds[
                            (sample, slice(None))
                            + tuple(slice(*b) for b in zip(lo, hi))
                        ],
                        meta.spatial_array,
                        origin,
                        size,
                    )
                    * normalization_factor
                )

            embeddings = np.zeros((D + 1, *meta.spatial_array), np.float32)

            def write_fn(tile_np, origin, sample=sample, emb=embeddings):
                sel_local = (slice(None),) + tuple(
                    slice(o, o + t) for o, t in zip(origin, tile_np.shape[1:])
                )
                emb[sel_local] = tile_np
                sel = (sample,) + sel_local
                write_futures.append(
                    io_pool.submit(ds_emb.__setitem__, sel, tile_np)
                )

            # assemble a device-resident copy only when the device detect
            # path will consume it (otherwise the per-tile updates are
            # pure dispatch overhead)
            from .detect import want_device_detect

            want_device = want_device_detect(ic)
            out = predict_sample(
                spec,
                params,
                None,
                ic,
                normalization_factor,
                sample_seed=sample,
                compute_dtype=compute_dtype,
                write_fn=write_fn,
                mesh=mesh,
                source=source,
                spatial=meta.spatial_array,
                return_device=want_device,
            )
            emb_dev = out[1] if want_device else None
            # detect/segment this sample while the next sample predicts
            stage_futures.append(
                stage_pool.submit(process_sample, sample, embeddings, emb_dev)
            )

        for fut in stage_futures + write_futures:
            fut.result()
