"""Tiled sliding-window embedding prediction (reference ``predict.py:9-143``).

TPU-first design replacing the reference's gunpowder Scan + serial-TTA loop:

- tile geometry computed analytically (no dry-run forward): the model's
  valid-conv context is exact arithmetic (:mod:`..models.geometry`),
- the raw sample is reflect-padded on host once; tiles stream to the device,
- all ``2 * num_infer_iterations`` TTA noise passes of a batch of tiles run
  as ONE batched forward (MXU batch = tiles x noise passes), with mean/std
  reduced on device — the reference round-trips every pass through host
  memory (``models/unet.py:84-87``),
- writeback to the output zarr overlaps with the next batch's compute
  (async dispatch + a writer thread), and output chunks are aligned to the
  output tile grid so each tile write touches exactly one chunk.
"""

from __future__ import annotations

import concurrent.futures
import itertools
from functools import lru_cache, partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configs import InferenceConfig
from .io import DatasetMetaData, zarr
from .io.regions import read_reflect_region
from .models import UNetSpec, compute_geometry, tta_embeddings
from .datasets import normalization_factor_for
from .utils.profiling import time_device


@lru_cache(maxsize=None)
def _device_update_kernel(ndim: int):
    """Jitted tile-into-buffer update (device-side sample assembly)."""
    import jax

    @partial(jax.jit, donate_argnums=(0,))
    def upd(buf, tile, origin):
        # buf (*spatial, D+1), tile (*out_tile, D+1), origin (ndim,) int32
        start = tuple(origin[d] for d in range(ndim)) + (jnp.int32(0),)
        return jax.lax.dynamic_update_slice(buf, tile.astype(buf.dtype), start)

    return upd


@lru_cache(maxsize=None)
def _batched_tta(
    spec: UNetSpec,
    p_salt_pepper: float,
    num_infer_iterations: int,
    compute_dtype,
    transfer_dtype=jnp.float32,
):
    """Jitted (and cached across samples) batched-TTA tile function."""
    from .ops.pallas_conv import use_pallas_conv

    fused = use_pallas_conv() and spec.num_spatial_dims == 2

    def run(params, tiles, keys):
        def one(tile, key):
            return tta_embeddings(
                spec,
                params,
                tile,
                key,
                p_salt_pepper,
                num_infer_iterations,
                compute_dtype,
                fused_conv_pass=fused,
            )

        return jax.vmap(one)(tiles, keys).astype(transfer_dtype)

    return jax.jit(run)


def tile_origins(extent: int, tile: int) -> List[int]:
    """Start offsets covering ``[0, extent)`` with stride ``tile``; the last
    tile is shifted inward (shingled) so every pixel is covered exactly."""
    if extent <= tile:
        return [0]
    origins = list(range(0, extent - tile, tile))
    origins.append(extent - tile)
    return origins


def predict_sample(
    spec: UNetSpec,
    params,
    raw: np.ndarray,
    inference_config: InferenceConfig,
    normalization_factor: float,
    sample_seed: int = 0,
    compute_dtype=jnp.float32,
    write_fn=None,
    mesh=None,
    source=None,
    spatial=None,
    return_device=False,
):
    """Predict TTA embeddings for one full sample.

    Args:
        raw: ``(C, *spatial)`` un-normalized raw data; may be None when a
            ``source`` is given instead (streaming mode: tiles are read on
            demand, the full volume is never held in host memory).
        write_fn: optional callback ``(tile_np (D+1, *tile), origin)`` for
            streaming writeback; when None, a full array is assembled and
            returned.
        mesh: optional device mesh; the tile batch shards over its ``data``
            axis (tiles are independent — multi-chip inference needs no
            inter-chip communication, SURVEY.md §2).
        source: optional ``source(origin, size) -> (C, *size)`` normalized
            tile reader with reflect boundary handling (see
            :func:`cellulus_tpu.io.regions.read_reflect_region`).
        spatial: spatial extent; required with ``source``.
        return_device: also assemble the sample on DEVICE (channels-first
            ``(D+1, *spatial)`` jax array) via per-tile dynamic updates —
            the downstream detect stage then needs no re-upload. Returns
            ``(host_result, device_array)``; the device side is None when
            the image is smaller than one tile (host fallback).

    Returns:
        ``(D+1, *spatial)`` embeddings (when ``write_fn`` is None), or a
        ``(host_result, device_array)`` tuple when ``return_device``.
    """
    shards = int(getattr(inference_config, "spatial_shards", 0) or 0)
    if shards >= 2 and raw is not None and write_fn is None and mesh is None:
        # whole-sample sharded forward over the device mesh (ICI halo
        # exchange) instead of independent tiles — config knob
        # `spatial_shards`, see parallel/spatial.py
        import jax as _jax

        if len(_jax.devices()) < shards:
            raise ValueError(
                f"spatial_shards={shards} but only "
                f"{len(_jax.devices())} devices are visible"
            )
        from .parallel.spatial import spatial_tta_sample

        result = spatial_tta_sample(
            spec,
            params,
            raw,
            inference_config,
            normalization_factor,
            sample_seed=sample_seed,
            compute_dtype=compute_dtype,
        )
        return (result, None) if return_device else result

    crop_size = tuple(inference_config.crop_size)
    geometry = compute_geometry(crop_size, spec.downsampling_factors)
    out_tile = geometry.output_size
    context = geometry.context

    if source is None:
        raw = np.asarray(raw)
        spatial = raw.shape[1:]
        nf = float(normalization_factor)

        def source(origin, size, _raw=raw, _nf=nf):
            return (
                read_reflect_region(
                    lambda lo, hi: _raw[
                        (slice(None),) + tuple(slice(*b) for b in zip(lo, hi))
                    ],
                    _raw.shape[1:],
                    origin,
                    size,
                )
                * _nf
            )

    spatial = tuple(int(s) for s in spatial)
    ndim = len(spatial)
    D = spec.out_channels

    # cover the image with output tiles; a too-small image still gets one
    # tile (reads reflect past the boundary)
    origins = list(
        itertools.product(
            *[tile_origins(max(s, o), o) for s, o in zip(spatial, out_tile)]
        )
    )

    tb = max(1, int(inference_config.tile_batch_size))
    in_tile = tuple(o + 2 * c for o, c in zip(out_tile, context))

    transfer_dtype = (
        jnp.float16
        if getattr(inference_config, "transfer_precision", "float32") == "float16"
        else jnp.float32
    )
    tta_fn = _batched_tta(
        spec,
        float(inference_config.p_salt_pepper),
        int(inference_config.num_infer_iterations),
        compute_dtype,
        transfer_dtype,
    )

    if mesh is not None:
        from .parallel import batch_sharding, replicated_sharding

        n_shards = mesh.devices.size
        if tb % n_shards:
            tb = max(n_shards, tb - tb % n_shards)
        tile_sh = batch_sharding(mesh)
        params = jax.device_put(params, replicated_sharding(mesh))

        def run_batch(tiles, keys):
            return time_device(
                "predict.device",
                tta_fn,
                params,
                jax.device_put(tiles, tile_sh),
                jax.device_put(keys, tile_sh),
            )

    else:

        def run_batch(tiles, keys):
            # tiles: (T, *in_tile, C) channels-last
            return time_device("predict.device", tta_fn, params, tiles, keys)

    result = (
        None
        if write_fn is not None
        else np.zeros((D + 1, *spatial), dtype=np.float32)
    )

    # device-side assembly: valid whenever every output tile fits entirely
    # inside the image (the shingled tiling guarantees this when
    # spatial >= out_tile in every dim)
    dev_buf = None
    dev_upd = None
    if return_device and all(s_ >= o for s_, o in zip(spatial, out_tile)):
        dev_buf = jnp.zeros((*spatial, D + 1), jnp.float32)
        dev_upd = _device_update_kernel(ndim)

    def emit(tile_np: np.ndarray, origin: Tuple[int, ...]):
        # crop the written region to the true spatial extent
        sel_out = tuple(
            slice(o, min(o + t, s)) for o, t, s in zip(origin, out_tile, spatial)
        )
        sel_tile = tuple(
            slice(0, sl.stop - sl.start) for sl in sel_out
        )
        if any(sl.stop <= sl.start for sl in sel_out):
            return
        data = tile_np[(slice(None),) + sel_tile]
        if write_fn is not None:
            write_fn(data, tuple(sl.start for sl in sel_out))
        else:
            result[(slice(None),) + sel_out] = data

    pending = None
    from .utils.progress import progress as _progress

    batch_starts = _progress(
        range(0, len(origins), tb),
        f"predict tiles (batch of {tb})",
        total=(len(origins) + tb - 1) // tb,
    )
    for start in batch_starts:
        batch_origins = origins[start : start + tb]
        tiles = np.stack(
            [
                np.moveaxis(
                    source(
                        tuple(o - c for o, c in zip(orig, context)), in_tile
                    ),
                    0,
                    -1,
                )
                for orig in batch_origins
            ]
        )
        keys = jnp.stack(
            [
                jax.random.fold_in(
                    jax.random.PRNGKey(inference_config.seed),
                    sample_seed * 1_000_003 + start + i,
                )
                for i in range(len(batch_origins))
            ]
        )
        if len(batch_origins) < tb:
            # a short FINAL batch runs at its own (smaller) compiled shape
            # instead of padding to tb — the remainder size is fixed per
            # run, so this costs exactly one extra compile, not one per
            # batch, and skips up to tb-1 wasted TTA forwards. With a mesh
            # the batch axis still must divide the device count, so pad
            # only up to the next multiple of n_shards (a 1-tile image on
            # an 8-chip mesh pays 8 lanes; without a mesh it pays 1).
            pad_multiple = mesh.devices.size if mesh is not None else 1
            short = len(batch_origins)
            target = -(-short // pad_multiple) * pad_multiple
            if target > short:
                reps = target - short
                tiles = np.concatenate(
                    [tiles, np.repeat(tiles[-1:], reps, axis=0)]
                )
                keys = jnp.concatenate(
                    [keys, jnp.repeat(keys[-1:], reps, axis=0)]
                )
        out = run_batch(jnp.asarray(tiles), keys)  # (T, *out_tile, D+1)
        if dev_buf is not None:
            for i, orig in enumerate(batch_origins):
                dev_buf = dev_upd(
                    dev_buf, out[i], jnp.asarray(orig, jnp.int32)
                )
        if pending is not None:
            prev_out, prev_origins = pending
            prev_np = np.moveaxis(np.asarray(prev_out), -1, 1)
            for i, orig in enumerate(prev_origins):
                emit(prev_np[i], orig)
        pending = (out, batch_origins)
    if pending is not None:
        prev_out, prev_origins = pending
        prev_np = np.moveaxis(np.asarray(prev_out), -1, 1)
        for i, orig in enumerate(prev_origins):
            emit(prev_np[i], orig)

    if return_device:
        dev = jnp.moveaxis(dev_buf, -1, 0) if dev_buf is not None else None
        return result, dev
    return result


def predict(
    spec: UNetSpec,
    params,
    inference_config: InferenceConfig,
    normalization_factor: float,
    compute_dtype=jnp.float32,
) -> None:
    """Run the predict stage: raw zarr -> embeddings zarr."""
    dataset_config = inference_config.dataset_config
    meta = DatasetMetaData.from_dataset_config(dataset_config)

    if normalization_factor is None:
        raw_ds = zarr.open(dataset_config.container_path, "r")[
            dataset_config.dataset_name
        ]
        normalization_factor = normalization_factor_for(raw_ds.dtype)

    geometry = compute_geometry(
        tuple(inference_config.crop_size), spec.downsampling_factors
    )
    out_tile = geometry.output_size

    f = zarr.open(inference_config.prediction_dataset_config.container_path, "a")
    ds = f.create_dataset(
        inference_config.prediction_dataset_config.dataset_name,
        shape=(
            meta.num_samples,
            meta.num_spatial_dims + 1,
            *meta.spatial_array,
        ),
        dtype=np.float32,
        chunks=(1, meta.num_spatial_dims + 1, *out_tile),
        compressor=None,  # float embeddings are incompressible noise;
        # zlib-1 would serialize ~10 MB/sample of CPU work on the writer
    )

    raw_container = zarr.open(dataset_config.container_path, "r")
    raw_ds = raw_container[dataset_config.dataset_name]

    if int(getattr(inference_config, "spatial_shards", 0) or 0) >= 2:
        # whole-sample sharded forward (config knob `spatial_shards`):
        # each sample is one mesh-wide dispatch with ICI halo exchange
        from .io.meta_data import spatial_attrs as _sp_attrs

        for sample in range(meta.num_samples):
            raw = np.asarray(raw_ds[sample], np.float32)
            if raw.ndim == meta.num_spatial_dims:  # no channel axis stored
                raw = raw[None]
            out = predict_sample(
                spec,
                params,
                raw,
                inference_config,
                normalization_factor,
                sample_seed=sample,
                compute_dtype=compute_dtype,
            )
            ds[sample] = out
        ds.attrs.update(_sp_attrs(meta))
        return

    mesh = None
    if len(jax.devices()) > 1:
        from .parallel import make_mesh

        mesh = make_mesh()

    # a single writer thread keeps overlapping (shingled) tile writes
    # deterministic: the last tile in origin order wins, always
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        futures = []

        for sample in range(meta.num_samples):
            # streaming: tiles (plus context halo) read on demand from zarr;
            # the full sample is never materialized on host
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

            def write_fn(tile_np, origin, sample=sample):
                sel = (sample, slice(None)) + tuple(
                    slice(o, o + t) for o, t in zip(origin, tile_np.shape[1:])
                )
                futures.append(pool.submit(ds.__setitem__, sel, tile_np))

            predict_sample(
                spec,
                params,
                None,
                inference_config,
                normalization_factor,
                sample_seed=sample,
                compute_dtype=compute_dtype,
                write_fn=write_fn,
                mesh=mesh,
                source=source,
                spatial=meta.spatial_array,
            )
        for fut in futures:
            fut.result()

    from .detect import _spatial_attrs

    ds.attrs.update(_spatial_attrs(meta))
