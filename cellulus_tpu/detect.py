"""Detect stage: embeddings zarr -> instance detections zarr
(reference parity: ``cellulus/detect.py:14-192``).

Per sample: Otsu (or fixed) threshold on the uncertainty channel -> binary
foreground mask; mean-center the offset channels over the foreground; then
cluster the absolute embeddings per bandwidth with on-device mean-shift
(:mod:`.ops.mean_shift`) or greedy clustering (:mod:`.ops.greedy_cluster`).

Outputs (matching the reference layouts):
- ``detection``: ``(s, num_bandwidths, *spatial)`` uint16,
- ``binary-segmentation``: ``(s, 1, *spatial)`` uint16,
- ``centered-embeddings``: ``(s, D+1, *spatial)`` float32.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

from .configs import InferenceConfig
from .io import DatasetMetaData, zarr
from .ops.greedy_cluster import greedy_cluster
from .ops.mean_shift import mean_shift_segmentation
from .ops.otsu import threshold_otsu
from .ops.peaks import smooth_peak_seeds


def want_device_detect(inference_config: InferenceConfig) -> bool:
    """Resolve the device-detect knob: the ``device_detect`` config field
    when set, else the CELLULUS_TPU_DEVICE_DETECT env var (override for
    experiments). Wins on directly attached TPUs; loses over this build
    host's tunnel (0.65 vs 0.37 s/sample, NOTES.md)."""
    from .utils.env import resolve_flag

    return resolve_flag(
        getattr(inference_config, "device_detect", None),
        "CELLULUS_TPU_DEVICE_DETECT",
    )


# ---------------------------------------------------------------------------
# device-resident mean-shift detect path
#
# The default (meanshift, un-seeded) detect keeps the embeddings on device:
# Otsu threshold, foreground mask and the absolute-coordinate point set are
# computed in one jitted program; the host only receives the mask (1 B/px),
# the fit subsample (for sklearn-parity bin seeding) and the final uint16
# detection — instead of shipping the full (N_fg, D) float32 point set both
# ways (~7 MB h2d per 944^2 sample on the round-1 path).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _prep_kernel(spatial: tuple, D: int, use_quantile: bool = False):
    import jax
    import jax.numpy as jnp

    from .ops.otsu import threshold_otsu_jax

    @jax.jit
    def run(emb, fixed_threshold, quantile_pct):
        # emb: (D+1, *spatial) f32; fixed_threshold: scalar (nan = use Otsu);
        # quantile_pct: scalar percentile in (0, 100). ``use_quantile`` is a
        # trace-time flag (the config rejects threshold+quantile together):
        # it keeps the quantile's full device sort out of the disabled
        # program and the Otsu histogram out of the quantile program.
        std = emb[-1]
        if use_quantile:
            # the config rejects threshold+threshold_quantile together, so
            # fixed_threshold is always NaN here — computing the Otsu
            # histogram too would be pure dead device work per sample
            thr = jnp.quantile(std, quantile_pct / 100.0)
        else:
            thr = jnp.where(
                jnp.isnan(fixed_threshold), threshold_otsu_jax(std), fixed_threshold
            )
        mask = std < thr
        absolute = emb[:D]
        ndim = D
        for channel in range(ndim):
            axis = ndim - 1 - channel  # x-first channel order
            shape = [1] * ndim
            shape[axis] = spatial[axis]
            absolute = absolute.at[channel].add(
                jnp.arange(spatial[axis], dtype=jnp.float32).reshape(shape)
            )
        X_all = absolute.reshape(D, -1).T  # (N, D)
        return thr, mask, X_all

    return run


@lru_cache(maxsize=None)
def _gather_kernel():
    import jax

    @jax.jit
    def run(X_all, idx):
        return X_all[idx]

    return run


@partial(lru_cache(maxsize=None))
def _detect_kernel(max_iter: int, chunk_fit: int, chunk_pred: int):
    import jax
    import jax.numpy as jnp

    from .ops.mean_shift import _fit_impl, _predict_impl

    @jax.jit
    def run(X_fit, fit_valid, seeds, s_valid, X_all_pad, mask_flat_pad, bw):
        centers, valid = _fit_impl(
            X_fit, fit_valid, seeds, s_valid, bw, max_iter, chunk_fit, False
        )
        labels = _predict_impl(X_all_pad, centers, valid, bw, chunk_pred)
        return jnp.where(mask_flat_pad, labels + 1, 0).astype(jnp.uint16)

    return run


def _meanshift_detect_device(
    embeddings_dev,
    spatial: tuple,
    D: int,
    inference_config: InferenceConfig,
    rng: np.random.Generator,
):
    """Mean-shift detections for all bandwidths from device embeddings.

    Returns ``(threshold, binary_mask (np bool), detections (K, *spatial)
    uint16)``. Semantics per bandwidth match
    :func:`..ops.mean_shift.mean_shift_segmentation` (sklearn-parity fit
    subsample, bin seeding, cluster_all=False orphans); the RNG subsample
    draw consumes the generator once per bandwidth, like the host path.
    """
    import jax.numpy as jnp

    from .ops.mean_shift import _next_pow2, bin_seeds

    ic = inference_config
    fixed = np.float32(ic.threshold if ic.threshold is not None else np.nan)
    qpct = np.float32(
        ic.threshold_quantile if ic.threshold_quantile is not None else np.nan
    )
    thr_dev, mask_dev, X_all = _prep_kernel(
        tuple(spatial), D, ic.threshold_quantile is not None
    )(embeddings_dev, fixed, qpct)
    threshold = (
        ic.threshold if ic.threshold is not None else float(thr_dev)
    )
    mask = np.asarray(mask_dev)
    n = int(mask.sum())
    N = int(np.prod(spatial))

    detections = np.zeros((ic.num_bandwidths, *spatial), dtype=np.uint16)
    if n == 0:
        return threshold, mask, detections

    # pad the full point set once; reused across bandwidths
    Np_pad = _next_pow2(max(N, 256))
    X_all_pad = jnp.pad(X_all, ((0, Np_pad - N), (0, 0)))
    mask_flat_pad = jnp.pad(jnp.asarray(mask_dev).ravel(), (0, Np_pad - N))

    flat_fg = np.flatnonzero(mask.ravel())
    gather = _gather_kernel()

    for k in range(ic.num_bandwidths):
        bandwidth = ic.bandwidth / (2**k)
        if ic.reduction_probability < 1.0:
            sel = rng.random(n) < ic.reduction_probability
            fit_idx = flat_fg[sel]
            if len(fit_idx) == 0:
                fit_idx = flat_fg
        else:
            fit_idx = flat_fg
        Nf = len(fit_idx)
        Nf_pad = _next_pow2(max(Nf, 256))
        idx_pad = np.zeros(Nf_pad, np.int32)
        idx_pad[:Nf] = fit_idx
        X_fit = gather(X_all, jnp.asarray(idx_pad))  # (Nf_pad, D) device
        fit_valid = np.zeros(Nf_pad, bool)
        fit_valid[:Nf] = True

        seeds = bin_seeds(np.asarray(X_fit[:Nf]), bin_size=bandwidth)
        if len(seeds) == 0:
            continue
        S_pad = _next_pow2(max(len(seeds), 64))
        seeds_pad = np.zeros((S_pad, D), np.float32)
        seeds_pad[: len(seeds)] = seeds
        s_valid = np.zeros(S_pad, bool)
        s_valid[: len(seeds)] = True

        chunk_fit = max(256, min(1 << 18, (1 << 26) // S_pad, Nf_pad))
        while Nf_pad % chunk_fit:
            chunk_fit //= 2
        chunk_pred = max(256, min(1 << 18, (1 << 26) // S_pad, Np_pad))
        while Np_pad % chunk_pred:
            chunk_pred //= 2

        from .utils.profiling import time_device

        det = time_device(
            "detect.device",
            _detect_kernel(ic.mean_shift_max_iterations, chunk_fit, chunk_pred),
            X_fit,
            jnp.asarray(fit_valid),
            jnp.asarray(seeds_pad),
            jnp.asarray(s_valid),
            X_all_pad,
            mask_flat_pad,
            jnp.float32(bandwidth),
        )
        detections[k] = np.asarray(det[:N]).reshape(spatial)

    return threshold, mask, detections


def sample_rng(seed: int, sample: int) -> np.random.Generator:
    """Per-sample RNG stream: detect results for one sample are independent
    of how many / in which order other samples were processed, so the
    pipelined path can run samples concurrently and still match the staged
    path bit-for-bit (tests/test_pipelined_infer.py)."""
    return np.random.default_rng([int(seed), int(sample)])


# canonical helper lives beside DatasetMetaData; stage modules import this
# name for backward compatibility
from .io.meta_data import spatial_attrs as _spatial_attrs  # noqa: E402


def mean_center_embeddings(
    embeddings: np.ndarray, binary_mask: np.ndarray
) -> np.ndarray:
    """Subtract the foreground-mean offset per channel.

    Reference quirk preserved (``detect.py:97-118``): the mean is taken over
    foreground values that are exactly non-zero (masked-out entries become 0
    and are excluded by value, which also drops true zeros).
    """
    centered = np.array(embeddings, dtype=np.float32, copy=True)
    D = embeddings.shape[0] - 1
    for channel in range(D):
        masked = embeddings[channel] * binary_mask
        nonzero = masked[masked != 0]
        if len(nonzero):
            centered[channel] -= nonzero.mean()
    return centered


def detect_sample(
    embeddings: np.ndarray,
    inference_config: InferenceConfig,
    num_spatial_dims: int,
    rng: np.random.Generator,
    embeddings_device=None,
):
    """Detect instances for one sample.

    Args:
        embeddings: ``(D+1, *spatial)``: mean offsets + uncertainty channel.
        embeddings_device: optional device-resident copy (channels-first);
            when given (pipelined path), the default mean-shift branch runs
            without re-uploading the embeddings.

    Returns:
        ``(threshold, binary_mask, centered_embeddings,
        detections (num_bandwidths, *spatial))``.
    """
    embeddings = np.asarray(embeddings, dtype=np.float32)
    embeddings_std = embeddings[-1]

    if (
        inference_config.clustering == "meanshift"
        and not inference_config.use_seeds
        and not getattr(inference_config, "vectorized_bandwidth_sweep", False)
        and want_device_detect(inference_config)
    ):
        # fully device-resident path (inference_config.device_detect): otsu +
        # mask + grid + fit + predict on device; the host receives only the
        # mask, the fit subsample and the uint16 detections. On directly
        # attached TPUs this minimizes PCIe traffic; over the tunneled
        # single chip its several small transfers measured SLOWER than the
        # host-prep path's one 7 MB point-set upload (0.65 vs 0.37 s/sample,
        # NOTES.md), so the host path below stays the default here.
        import jax.numpy as jnp

        emb_dev = (
            embeddings_device
            if embeddings_device is not None
            else jnp.asarray(embeddings)
        )
        threshold, binary_mask, detections = _meanshift_detect_device(
            emb_dev,
            embeddings_std.shape,
            num_spatial_dims,
            inference_config,
            rng,
        )
        centered = mean_center_embeddings(embeddings, binary_mask)
        return threshold, binary_mask, centered, detections

    if inference_config.threshold is not None:
        threshold = inference_config.threshold
    elif inference_config.threshold_quantile is not None:
        threshold = float(
            np.percentile(embeddings_std, inference_config.threshold_quantile)
        )
    else:
        threshold = threshold_otsu(embeddings_std)

    binary_mask = embeddings_std < threshold
    centered = mean_center_embeddings(embeddings, binary_mask)

    detections = np.zeros(
        (inference_config.num_bandwidths, *embeddings_std.shape), dtype=np.uint16
    )

    if (
        inference_config.clustering == "meanshift"
        and inference_config.num_bandwidths > 1
        and not inference_config.use_seeds
        and getattr(inference_config, "vectorized_bandwidth_sweep", False)
    ):
        # TPU extension: all bandwidths cluster as one vmapped computation
        from .ops.mean_shift import add_coordinate_grid, mean_shift_sweep_fit_predict

        absolute = add_coordinate_grid(embeddings[:num_spatial_dims])
        mask = embeddings_std < threshold
        bandwidths = [
            inference_config.bandwidth / (2**k)
            for k in range(inference_config.num_bandwidths)
        ]
        if mask.sum() == 0:
            return threshold, binary_mask, centered, detections
        X = absolute.reshape(num_spatial_dims, -1).T[mask.ravel()]
        # shard the bandwidth sweep over the device mesh when K divides it
        mesh = None
        import jax

        if (
            len(jax.devices()) > 1
            and inference_config.num_bandwidths % len(jax.devices()) == 0
        ):
            from .parallel import make_mesh

            mesh = make_mesh()
        labels = mean_shift_sweep_fit_predict(
            X,
            bandwidths,
            reduction_probability=inference_config.reduction_probability,
            max_iter=inference_config.mean_shift_max_iterations,
            rng=rng,
            mesh=mesh,
        )
        for k in range(inference_config.num_bandwidths):
            spatial = np.full(mask.shape, -1, np.int32)
            spatial[mask] = labels[k]
            detections[k] = (spatial + 1).astype(np.uint16)
    elif inference_config.clustering == "meanshift":
        seeds = None
        if inference_config.use_seeds:
            # seeds depend only on the offset field, not the bandwidth —
            # computed ONCE (the reference recomputes identical seeds per
            # bandwidth, reference detect.py:128-132) and on DEVICE
            # (smoothing + peak mask in one dispatch; scipy oracle kept
            # for the parity test, tests/test_detect_variants.py)
            offset_magnitude = np.linalg.norm(centered[:-1], axis=0)
            seeds = smooth_peak_seeds(offset_magnitude, sigma=2.0)
        for k in range(inference_config.num_bandwidths):
            bandwidth = inference_config.bandwidth / (2**k)
            if inference_config.use_seeds:
                segmentation = mean_shift_segmentation(
                    centered[:num_spatial_dims],
                    centered[-1],
                    bandwidth=bandwidth,
                    min_size=inference_config.min_size,
                    reduction_probability=inference_config.reduction_probability,
                    threshold=threshold,
                    seeds=seeds,
                    max_iter=inference_config.mean_shift_max_iterations,
                    rng=rng,
                    use_pallas=inference_config.pallas_mean_shift,
                )
            else:
                segmentation = mean_shift_segmentation(
                    embeddings[:num_spatial_dims],
                    embeddings[-1],
                    bandwidth=bandwidth,
                    min_size=inference_config.min_size,
                    reduction_probability=inference_config.reduction_probability,
                    threshold=threshold,
                    seeds=None,
                    max_iter=inference_config.mean_shift_max_iterations,
                    rng=rng,
                    use_pallas=inference_config.pallas_mean_shift,
                )
            detections[k] = segmentation.astype(np.uint16)
    else:  # greedy
        for k in range(inference_config.num_bandwidths):
            bandwidth = inference_config.bandwidth / (2**k)
            segmentation = greedy_cluster(
                embeddings,
                fg_mask=binary_mask,
                bandwidth=bandwidth,
                min_object_size=inference_config.min_size,
            )
            detections[k] = segmentation.astype(np.uint16)

    return threshold, binary_mask, centered, detections


def detect(inference_config: InferenceConfig) -> None:
    dataset_config = inference_config.dataset_config
    meta = DatasetMetaData.from_dataset_config(dataset_config)

    f = zarr.open(inference_config.detection_dataset_config.container_path, "a")
    ds_in = f[inference_config.detection_dataset_config.secondary_dataset_name]

    ds_detection = f.create_dataset(
        inference_config.detection_dataset_config.dataset_name,
        shape=(
            meta.num_samples,
            inference_config.num_bandwidths,
            *meta.spatial_array,
        ),
        dtype=np.uint16,
    )
    ds_binary = f.create_dataset(
        "binary-segmentation",
        shape=(meta.num_samples, 1, *meta.spatial_array),
        dtype=np.uint16,
    )
    ds_centered = f.create_dataset(
        "centered-embeddings",
        shape=(
            meta.num_samples,
            meta.num_spatial_dims + 1,
            *meta.spatial_array,
        ),
        dtype=np.float32,
        compressor=None,
    )
    for ds in (ds_detection, ds_binary, ds_centered):
        ds.attrs.update(_spatial_attrs(meta))

    # samples process concurrently: per-sample RNG streams make results
    # order-independent, so worker threads overlap one sample's host prep
    # with another's device compute (zarr writes are per-array locked).
    # With >1 device, samples round-robin across chips — detect is
    # embarrassingly parallel over samples, so stage throughput scales
    # with the mesh like predict's tile batches do (jax.default_device is
    # thread-local, pinning each worker's dispatches).
    import concurrent.futures

    import jax

    devices = jax.devices()

    def one(sample: int):
        embeddings = np.asarray(ds_in[sample], dtype=np.float32)
        with jax.default_device(devices[sample % len(devices)]):
            threshold, binary_mask, centered, detections = detect_sample(
                embeddings,
                inference_config,
                meta.num_spatial_dims,
                sample_rng(inference_config.seed, sample),
            )
        ds_binary[sample, 0] = binary_mask.astype(np.uint16)
        ds_centered[sample] = centered
        ds_detection[sample] = detections
        return sample, threshold

    workers = max(2, min(len(devices), meta.num_samples))
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
        for sample, threshold in pool.map(one, range(meta.num_samples)):
            print(f"For sample {sample}, binary threshold {threshold} was used.")
