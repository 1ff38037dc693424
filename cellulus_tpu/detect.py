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

import numpy as np
from scipy.ndimage import gaussian_filter

from .configs import InferenceConfig
from .io import DatasetMetaData, zarr
from .ops.greedy_cluster import greedy_cluster
from .ops.mean_shift import mean_shift_segmentation
from .ops.otsu import threshold_otsu
from .ops.peaks import peak_local_max


def sample_rng(seed: int, sample: int) -> np.random.Generator:
    """Per-sample RNG stream: detect results for one sample are independent
    of how many / in which order other samples were processed, so the
    pipelined path can run samples concurrently and still match the staged
    path bit-for-bit (tests/test_pipelined_infer.py)."""
    return np.random.default_rng([int(seed), int(sample)])


def _spatial_attrs(meta: DatasetMetaData) -> dict:
    return {
        "axis_names": ["s", "c"] + ["t", "z", "y", "x"][-meta.num_spatial_dims :],
        "resolution": [1] * meta.num_spatial_dims,
        "offset": [0] * meta.num_spatial_dims,
    }


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
):
    """Detect instances for one sample.

    Args:
        embeddings: ``(D+1, *spatial)``: mean offsets + uncertainty channel.

    Returns:
        ``(threshold, binary_mask, centered_embeddings,
        detections (num_bandwidths, *spatial))``.
    """
    embeddings = np.asarray(embeddings, dtype=np.float32)
    embeddings_std = embeddings[-1]

    if inference_config.threshold is None:
        threshold = threshold_otsu(embeddings_std)
    else:
        threshold = inference_config.threshold

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
        for k in range(inference_config.num_bandwidths):
            bandwidth = inference_config.bandwidth / (2**k)
            if inference_config.use_seeds:
                offset_magnitude = np.linalg.norm(centered[:-1], axis=0)
                smooth = gaussian_filter(offset_magnitude, sigma=2)
                coordinates = peak_local_max(-smooth)
                seeds = np.flip(coordinates, 1).astype(np.float32)
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
    )
    for ds in (ds_detection, ds_binary, ds_centered):
        ds.attrs.update(_spatial_attrs(meta))

    for sample in range(meta.num_samples):
        embeddings = np.asarray(ds_in[sample], dtype=np.float32)
        threshold, binary_mask, centered, detections = detect_sample(
            embeddings,
            inference_config,
            meta.num_spatial_dims,
            sample_rng(inference_config.seed, sample),
        )
        print(f"For sample {sample}, binary threshold {threshold} was used.")
        ds_binary[sample, 0] = binary_mask.astype(np.uint16)
        ds_centered[sample] = centered
        ds_detection[sample] = detections
