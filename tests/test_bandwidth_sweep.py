"""Vectorized multi-bandwidth mean-shift sweep tests."""

import numpy as np

from cellulus_tpu.configs import InferenceConfig
from cellulus_tpu.detect import detect_sample
from cellulus_tpu.ops.mean_shift import (
    mean_shift_fit_predict,
    mean_shift_sweep_fit_predict,
)


def _clustered_points(rng, centers, n=60, spread=0.5):
    return np.concatenate(
        [rng.normal(c, spread, size=(n, 2)) for c in centers]
    ).astype(np.float32)


def test_sweep_matches_serial_path():
    rng = np.random.default_rng(0)
    X = _clustered_points(rng, [[0, 0], [10, 10], [0, 12]])
    bandwidths = [3.0, 1.5]
    sweep = mean_shift_sweep_fit_predict(X, bandwidths, reduction_probability=1.0)
    assert sweep.shape == (2, len(X))
    for k, bw in enumerate(bandwidths):
        serial = mean_shift_fit_predict(
            X, bandwidth=bw, seeds=None, reduction_probability=1.0
        )
        np.testing.assert_array_equal(sweep[k], serial)


def test_detect_sample_vectorized_sweep():
    h = w = 48
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    emb = np.zeros((3, h, w), np.float32)
    emb[2] = 1.0
    for cy, cx in [(12, 12), (34, 34)]:
        m = ((yy - cy) ** 2 + (xx - cx) ** 2) < 36
        emb[0][m] = cx - xx[m]
        emb[1][m] = cy - yy[m]
        emb[2][m] = 0.05
    base = InferenceConfig(
        bandwidth=8.0, num_bandwidths=2, min_size=0, reduction_probability=1.0
    )
    vec = InferenceConfig(
        bandwidth=8.0, num_bandwidths=2, min_size=0, reduction_probability=1.0,
        vectorized_bandwidth_sweep=True,
    )
    _, _, _, det_serial = detect_sample(emb, base, 2, np.random.default_rng(1))
    _, _, _, det_vec = detect_sample(emb, vec, 2, np.random.default_rng(1))
    np.testing.assert_array_equal(det_serial, det_vec)
