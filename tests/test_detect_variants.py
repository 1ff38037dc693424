"""Detect-stage variants: seeds, multiple bandwidths, fixed threshold."""

import numpy as np

from cellulus_tpu.configs import InferenceConfig
from cellulus_tpu.detect import detect_sample, mean_center_embeddings


def _synthetic_embeddings(h=48, w=48, centers=((12, 12), (34, 34)), r=6):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    emb = np.zeros((3, h, w), np.float32)
    emb[2] = 1.0
    for cy, cx in centers:
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        emb[0][mask] = cx - xx[mask]
        emb[1][mask] = cy - yy[mask]
        emb[2][mask] = 0.05
    return emb


def test_detect_sample_multiple_bandwidths():
    emb = _synthetic_embeddings()
    ic = InferenceConfig(
        bandwidth=8.0, num_bandwidths=2, min_size=0, reduction_probability=1.0
    )
    thr, mask, centered, det = detect_sample(emb, ic, 2, np.random.default_rng(0))
    assert det.shape == (2, 48, 48)
    for k in range(2):
        ids = np.unique(det[k])
        assert len(ids[ids > 0]) == 2


def test_detect_sample_fixed_threshold():
    emb = _synthetic_embeddings()
    ic = InferenceConfig(
        bandwidth=8.0, threshold=0.5, min_size=0, reduction_probability=1.0
    )
    thr, mask, _, det = detect_sample(emb, ic, 2, np.random.default_rng(0))
    assert thr == 0.5
    assert mask.sum() == (emb[2] < 0.5).sum()


def test_detect_sample_threshold_quantile(monkeypatch):
    """threshold_quantile keeps exactly that fraction of pixels foreground
    (per-sample percentile of the uncertainty channel), host and device
    paths agree, and the config rejects combining it with a fixed
    threshold."""
    import pytest

    emb = _synthetic_embeddings()
    ic = InferenceConfig(
        bandwidth=8.0,
        threshold_quantile=90.0,
        min_size=0,
        reduction_probability=1.0,
    )
    thr, mask, _, det = detect_sample(emb, ic, 2, np.random.default_rng(0))
    assert thr == float(np.percentile(emb[-1], 90.0))
    np.testing.assert_array_equal(mask, emb[-1] < thr)
    # on this fixture q90 of std is the background value 1.0, so the mask
    # is exactly the two low-std disks; both still cluster
    assert mask.sum() == (emb[-1] < 1.0).sum()
    assert len(np.unique(det[0])[np.unique(det[0]) > 0]) == 2

    monkeypatch.setenv("CELLULUS_TPU_DEVICE_DETECT", "1")
    thr_d, mask_d, _, det_d = detect_sample(
        emb, ic, 2, np.random.default_rng(0)
    )
    monkeypatch.delenv("CELLULUS_TPU_DEVICE_DETECT")
    np.testing.assert_allclose(thr_d, thr, rtol=1e-5)
    np.testing.assert_array_equal(mask_d, mask)
    np.testing.assert_array_equal(det_d, det)

    with pytest.raises(ValueError, match="mutually exclusive"):
        InferenceConfig(threshold=0.5, threshold_quantile=90.0)
    with pytest.raises(ValueError, match="threshold_quantile"):
        InferenceConfig(threshold_quantile=150.0)


def test_detect_sample_with_seeds():
    emb = _synthetic_embeddings()
    ic = InferenceConfig(
        bandwidth=8.0,
        use_seeds=True,
        min_size=0,
        reduction_probability=1.0,
    )
    thr, mask, centered, det = detect_sample(emb, ic, 2, np.random.default_rng(0))
    ids = np.unique(det[0])
    assert len(ids[ids > 0]) >= 2


def test_mean_center_excludes_exact_zeros():
    # reference quirk: masked mean excludes exact-zero values (detect.py:97-118)
    emb = np.zeros((3, 4, 4), np.float32)
    emb[0, 0, 0] = 2.0
    emb[0, 0, 1] = 4.0
    mask = np.ones((4, 4), bool)
    centered = mean_center_embeddings(emb, mask)
    # mean over {2, 4} = 3 (zeros excluded), subtracted everywhere
    np.testing.assert_allclose(centered[0, 0, 0], -1.0)
    np.testing.assert_allclose(centered[0, 2, 2], -3.0)
    # uncertainty channel untouched
    np.testing.assert_allclose(centered[2], emb[2])


def test_device_detect_matches_host_path(monkeypatch):
    """The device-resident detect path (on-device otsu/mask/grid/predict)
    equals the host-prep path bit-for-bit when the threshold is fixed
    (same RNG stream, same fit subsample, same kernels)."""
    import numpy as np

    from cellulus_tpu.configs import InferenceConfig
    from cellulus_tpu.detect import detect_sample

    rng_data = np.random.default_rng(3)
    D = 2
    emb = rng_data.normal(0, 5.0, size=(D + 1, 48, 52)).astype(np.float32)
    emb[-1] = rng_data.random((48, 52)).astype(np.float32)

    ic = InferenceConfig(
        crop_size=[36, 36],
        bandwidth=6.0,
        threshold=0.7,
        num_bandwidths=2,
        reduction_probability=0.4,
    )

    monkeypatch.setenv("CELLULUS_TPU_DEVICE_DETECT", "1")
    a = detect_sample(emb, ic, D, np.random.default_rng([1, 0]))
    monkeypatch.delenv("CELLULUS_TPU_DEVICE_DETECT")
    b = detect_sample(emb, ic, D, np.random.default_rng([1, 0]))
    assert a[0] == b[0]
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])
    np.testing.assert_array_equal(a[3], b[3])


def test_smooth_peak_seeds_matches_scipy():
    """Device seed computation (separable-shift gaussian + max-pool peak
    mask, one dispatch) reproduces the host oracle exactly:
    ``np.flip(peak_local_max(-gaussian_filter(x, 2)), 1)`` — same
    coordinates, same intensity-descending order (reference
    ``detect.py:128-132`` semantics)."""
    import numpy as np
    from scipy.ndimage import gaussian_filter

    from cellulus_tpu.ops.peaks import peak_local_max, smooth_peak_seeds

    rng = np.random.default_rng(7)
    for ndim, shape in ((2, (61, 53)), (3, (17, 29, 23))):
        # a realistic offset-magnitude field: smooth valleys + noise
        x = rng.random(shape).astype(np.float32)
        x = gaussian_filter(x, 3.0) + 0.01 * rng.random(shape).astype(np.float32)

        smooth = gaussian_filter(x, sigma=2)
        expect = np.flip(peak_local_max(-smooth), 1).astype(np.float32)

        got = smooth_peak_seeds(x, sigma=2.0)
        assert got.shape == expect.shape, (got.shape, expect.shape)
        np.testing.assert_array_equal(got, expect)

    # large realistic field: COORDINATES are exact as a set; the
    # intensity-descending order may swap ULP-tied peaks (documented
    # contract — the device gaussian and scipy accumulate in different
    # orders). Order swaps must be confined to value ties.
    x = rng.random((512, 512)).astype(np.float32)
    x = gaussian_filter(x, 3.0)
    smooth = gaussian_filter(x, sigma=2)
    expect = np.flip(peak_local_max(-smooth), 1).astype(np.float32)
    got = smooth_peak_seeds(x, sigma=2.0)
    assert got.shape == expect.shape
    assert set(map(tuple, got.tolist())) == set(map(tuple, expect.tolist()))
    swapped = (got != expect).any(1)
    if swapped.any():
        vals_got = smooth[tuple(np.flip(got[swapped], 1).astype(int).T)]
        vals_exp = smooth[tuple(np.flip(expect[swapped], 1).astype(int).T)]
        np.testing.assert_allclose(vals_got, vals_exp, rtol=1e-5)


def test_smooth_peak_seeds_cross_check_flag(monkeypatch):
    """CELLULUS_TPU_CHECK_SEEDS re-runs the scipy oracle per call: silent
    when the device path agrees (it does on this fixture)."""
    import warnings

    import numpy as np
    from scipy.ndimage import gaussian_filter

    from cellulus_tpu.ops.peaks import smooth_peak_seeds

    rng = np.random.default_rng(3)
    x = gaussian_filter(rng.random((41, 37)).astype(np.float32), 3.0)
    monkeypatch.setenv("CELLULUS_TPU_CHECK_SEEDS", "1")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        smooth_peak_seeds(x, sigma=2.0)
    assert not [x for x in w if "diverged" in str(x.message)]
