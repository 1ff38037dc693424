"""Op-level tests: Otsu, peaks, components, mean-shift (sklearn parity),
greedy clustering."""

import numpy as np
import pytest

from cellulus_tpu.ops.components import label, size_filter
from cellulus_tpu.ops.greedy_cluster import greedy_cluster
from cellulus_tpu.ops.mean_shift import (
    add_coordinate_grid,
    bin_seeds,
    mean_shift_fit_predict,
    mean_shift_segmentation,
)
from cellulus_tpu.ops.otsu import threshold_otsu, threshold_otsu_jax
from cellulus_tpu.ops.peaks import peak_local_max


# -- otsu -------------------------------------------------------------------


def test_otsu_bimodal():
    rng = np.random.default_rng(0)
    image = np.concatenate(
        [rng.normal(0.2, 0.03, 3000), rng.normal(0.8, 0.03, 2000)]
    )
    thr = threshold_otsu(image)
    # the threshold must cleanly separate the two modes
    assert 0.28 < thr < 0.72
    assert abs((image < thr).mean() - 0.6) < 0.01
    thr_j = float(threshold_otsu_jax(np.asarray(image, np.float32)))
    assert abs(thr - thr_j) < 0.02


def test_otsu_separates_classes():
    image = np.array([0.0] * 50 + [1.0] * 50)
    thr = threshold_otsu(image)
    assert 0.0 < thr < 1.0


# -- peaks ------------------------------------------------------------------


def test_peak_local_max_simple():
    img = np.zeros((20, 20))
    img[5, 5] = 2.0
    img[12, 15] = 3.0
    coords = peak_local_max(img)
    assert coords.shape[1] == 2
    # sorted by intensity descending
    assert tuple(coords[0]) == (12, 15)
    assert tuple(coords[1]) == (5, 5)


def test_peak_local_max_excludes_border():
    img = np.zeros((10, 10))
    img[0, 3] = 5.0
    img[4, 4] = 1.0
    coords = peak_local_max(img)
    assert (0, 3) not in {tuple(c) for c in coords}


# -- components -------------------------------------------------------------


def test_label_full_connectivity():
    seg = np.zeros((5, 5), dtype=np.int32)
    seg[0, 0] = 1
    seg[1, 1] = 1  # diagonal: same component under 8-connectivity
    out = label(seg)
    assert out[0, 0] == out[1, 1] != 0


def test_label_separates_different_ids():
    seg = np.zeros((5, 5), dtype=np.int32)
    seg[1, 1] = 1
    seg[1, 2] = 2  # touching but different input ids
    out = label(seg)
    assert out[1, 1] != out[1, 2]


def test_size_filter():
    seg = np.zeros((10, 10), dtype=np.int32)
    seg[0:4, 0:4] = 1  # 16 px
    seg[8, 8] = 2  # 1 px
    out = size_filter(seg, min_size=5)
    assert (out[0:4, 0:4] > 0).all()
    assert out[8, 8] == 0
    assert len(np.unique(out)) == 2  # bg + 1 instance


def test_label_device_matches_scipy_oracle():
    """Randomized parity: device CC kernel == per-value scipy labeling,
    including the exact (value, raster-first-pixel) label ordering."""
    from cellulus_tpu.ops.components import label_host

    rng = np.random.default_rng(1)
    for shape in [(37, 41), (13, 17, 19), (64, 64)]:
        base = (rng.random(shape) < 0.45).astype(np.int32)
        ids = rng.integers(1, 5, size=shape).astype(np.int32) * base
        assert np.array_equal(label(ids), label_host(ids))


def test_size_filter_matches_reference_recipe():
    """size_filter == label -> drop small -> label (reference
    utils/misc.py:11-25), for both filter_non_connected settings."""
    from cellulus_tpu.ops.components import label_host

    def reference(seg, min_size, fnc):
        seg = seg.copy()
        fl = label_host(seg) if fnc else seg
        u, c = np.unique(fl, return_counts=True)
        seg[np.isin(fl, u[c < min_size])] = 0
        return label_host(seg)

    rng = np.random.default_rng(2)
    seg = rng.integers(0, 4, size=(48, 53)).astype(np.int32)
    seg[rng.random((48, 53)) < 0.5] = 0
    for min_size in (2, 6, 25):
        for fnc in (True, False):
            assert np.array_equal(
                size_filter(seg, min_size, fnc), reference(seg, min_size, fnc)
            ), (min_size, fnc)


# -- mean shift -------------------------------------------------------------


def test_bin_seeds_matches_sklearn():
    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 2)).astype(np.float32) * 3
    mine = bin_seeds(X, bin_size=1.0)
    theirs = sklearn_cluster.get_bin_seeds(X, bin_size=1.0, min_bin_freq=1)
    mine_set = {tuple(np.round(s, 5)) for s in mine}
    theirs_set = {tuple(np.round(s, 5)) for s in np.asarray(theirs)}
    assert mine_set == theirs_set


def _partition_equal(labels_a, labels_b):
    """Two labelings induce the same partition (incl. orphan sets)."""
    a_orph = labels_a == -1
    b_orph = labels_b == -1
    if not (a_orph == b_orph).all():
        return False
    mapping = {}
    for a, b in zip(labels_a[~a_orph], labels_b[~b_orph]):
        if a in mapping and mapping[a] != b:
            return False
        mapping[a] = b
    return len(set(mapping.values())) == len(mapping)


@pytest.mark.parametrize("seeded", [False, True])
def test_mean_shift_matches_sklearn(seeded):
    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    rng = np.random.default_rng(1)
    centers = np.array([[0.0, 0.0], [8.0, 8.0], [0.0, 9.0]])
    X = np.concatenate(
        [rng.normal(c, 0.6, size=(60, 2)) for c in centers]
    ).astype(np.float32)
    # a couple of far-away orphans
    X = np.concatenate([X, np.array([[30.0, 30.0], [-25.0, 4.0]], np.float32)])
    bandwidth = 2.0
    seeds = centers + 0.3 if seeded else None

    ref = sklearn_cluster.MeanShift(
        bandwidth=bandwidth, cluster_all=False, seeds=seeds
    ).fit_predict(X)
    mine = mean_shift_fit_predict(
        X, bandwidth=bandwidth, seeds=seeds, reduction_probability=1.0
    )
    assert _partition_equal(np.asarray(ref), np.asarray(mine))
    # cluster ids should match exactly (both are population-sorted)
    assert (np.asarray(ref) == mine).all()


def test_mean_shift_orphans_get_minus_one():
    X = np.array([[0.0, 0.0], [0.1, 0.0], [50.0, 50.0]], np.float32)
    labels = mean_shift_fit_predict(
        X, bandwidth=1.0, seeds=np.array([[0.0, 0.0]], np.float32)
    )
    assert labels[0] == 0 and labels[1] == 0
    assert labels[2] == -1


def test_cycle_shortcut_is_exact():
    """The period-2 oscillation shortcut must not change ANY output bit:
    run the fit kernel with and without it on data engineered to leave
    most seeds oscillating at max_iter (uniform points: flat-kernel mean
    shift 2-cycles), and compare centers + dedupe masks exactly."""
    import jax.numpy as jnp

    from cellulus_tpu.ops.mean_shift import (
        _fit_kernel,
        _next_pow2,
        _pad_rows,
        bin_seeds,
    )

    rng = np.random.default_rng(5)
    X = rng.uniform(0, 60, size=(6000, 3)).astype(np.float32)
    bw = 2.5
    seeds = bin_seeds(X, bw)
    N_pad = _next_pow2(max(len(X), 256))
    S_pad = _next_pow2(max(len(seeds), 64))
    chunk = max(256, min(1 << 18, (1 << 26) // S_pad, N_pad))
    while N_pad % chunk:
        chunk //= 2
    args = (
        jnp.asarray(_pad_rows(X, N_pad)),
        jnp.asarray(_pad_rows(np.ones(len(X), bool), N_pad)),
        jnp.asarray(_pad_rows(seeds, S_pad)),
        jnp.asarray(_pad_rows(np.ones(len(seeds), bool), S_pad)),
        jnp.float32(bw),
    )
    sc_fast, uniq_fast = _fit_kernel(
        *args, max_iter=50, chunk=chunk, cycle_shortcut=True
    )
    sc_slow, uniq_slow = _fit_kernel(
        *args, max_iter=50, chunk=chunk, cycle_shortcut=False
    )
    np.testing.assert_array_equal(np.asarray(sc_fast), np.asarray(sc_slow))
    np.testing.assert_array_equal(np.asarray(uniq_fast), np.asarray(uniq_slow))


def test_phased_fit_matches_monolithic(monkeypatch):
    """The host-driven phased fit (seed compaction between phases +
    compacted-center predict) must be BIT-IDENTICAL to the single fused
    dispatch: trajectories are seed-independent and the N-chunk stays
    fixed, so no float op changes (docs in ops/mean_shift.py)."""
    rng = np.random.default_rng(7)
    # many small clusters => many bin seeds freezing at different times,
    # plus orphans => exercises compaction, max_iter handling, dedupe
    centers = rng.uniform(0, 100, size=(40, 3)).astype(np.float32)
    X = np.concatenate(
        [rng.normal(c, 0.8, size=(50, 3)) for c in centers]
        + [rng.uniform(-50, -40, size=(5, 3))]
    ).astype(np.float32)
    kwargs = dict(bandwidth=3.0, seeds=None, reduction_probability=1.0)

    monkeypatch.setenv("CELLULUS_TPU_PHASED_MEANSHIFT", "0")
    mono = mean_shift_fit_predict(X, **kwargs)
    monkeypatch.setenv("CELLULUS_TPU_PHASED_MEANSHIFT", "1")
    phased = mean_shift_fit_predict(X, **kwargs)
    np.testing.assert_array_equal(mono, phased)


def test_phased_fit_matches_monolithic_max_iter(monkeypatch):
    """Seeds still live at max_iter take the finalize-recount path; the
    phased driver must reproduce it exactly."""
    rng = np.random.default_rng(3)
    X = rng.uniform(0, 60, size=(4000, 2)).astype(np.float32)
    kwargs = dict(
        bandwidth=2.5, seeds=None, reduction_probability=1.0, max_iter=3
    )
    monkeypatch.setenv("CELLULUS_TPU_PHASED_MEANSHIFT", "0")
    mono = mean_shift_fit_predict(X, **kwargs)
    monkeypatch.setenv("CELLULUS_TPU_PHASED_MEANSHIFT", "1")
    phased = mean_shift_fit_predict(X, **kwargs)
    np.testing.assert_array_equal(mono, phased)


def test_add_coordinate_grid_2d():
    offsets = np.zeros((2, 3, 4), np.float32)
    out = add_coordinate_grid(offsets)
    # channel 0 = x (last axis), channel 1 = y
    np.testing.assert_array_equal(out[0, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(out[1, :, 0], [0, 1, 2])


def test_mean_shift_segmentation_on_synthetic_embeddings():
    """Pixels pointing at two distinct centers split into two instances."""
    h = w = 32
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    centers = [(8, 8), (24, 24)]
    offset = np.zeros((2, h, w), np.float32)
    std = np.ones((h, w), np.float32)
    for cy, cx in centers:
        mask = (np.abs(yy - cy) <= 4) & (np.abs(xx - cx) <= 4)
        offset[0][mask] = cx - xx[mask]  # x offset
        offset[1][mask] = cy - yy[mask]  # y offset
        std[mask] = 0.1
    seg = mean_shift_segmentation(
        offset,
        std,
        bandwidth=3.0,
        min_size=0,
        reduction_probability=1.0,
        threshold=0.5,
        seeds=None,
    )
    assert seg.shape == (h, w)
    ids = np.unique(seg)
    assert len(ids[ids > 0]) == 2
    assert seg[8, 8] != seg[24, 24]
    assert seg[0, 31] == 0  # background


# -- greedy clustering ------------------------------------------------------


def test_greedy_cluster_two_objects():
    h = w = 32
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    centers = [(8, 8), (24, 24)]
    pred = np.zeros((3, h, w), np.float32)
    pred[2] = 1.0  # high uncertainty everywhere
    fg = np.zeros((h, w), bool)
    for cy, cx in centers:
        mask = (np.abs(yy - cy) <= 4) & (np.abs(xx - cx) <= 4)
        pred[0][mask] = cx - xx[mask]
        pred[1][mask] = cy - yy[mask]
        pred[2][mask] = 0.05
        fg |= mask
    seg = greedy_cluster(pred, fg, bandwidth=3.0, min_object_size=10)
    ids = np.unique(seg)
    assert len(ids[ids > 0]) == 2
    assert seg[8, 8] != seg[24, 24]
    assert seg[8, 8] > 0 and seg[24, 24] > 0
    assert seg[0, 31] == 0


def test_greedy_cluster_min_size_rejects():
    h = w = 16
    pred = np.zeros((3, h, w), np.float32)
    pred[2] = 1.0
    fg = np.zeros((h, w), bool)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    mask = (np.abs(yy - 8) <= 1) & (np.abs(xx - 8) <= 1)  # 9 px
    pred[0][mask] = 8 - xx[mask]
    pred[1][mask] = 8 - yy[mask]
    pred[2][mask] = 0.05
    fg |= mask
    seg = greedy_cluster(pred, fg, bandwidth=3.0, min_object_size=50)
    assert (seg == 0).all()
