"""Pair-sampler distribution and bounds tests."""

import numpy as np

from cellulus_tpu.datasets import PairSampler, disk_offsets


def test_disk_offsets_exclude_zero_and_outside():
    offs = disk_offsets(10.0, 2)
    norms2 = (offs**2).sum(axis=1)
    assert (norms2 > 0).all()
    assert (norms2 < 100).all()
    # count parity with the radius-10 disk lattice
    assert len(offs) == sum(
        1
        for dx in range(-10, 11)
        for dy in range(-10, 11)
        if 0 < dx * dx + dy * dy < 100
    )


def test_sampler_counts_match_reference_formulas():
    # reference zarr_dataset.py:244-248
    s = PairSampler(output_shape=(236, 236), density=0.1, kappa=10.0)
    unbiased = 236 - 20
    assert s.n_anchors == int(0.1 * unbiased * unbiased)
    assert s.n_references == int(0.1 * 100 * np.pi)
    assert s.num_pairs == s.n_anchors * s.n_references


def test_sampler_bounds_and_pairing():
    s = PairSampler(output_shape=(100, 80), density=0.05, kappa=8.0)
    rng = np.random.default_rng(0)
    anchors, refs = s.sample(rng)
    assert anchors.shape == refs.shape == (s.num_pairs, 2)
    # x-first: component 0 (x) indexes the LAST axis (80), component 1 (y)
    # the first (100)
    assert anchors[:, 0].min() >= 8 and anchors[:, 0].max() <= 72
    assert anchors[:, 1].min() >= 8 and anchors[:, 1].max() <= 92
    # references stay strictly inside the output (x-first bounds)
    assert refs[:, 0].min() >= 0 and refs[:, 0].max() < 80
    assert refs[:, 1].min() >= 0 and refs[:, 1].max() < 100
    # every reference is within kappa of its anchor, never equal
    d2 = ((refs - anchors) ** 2).sum(axis=1)
    assert (d2 > 0).all() and (d2 < 64).all()
    # anchors repeat in blocks of n_references
    blocks = anchors.reshape(s.n_anchors, s.n_references, 2)
    assert (blocks == blocks[:, :1]).all()


def test_sampler_anisotropic_3d_in_bounds():
    """Regression: anisotropic outputs must never index out of bounds
    (z is component 2 and indexes the first axis)."""
    out = (20, 52, 52)  # (z, y, x)
    s = PairSampler(output_shape=out, density=0.1, kappa=4.0)
    anchors, refs = s.sample(np.random.default_rng(0))
    for coords in (anchors, refs):
        assert coords[:, 0].max() < 52 and coords[:, 0].min() >= 0  # x
        assert coords[:, 1].max() < 52 and coords[:, 1].min() >= 0  # y
        assert coords[:, 2].max() < 20 and coords[:, 2].min() >= 0  # z
    # device path too
    import jax

    sample = s.device_sampler()
    a, r = sample(jax.random.PRNGKey(0), 2)
    a, r = np.asarray(a), np.asarray(r)
    assert a[..., 2].max() < 20 and r[..., 2].max() < 20
    assert a[..., 0].max() < 52


def test_sampler_3d():
    s = PairSampler(output_shape=(40, 40, 40), density=0.05, kappa=6.0)
    anchors, refs = s.sample(np.random.default_rng(1))
    assert anchors.shape[1] == 3
    d2 = ((refs - anchors) ** 2).sum(axis=1)
    assert (d2 > 0).all() and (d2 < 36).all()
