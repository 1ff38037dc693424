"""Device morphology must match the scipy EDT-threshold formulation exactly."""

import numpy as np
import pytest

from cellulus_tpu.ops.morphology import disk_kernel, remove_halo_device
from cellulus_tpu.segment import remove_halo


def test_disk_kernel_small():
    k = disk_kernel(2.0, 2)
    # radius-2 disk: norms {0,1,sqrt(2)} inside, 2 excluded (strict <)
    assert k.shape == (3, 3)
    assert k.sum() == 9  # all of the 3x3 block has norm < 2


@pytest.mark.parametrize("grow,shrink", [(3, 6), (2, 2), (1, 4)])
def test_remove_halo_matches_scipy(grow, shrink):
    rng = np.random.default_rng(0)
    seg = np.zeros((64, 64), np.uint16)
    # several labeled rectangles with small gaps
    seg[5:25, 5:20] = 1
    seg[5:25, 23:38] = 2
    seg[30:60, 10:40] = 3
    seg[40:50, 45:60] = 4
    ref = remove_halo(seg, grow, shrink)
    dev = remove_halo_device(seg, grow, shrink)
    np.testing.assert_array_equal(ref, dev)


def test_remove_halo_matches_scipy_3d():
    seg = np.zeros((20, 20, 20), np.uint16)
    seg[3:10, 3:10, 3:10] = 1
    seg[12:18, 12:18, 3:12] = 2
    ref = remove_halo(seg, 3, 6)
    dev = remove_halo_device(seg, 3, 6)
    np.testing.assert_array_equal(ref, dev)


def test_remove_halo_random_blobs():
    rng = np.random.default_rng(1)
    seg = (rng.random((48, 48)) > 0.7).astype(np.uint16)
    from scipy import ndimage as ndi

    labeled, _ = ndi.label(seg)
    ref = remove_halo(labeled.astype(np.uint16), 3, 6)
    dev = remove_halo_device(labeled.astype(np.uint16), 3, 6)
    np.testing.assert_array_equal(ref, dev)


def test_cell_segment_sample_matches_unfused():
    """Fused halo-removal + size-filter == remove_halo -> size_filter."""
    from cellulus_tpu.ops.components import size_filter
    from cellulus_tpu.segment import cell_segment_sample

    rng = np.random.default_rng(4)
    seg = (rng.random((56, 61)) > 0.72).astype(np.uint16)
    from scipy import ndimage as ndi

    labeled, _ = ndi.label(seg)
    seg = labeled.astype(np.uint16)
    for min_size in (0, 4, 12):
        want = size_filter(remove_halo(seg, 3, 6), min_size)
        got = cell_segment_sample(seg, 3, 6, min_size)
        np.testing.assert_array_equal(np.asarray(want), got, err_msg=str(min_size))


def test_filter_relabel_device_matches_host():
    """Device size-filter + relabel == host epilogue, random labelings."""
    import numpy as np

    from cellulus_tpu.ops.components import (
        cc_parents,
        filter_relabel_device,
        filter_relabel_from_parents,
    )
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    for trial in range(4):
        seg = (rng.random((40, 52)) < 0.35).astype(np.int32)
        seg *= rng.integers(1, 6, seg.shape).astype(np.int32)
        parents = np.asarray(jax.jit(cc_parents)(seg)).ravel()
        vals = np.concatenate([seg.ravel(), [0]])[parents]
        for min_size in (0, 1, 3, 8):
            host = filter_relabel_from_parents(vals, parents, min_size)
            dev = np.asarray(
                filter_relabel_device(
                    jnp.asarray(parents), jnp.asarray(vals), min_size
                )
            )
            np.testing.assert_array_equal(dev.astype(np.int32), host)
