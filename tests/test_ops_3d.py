"""3D clustering op tests."""

import numpy as np

from cellulus_tpu.ops.greedy_cluster import greedy_cluster
from cellulus_tpu.ops.mean_shift import add_coordinate_grid, mean_shift_segmentation


def _volume_embeddings(s=24, centers=((6, 6, 6), (17, 17, 17)), r=4):
    zz, yy, xx = np.meshgrid(*[np.arange(s)] * 3, indexing="ij")
    emb = np.zeros((4, s, s, s), np.float32)
    emb[3] = 1.0
    for cz, cy, cx in centers:
        mask = ((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        emb[0][mask] = cx - xx[mask]  # x-first channel order
        emb[1][mask] = cy - yy[mask]
        emb[2][mask] = cz - zz[mask]
        emb[3][mask] = 0.05
    return emb


def test_add_coordinate_grid_3d():
    out = add_coordinate_grid(np.zeros((3, 2, 3, 4), np.float32))
    np.testing.assert_array_equal(out[0, 0, 0], [0, 1, 2, 3])  # x
    np.testing.assert_array_equal(out[1, 0, :, 0], [0, 1, 2])  # y
    np.testing.assert_array_equal(out[2, :, 0, 0], [0, 1])  # z


def test_mean_shift_3d_two_objects():
    emb = _volume_embeddings()
    seg = mean_shift_segmentation(
        emb[:3],
        emb[3],
        bandwidth=3.0,
        min_size=0,
        reduction_probability=1.0,
        threshold=0.5,
        seeds=None,
    )
    ids = np.unique(seg)
    assert len(ids[ids > 0]) == 2
    assert seg[6, 6, 6] != seg[17, 17, 17]
    assert seg[0, 0, 23] == 0


def test_greedy_3d_two_objects():
    emb = _volume_embeddings()
    fg = emb[3] < 0.5
    seg = greedy_cluster(emb, fg, bandwidth=3.0, min_object_size=10)
    ids = np.unique(seg)
    assert len(ids[ids > 0]) == 2
    assert seg[6, 6, 6] != seg[17, 17, 17]
    assert seg[6, 6, 6] > 0
