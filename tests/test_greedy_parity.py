"""Greedy clustering: randomized parity against a direct numpy
implementation of the algorithm's published semantics (seed-and-grow with
Gaussian affinity; SURVEY.md C16)."""

import numpy as np

from cellulus_tpu.ops.greedy_cluster import greedy_cluster
from cellulus_tpu.ops.mean_shift import add_coordinate_grid


def _numpy_greedy(prediction, fg_mask, bandwidth, min_object_size,
                  seed_thresh=0.9, min_unclustered_sum=0):
    """Straightforward host implementation of the greedy clustering rules."""
    ndim = prediction.ndim - 1
    absolute = add_coordinate_grid(prediction[:ndim])
    uncertainty = prediction[ndim]
    lo, hi = uncertainty.min(), uncertainty.max()
    denom = lo - hi if lo != hi else 1.0
    score = (uncertainty - hi) / denom

    emb = absolute.reshape(ndim, -1).T
    score = score.ravel()
    fg = fg_mask.ravel().astype(bool)
    unclustered = np.ones(len(score), bool)
    instance = np.zeros(len(score), np.int32)
    count = 1
    while (unclustered & fg).sum() > min_unclustered_sum:
        masked = score * (unclustered & fg)
        seed = int(np.argmax(masked))
        if masked[seed] < seed_thresh:
            break
        center = emb[seed]
        affinity = np.exp(
            -((emb - center) ** 2).sum(1) / (2 * bandwidth * bandwidth)
        )
        proposal = (affinity > 0.5) & fg
        if proposal.sum() > min_object_size:
            frac = unclustered[proposal].sum() / proposal.sum()
            if frac > 0.5:
                instance[proposal] = count
                count += 1
        unclustered &= ~proposal
        unclustered[seed] = False
    return instance.reshape(fg_mask.shape)


def test_greedy_matches_numpy_reference_random():
    rng = np.random.default_rng(7)
    for trial in range(3):
        h = w = 24
        pred = np.zeros((3, h, w), np.float32)
        pred[2] = rng.uniform(0.5, 1.0, (h, w)).astype(np.float32)
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        fg = np.zeros((h, w), bool)
        for _ in range(3):
            cy, cx = rng.integers(4, h - 4, 2)
            r = rng.integers(2, 4)
            m = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
            pred[0][m] = cx - xx[m] + rng.normal(0, 0.2, m.sum())
            pred[1][m] = cy - yy[m] + rng.normal(0, 0.2, m.sum())
            pred[2][m] = rng.uniform(0.0, 0.05)
            fg |= m
        mine = greedy_cluster(pred, fg, bandwidth=2.5, min_object_size=3)
        ref = _numpy_greedy(pred, fg, bandwidth=2.5, min_object_size=3)
        np.testing.assert_array_equal(mine, ref, err_msg=f"trial {trial}")
