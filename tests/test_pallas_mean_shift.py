"""Pallas ball-statistics kernel: interpret-mode correctness on CPU."""

import jax.numpy as jnp
import numpy as np

from cellulus_tpu.ops.pallas_mean_shift import ball_stats_pallas


def _reference(centers, x, valid, bw):
    d2 = ((centers[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    w = (d2 <= bw * bw) & valid[None, :]
    return w.sum(1).astype(np.float32), w.astype(np.float32) @ x


def test_ball_stats_matches_dense_reference():
    rng = np.random.default_rng(0)
    for S, N, d in [(37, 1000, 2), (5, 130, 3), (128, 512, 2)]:
        centers = (rng.normal(size=(S, d)) * 3).astype(np.float32)
        x = (rng.normal(size=(N, d)) * 3).astype(np.float32)
        valid = rng.random(N) > 0.1
        bw = 1.5
        counts, sums = ball_stats_pallas(
            jnp.asarray(centers), jnp.asarray(x), jnp.asarray(valid),
            bw * bw, interpret=True,
        )
        ref_counts, ref_sums = _reference(centers, x, valid, bw)
        np.testing.assert_allclose(np.asarray(counts), ref_counts, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sums), ref_sums, rtol=1e-5, atol=1e-5
        )


def test_ball_stats_boundary_inclusive():
    centers = np.array([[0.0, 0.0]], np.float32)
    x = np.array([[1.0, 0.0], [1.0001, 0.0]], np.float32)
    counts, _ = ball_stats_pallas(
        jnp.asarray(centers), jnp.asarray(x),
        jnp.asarray(np.ones(2, bool)), 1.0, interpret=True,
    )
    # dist <= bandwidth is inclusive (sklearn radius query semantics)
    assert float(counts[0]) == 1.0
