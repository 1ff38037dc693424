"""Device elastic warp == host (scipy) warp given identical parameters."""

import numpy as np
import pytest

from cellulus_tpu.datasets import elastic as host_elastic
from cellulus_tpu.datasets.elastic_jax import (
    deformation_grid,
    elastic_deform_device,
    map_coordinates_linear,
)


class _StubRng:
    """Feeds preset rotation/scale/control-point draws to the host path."""

    def __init__(self, rotation, scale, cps):
        self._uniforms = [rotation, scale]
        self._cps = list(cps)

    def uniform(self, lo, hi):
        return self._uniforms.pop(0)

    def normal(self, mean, std, size):
        return self._cps.pop(0)


@pytest.mark.parametrize("jitter", [0.0, 2.0])
def test_device_warp_matches_scipy(jitter):
    import jax

    rng = np.random.default_rng(0)
    crop = (24, 28)
    margin = host_elastic.required_margin(crop, jitter)
    padded = rng.random((1, crop[0] + 2 * margin, crop[1] + 2 * margin)).astype(
        np.float32
    )
    rotation, scale = 0.7, 1.05
    n_cp = tuple(max(2, int(np.ceil(s / 16)) + 1) for s in crop)
    cps = [
        (rng.normal(0, jitter, size=n_cp) if jitter else np.zeros(n_cp)).astype(
            np.float32
        )
        for _ in range(2)
    ]

    host = host_elastic.elastic_deform(
        padded, crop, 16, jitter, _StubRng(rotation, scale, cps)
    )

    grid = deformation_grid(
        crop,
        padded.shape[1:],
        np.float32(rotation),
        np.float32(scale),
        np.stack(cps) if jitter else None,
    )
    dev = np.asarray(
        jax.vmap(lambda ch: map_coordinates_linear(ch, grid))(padded)
    )
    np.testing.assert_allclose(host, dev, atol=2e-3)


def test_elastic_deform_device_runs_and_is_smooth():
    """End-to-end device deform: correct shape, finite, key-deterministic."""
    import jax

    rng = np.random.default_rng(1)
    crop = (20, 20)
    margin = host_elastic.required_margin(crop, 2.0)
    padded = rng.random((2, crop[0] + 2 * margin, crop[1] + 2 * margin)).astype(
        np.float32
    )
    out1 = np.asarray(
        elastic_deform_device(padded, crop, 10, 2.0, jax.random.PRNGKey(3))
    )
    out2 = np.asarray(
        elastic_deform_device(padded, crop, 10, 2.0, jax.random.PRNGKey(3))
    )
    out3 = np.asarray(
        elastic_deform_device(padded, crop, 10, 2.0, jax.random.PRNGKey(4))
    )
    assert out1.shape == (2, *crop)
    assert np.isfinite(out1).all()
    np.testing.assert_array_equal(out1, out2)
    assert not np.array_equal(out1, out3)
