"""Streaming (per-tile zarr reads) prediction must equal in-memory prediction."""

import numpy as np

from cellulus_tpu.configs import InferenceConfig
from cellulus_tpu.io import zarr
from cellulus_tpu.io.regions import read_reflect_region
from cellulus_tpu.models import UNetSpec, init_params
from cellulus_tpu.predict import predict_sample, tile_origins
import jax


def test_tile_origins_cover_exactly():
    assert tile_origins(100, 40) == [0, 40, 60]
    assert tile_origins(80, 40) == [0, 40]
    assert tile_origins(30, 40) == [0]
    # full coverage, no gaps
    for extent, tile in [(100, 40), (101, 7), (5, 9)]:
        covered = set()
        for o in tile_origins(max(extent, tile), tile):
            covered.update(range(o, o + tile))
        assert set(range(extent)) <= covered


def test_read_reflect_region():
    data = np.arange(2 * 6 * 6, dtype=np.float32).reshape(2, 6, 6)

    def read_fn(lo, hi):
        return data[(slice(None),) + tuple(slice(*b) for b in zip(lo, hi))]

    # interior
    out = read_reflect_region(read_fn, (6, 6), (1, 2), (3, 3))
    np.testing.assert_array_equal(out, data[:, 1:4, 2:5])
    # sticking out on the low side reflects
    out = read_reflect_region(read_fn, (6, 6), (-2, 0), (3, 2))
    np.testing.assert_array_equal(out[:, 0], data[:, 2, 0:2])  # reflect of row -2
    np.testing.assert_array_equal(out[:, 1], data[:, 1, 0:2])
    np.testing.assert_array_equal(out[:, 2], data[:, 0, 0:2])


def test_streaming_matches_in_memory(tmp_path):
    rng = np.random.default_rng(0)
    raw = rng.random((1, 90, 110)).astype(np.float32)
    f = zarr.open(tmp_path / "c.zarr", "a")
    f["raw"] = raw[None]  # (s, c, y, x)
    arr = f["raw"]

    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(0), spec)
    ic = InferenceConfig(crop_size=[52, 52], num_infer_iterations=2)

    in_memory = predict_sample(spec, params, raw, ic, 1.0, sample_seed=3)

    def source(origin, size):
        return read_reflect_region(
            lambda lo, hi: arr[
                (0, slice(None)) + tuple(slice(*b) for b in zip(lo, hi))
            ],
            (90, 110),
            origin,
            size,
        )

    streamed = predict_sample(
        spec, params, None, ic, 1.0, sample_seed=3,
        source=source, spatial=(90, 110),
    )
    np.testing.assert_array_equal(in_memory, streamed)
