"""Tests for the minimal zarr v2 store."""

import json

import numpy as np
import pytest

from cellulus_tpu.io import zarr


def test_roundtrip_basic(tmp_path):
    f = zarr.open(tmp_path / "c.zarr", "a")
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    f["x"] = data
    np.testing.assert_array_equal(f["x"][...], data)
    np.testing.assert_array_equal(f["x"][1], data[1])
    np.testing.assert_array_equal(f["x"][0, 1:3, 2], data[0, 1:3, 2])


def test_chunked_partial_write(tmp_path):
    f = zarr.open(tmp_path / "c.zarr", "a")
    ds = f.create_dataset("y", shape=(4, 10, 10), dtype=np.uint16, chunks=(1, 4, 4))
    ds[2, 3:9, 1:7] = np.full((6, 6), 7, dtype=np.uint16)
    out = ds[2]
    assert out[3, 1] == 7 and out[8, 6] == 7
    assert out[0, 0] == 0 and out[9, 9] == 0
    assert out.sum() == 7 * 36


def test_attrs_persist(tmp_path):
    f = zarr.open(tmp_path / "c.zarr", "a")
    f["x"] = np.zeros((2, 2))
    f["x"].attrs["axis_names"] = ["y", "x"]
    # reopen
    g = zarr.open(tmp_path / "c.zarr", "r")
    assert g["x"].attrs["axis_names"] == ["y", "x"]


def test_nested_groups(tmp_path):
    f = zarr.open(tmp_path / "c.zarr", "a")
    f["a/b/c"] = np.ones((3,))
    assert "a" in f
    np.testing.assert_array_equal(f["a/b/c"][...], np.ones((3,)))
    np.testing.assert_array_equal(f["a"]["b/c"][...], np.ones((3,)))


def test_metadata_is_zarr_v2(tmp_path):
    f = zarr.open(tmp_path / "c.zarr", "a")
    f["x"] = np.zeros((4, 4), dtype=np.float32)
    meta = json.loads((tmp_path / "c.zarr" / "x" / ".zarray").read_text())
    assert meta["zarr_format"] == 2
    assert meta["dtype"] == "<f4"
    assert meta["order"] == "C"


def test_compressors(tmp_path):
    data = np.random.default_rng(0).normal(size=(16, 16)).astype(np.float32)
    for comp in [None, {"id": "zlib", "level": 1}, {"id": "gzip", "level": 1}]:
        f = zarr.open(tmp_path / f"c_{comp and comp['id']}.zarr", "a")
        ds = f.create_dataset("x", shape=data.shape, dtype=data.dtype, compressor=comp)
        ds[...] = data
        np.testing.assert_array_equal(ds[...], data)


def test_int_index_squeeze(tmp_path):
    f = zarr.open(tmp_path / "c.zarr", "a")
    data = np.arange(60, dtype=np.int32).reshape(3, 4, 5)
    f["x"] = data
    assert f["x"][1, 2].shape == (5,)
    assert f["x"][1, 2, 3] == data[1, 2, 3]
    f["x"][0, 0] = np.array([9, 9, 9, 9, 9], dtype=np.int32)
    np.testing.assert_array_equal(f["x"][0, 0], 9 * np.ones(5))


def test_fill_value_unwritten_chunks(tmp_path):
    f = zarr.open(tmp_path / "c.zarr", "a")
    ds = f.create_dataset("x", shape=(8, 8), dtype=np.float32, chunks=(4, 4))
    ds[0:4, 0:4] = 1.0
    out = ds[...]
    assert out[:4, :4].sum() == 16
    assert out[4:, 4:].sum() == 0


def test_corrupt_chunk_names_the_file(tmp_path):
    """A corrupt chunk raises an error naming the chunk path, not a bare
    zlib/msgpack internal message."""
    import numpy as np
    import pytest

    from cellulus_tpu.io import zarr

    f = zarr.open(tmp_path / "c.zarr", "a")
    f["x"] = np.arange(100, dtype=np.float32).reshape(10, 10)
    arr_dir = tmp_path / "c.zarr" / "x"
    chunk = next(p for p in arr_dir.iterdir() if not p.name.startswith("."))
    chunk.write_bytes(b"garbage!")
    g = zarr.open(tmp_path / "c.zarr", "r")
    with pytest.raises(RuntimeError, match=str(chunk.name)):
        np.asarray(g["x"][:])


def test_corrupt_checkpoint_names_the_file(tmp_path):
    import pytest

    from cellulus_tpu.utils.checkpoint import load_checkpoint

    p = tmp_path / "bad.ckpt"
    p.write_bytes(b"\x82\xa4iter")
    with pytest.raises(ValueError, match="bad.ckpt"):
        load_checkpoint(p)
