"""Blosc / lz4 / zstd codec support in the zarr store.

zarr-python's default compressor is numcodecs ``Blosc(cname="lz4",
clevel=5, shuffle=SHUFFLE)`` — reference-prepared containers (reference
``docs/examples/2d/01-data.py:47-56``) store blosc frames, so reading
them is an interop requirement. The binding goes through the system
libblosc (the same C library numcodecs wraps), so a roundtrip here is a
roundtrip against the canonical implementation, not a self-consistency
check.
"""

import json

import numpy as np
import pytest

from cellulus_tpu.io import codecs, zarr

pytestmark = pytest.mark.skipif(
    not codecs.blosc_available(), reason="system libblosc not present"
)


def _payloads():
    rng = np.random.default_rng(0)
    return [
        rng.normal(size=(32, 17)).astype(np.float32),
        (rng.integers(0, 255, size=(64, 8))).astype(np.uint8),
        (rng.integers(0, 2**16, size=(7, 33))).astype(np.uint16),
        np.zeros((16, 16), dtype=np.int64),
    ]


def test_blosc_frame_roundtrip_all_shuffles():
    for arr in _payloads():
        raw = arr.tobytes()
        for shuffle in (codecs.NOSHUFFLE, codecs.SHUFFLE, codecs.BITSHUFFLE,
                        codecs.AUTOSHUFFLE):
            frame = codecs.blosc_compress(
                raw, typesize=arr.dtype.itemsize, shuffle=shuffle
            )
            # a real blosc v1 frame: version byte first, sizes in header
            assert frame[0] in (1, 2)
            assert codecs.blosc_decompress(frame, expected_nbytes=len(raw)) == raw


def test_blosc_inner_codecs():
    arr = _payloads()[0]
    raw = arr.tobytes()
    for cname in codecs.blosc_list_compressors():
        frame = codecs.blosc_compress(raw, typesize=4, cname=cname)
        assert codecs.blosc_decompress(frame) == raw


def test_blosc_rejects_garbage_and_wrong_size():
    raw = _payloads()[0].tobytes()
    frame = codecs.blosc_compress(raw, typesize=4)
    with pytest.raises(ValueError):
        codecs.blosc_decompress(b"\x00" * 8)  # truncated
    with pytest.raises(ValueError):
        codecs.blosc_decompress(frame, expected_nbytes=len(raw) + 4)


def test_lz4_and_zstd_numcodecs_formats():
    raw = _payloads()[0].tobytes()
    enc = codecs.lz4_compress(raw)
    # numcodecs LZ4 framing: little-endian uint32 original size first
    assert int.from_bytes(enc[:4], "little") == len(raw)
    assert codecs.lz4_decompress(enc) == raw
    pytest.importorskip("zstandard")
    enc = codecs.zstd_compress(raw, level=3)
    assert codecs.zstd_decompress(enc, expected_nbytes=len(raw)) == raw


def test_zstd_libzstd_fallback(monkeypatch):
    # simulate a host without the zstandard package: the ctypes libzstd
    # binding must still roundtrip (and interoperate with package-written
    # frames in both directions)
    import sys

    raw = _payloads()[0].tobytes()
    try:
        import zstandard  # noqa: F401

        pkg_frame = codecs.zstd_compress(raw, level=3)
    except ImportError:
        pkg_frame = None
    monkeypatch.setitem(sys.modules, "zstandard", None)  # import -> ImportError
    if codecs._get_zstd() is None:
        pytest.skip("no system libzstd")
    enc = codecs.zstd_compress(raw, level=3)
    assert codecs.zstd_decompress(enc, expected_nbytes=len(raw)) == raw
    if pkg_frame is not None:
        assert codecs.zstd_decompress(pkg_frame, expected_nbytes=len(raw)) == raw
    monkeypatch.undo()
    if pkg_frame is not None:
        import zstandard

        assert zstandard.ZstdDecompressor().decompress(enc) == raw


def test_lz4_rejects_oversized_header():
    raw = _payloads()[0].tobytes()
    enc = codecs.lz4_compress(raw)
    bogus = (2**31).to_bytes(4, "little") + enc[4:]
    with pytest.raises(ValueError):
        codecs.lz4_decompress(bogus, expected_nbytes=len(raw))


def test_array_roundtrip_every_codec(tmp_path):
    data = _payloads()[0]
    configs = [
        {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
        {"id": "blosc", "cname": "blosclz", "clevel": 9, "shuffle": 2},
        {"id": "blosc", "cname": "zstd", "clevel": 1, "shuffle": 0},
        {"id": "lz4", "acceleration": 1},
        {"id": "zstd", "level": 1},
    ]
    for comp in configs:
        name = f"{comp['id']}_{comp.get('cname', '')}"
        f = zarr.open(tmp_path / f"{name}.zarr", "a")
        ds = f.create_dataset(
            "x", shape=data.shape, dtype=data.dtype, chunks=(16, 16),
            compressor=comp,
        )
        ds[...] = data
        np.testing.assert_array_equal(zarr.open(tmp_path / f"{name}.zarr")["x"][...], data)


def test_default_compressor_is_blosc_lz4(tmp_path):
    # with libblosc present, new arrays default to zarr-python's own
    # default codec, so they open in vanilla zarr installs with no config
    f = zarr.open(tmp_path / "d.zarr", "a")
    ds = f.create_dataset("x", shape=(8, 8), dtype=np.float32)
    ds[...] = np.arange(64, dtype=np.float32).reshape(8, 8)
    meta = json.loads((tmp_path / "d.zarr" / "x" / ".zarray").read_text())
    assert meta["compressor"]["id"] == "blosc"
    assert meta["compressor"]["cname"] == "lz4"
    np.testing.assert_array_equal(
        ds[...], np.arange(64, dtype=np.float32).reshape(8, 8)
    )


def test_corrupt_blosc_chunk_raises_corrupt_chunk_error(tmp_path):
    f = zarr.open(tmp_path / "c.zarr", "a")
    ds = f.create_dataset(
        "x", shape=(8, 8), dtype=np.float32, chunks=(8, 8),
        compressor={"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1},
    )
    ds[...] = np.ones((8, 8), dtype=np.float32)
    chunk = tmp_path / "c.zarr" / "x" / "0.0"
    chunk.write_bytes(chunk.read_bytes()[: codecs._BLOSC_MAX_OVERHEAD - 2])
    fresh = zarr.open(tmp_path / "c.zarr")["x"]
    with pytest.raises(zarr.CorruptChunkError):
        fresh[...]
