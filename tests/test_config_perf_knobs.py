"""Config-promoted perf knobs (TOML-settable, env vars remain overrides).

The device-detect, Pallas-mean-shift and pipeline-RAM knobs started as env
vars; on directly-attached TPUs they are deployment decisions and belong in
the (otherwise TOML-complete) config surface. Resolution order for each:
explicit config field > env var > built-in default.
"""

import numpy as np
import pytest

from cellulus_tpu.configs import InferenceConfig
from cellulus_tpu.detect import detect_sample, want_device_detect
from test_detect_variants import _synthetic_embeddings


def test_device_detect_resolution_order(monkeypatch):
    monkeypatch.delenv("CELLULUS_TPU_DEVICE_DETECT", raising=False)
    assert want_device_detect(InferenceConfig()) is False
    assert want_device_detect(InferenceConfig(device_detect=True)) is True
    monkeypatch.setenv("CELLULUS_TPU_DEVICE_DETECT", "1")
    assert want_device_detect(InferenceConfig()) is True
    # explicit config field beats the env var, both ways
    assert want_device_detect(InferenceConfig(device_detect=False)) is False


def test_device_detect_config_field_drives_the_path(monkeypatch):
    """device_detect=True routes detect through the device-resident kernel
    (observed via the kernel entry point), no env var involved — and its
    results still match the host path."""
    import cellulus_tpu.detect as detect_mod

    monkeypatch.delenv("CELLULUS_TPU_DEVICE_DETECT", raising=False)
    calls = []
    real = detect_mod._meanshift_detect_device

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(detect_mod, "_meanshift_detect_device", spy)

    emb = _synthetic_embeddings()
    host = detect_sample(
        emb,
        InferenceConfig(bandwidth=8.0, min_size=0, reduction_probability=1.0),
        2,
        np.random.default_rng(0),
    )
    assert not calls
    dev = detect_sample(
        emb,
        InferenceConfig(
            bandwidth=8.0, min_size=0, reduction_probability=1.0,
            device_detect=True,
        ),
        2,
        np.random.default_rng(0),
    )
    assert calls
    np.testing.assert_allclose(dev[0], host[0], rtol=1e-5)
    np.testing.assert_array_equal(dev[1], host[1])
    np.testing.assert_array_equal(dev[3], host[3])


def test_pallas_mean_shift_plumbs_to_use_pallas(monkeypatch):
    """The pallas_mean_shift field reaches the mean-shift kernel selector,
    overriding the CELLULUS_TPU_PALLAS env var."""
    import cellulus_tpu.detect as detect_mod
    import cellulus_tpu.ops.mean_shift as ms

    requested = []
    real = ms._use_pallas

    def spy(req=None):
        requested.append(req)
        return real(req)

    monkeypatch.setattr(ms, "_use_pallas", spy)
    monkeypatch.setenv("CELLULUS_TPU_PALLAS", "1")

    # config False must override the env var at the selector
    assert ms._use_pallas(False) is False

    emb = _synthetic_embeddings()
    detect_sample(
        emb,
        InferenceConfig(
            bandwidth=8.0, min_size=0, reduction_probability=1.0,
            pallas_mean_shift=False,
        ),
        2,
        np.random.default_rng(0),
    )
    assert detect_mod is not None
    assert False in requested and None not in requested


def test_pipeline_ram_gb_validation():
    assert InferenceConfig(pipeline_ram_gb="2.5").pipeline_ram_gb == 2.5
    with pytest.raises(ValueError, match="pipeline_ram_gb"):
        InferenceConfig(pipeline_ram_gb=0)
    # TOML-style dict construction round-trips the new fields
    ic = InferenceConfig(
        device_detect=1, pallas_mean_shift=0, pipeline_ram_gb=4
    )
    assert ic.device_detect is True
    assert ic.pallas_mean_shift is False
    assert ic.pipeline_ram_gb == 4.0
