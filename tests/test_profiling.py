"""Profiling utilities tests."""

import time

import numpy as np

from cellulus_tpu.utils.profiling import (
    perf_report,
    reset_perf,
    stage_timer,
    time_device,
)


def test_stage_timer_accumulates(capsys):
    reset_perf()
    with stage_timer("stage-a", items=10, unit="tiles"):
        time.sleep(0.01)
    with stage_timer("stage-a", items=5, unit="tiles"):
        pass
    report = perf_report()
    assert report["stage-a"]["items"] == 15
    assert report["stage-a"]["seconds"] >= 0.01
    out = capsys.readouterr().out
    assert "[perf] stage-a" in out
    assert "tiles/s" in out


def test_time_device_off_by_default():
    reset_perf()
    out = time_device("detect.device", lambda a, b: a + b, 1, 2)
    assert out == 3
    assert "detect.device" not in perf_report()


def test_time_device_accumulates_when_enabled(monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setenv("CELLULUS_TPU_DEVICE_TIMERS", "1")
    reset_perf()
    fn = lambda x: jnp.asarray(x) * 2  # noqa: E731
    out1 = time_device("detect.device", fn, np.arange(4.0))
    out2 = time_device("detect.device", fn, np.arange(4.0))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    rep = perf_report()
    assert rep["detect.device"]["items"] == 2
    assert rep["detect.device"]["seconds"] > 0
    reset_perf()


def test_pipeline_device_timers_cover_stages(
    blob_container_2d, tmp_path, monkeypatch
):
    """The e2e stages populate {predict,detect,segment}.device sums —
    the exact keys bench.py's _device_floor_rep reads — and the timed
    run produces identical outputs to the untimed one (passthrough)."""
    import cellulus_tpu
    from cellulus_tpu.io import zarr
    from tests.test_pipeline import _experiment

    monkeypatch.chdir(tmp_path)
    out = tmp_path / "out.zarr"
    config = _experiment(blob_container_2d, out)
    cellulus_tpu.train(config)
    config.model_config.checkpoint = tmp_path / "models" / "best_loss.ckpt"

    monkeypatch.setenv("CELLULUS_TPU_DEVICE_TIMERS", "1")
    reset_perf()
    cellulus_tpu.infer(config)
    rep = perf_report()
    for stage in ("predict", "detect", "segment"):
        key = f"{stage}.device"
        assert key in rep, f"missing {key} in {sorted(rep)}"
        assert rep[key]["seconds"] > 0
    seg_timed = np.asarray(zarr.open(out, "r")["segmentation"][:])

    monkeypatch.delenv("CELLULUS_TPU_DEVICE_TIMERS")
    reset_perf()
    import shutil

    shutil.rmtree(out)
    cellulus_tpu.infer(config)
    assert "predict.device" not in perf_report()
    seg_plain = np.asarray(zarr.open(out, "r")["segmentation"][:])
    np.testing.assert_array_equal(seg_timed, seg_plain)


def test_stage_timer_propagates_exceptions():
    reset_perf()
    try:
        with stage_timer("boom"):
            raise ValueError("x")
    except ValueError:
        pass
    assert "boom" in perf_report()
