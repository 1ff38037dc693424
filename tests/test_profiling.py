"""Profiling utilities tests."""

import time

from cellulus_tpu.utils.profiling import perf_report, reset_perf, stage_timer


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


def test_stage_timer_propagates_exceptions():
    reset_perf()
    try:
        with stage_timer("boom"):
            raise ValueError("x")
    except ValueError:
        pass
    assert "boom" in perf_report()
