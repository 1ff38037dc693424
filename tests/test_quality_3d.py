"""3D end-to-end quality gate (opt-in: full training run).

Runs the validated 3D recipe — anisotropic U-Net, pair_count_mode
"all_dims", density 0.05 (~124k pairs/crop) — and asserts segmentation
quality. Takes ~15 min on a v5e chip (hours on CPU), so it only runs with
CELLULUS_TPU_SLOW_TESTS=1; the recorded result is in docs/validation.md
(F1 1.000 / SEG 0.693 at 2500 iterations, both synthetic samples).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.skipif(
    not os.environ.get("CELLULUS_TPU_SLOW_TESTS"),
    reason="full 3D training run; set CELLULUS_TPU_SLOW_TESTS=1 (TPU advised)",
)
def test_3d_quality_all_dims(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "validate_quality.py"),
            "--ndim", "3",
            "--iters", "2500",
            "--pair-count-mode", "all_dims",
            "--workdir", str(tmp_path / "q3d"),
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("F1=")][-1]
    f1 = float(line.split()[0].split("=")[1])
    seg = float(line.split()[1].split("=")[1])
    assert f1 >= 0.85, line
    assert seg >= 0.6, line
