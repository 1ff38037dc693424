"""Consolidate TissueNet study results into one markdown table.

Reads every ``examples/real-data/tissuenet_*/detect_sweep.json`` (the
re-clustering sweeps over saved embeddings) and prints, per workdir, the
mean panel F1/SEG of the reference-default recipe and of the best sweep
variant, next to the paper's printed per-tissue mean
(scripts/extract_real_tissuenet.py PAPER_F1). Run after
``run_real_tissuenet.py`` + ``sweep_detect_tissuenet.py``; paste the table
into docs/validation.md.

Usage: python scripts/tissuenet_report.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from extract_real_tissuenet import PAPER_F1  # noqa: E402


def main() -> None:
    rows = []
    for work in sorted((REPO / "examples" / "real-data").glob("tissuenet_*")):
        sweep_path = work / "detect_sweep.json"
        if not sweep_path.exists():
            continue
        sweep = json.loads(sweep_path.read_text())
        if "baseline" not in sweep:
            continue
        # tissue & paper yardstick from the workdir name
        name = work.name.removeprefix("tissuenet_")
        tissue = name.split("_")[0]
        if tissue == "all":
            paper = float(np.mean([v for t in PAPER_F1 for v in PAPER_F1[t]]))
        elif tissue in PAPER_F1:
            paper = float(np.mean(PAPER_F1[tissue]))
        else:
            paper = float("nan")

        def best_of(entry):
            seg = entry["segmentation"]
            k = max(range(len(seg)), key=lambda i: seg[i]["mean_F1"])
            return seg[k]["mean_F1"], seg[k]["mean_SEG"]

        base_f1, base_seg = best_of(sweep["baseline"])
        best_name, best_entry = max(
            sweep.items(), key=lambda kv: best_of(kv[1])[0]
        )
        best_f1, best_seg = best_of(best_entry)
        rows.append(
            (work.name, paper, base_f1, base_seg, best_name, best_f1, best_seg)
        )

    print("| workdir | paper mean F1 | default seg F1 / SEG | "
          "best variant | best seg F1 / SEG |")
    print("|---|---|---|---|---|")
    for (name, paper, bf1, bseg, vname, vf1, vseg) in rows:
        print(f"| {name} | {paper:.3f} | {bf1:.3f} / {bseg:.3f} "
              f"| `{vname}` | **{vf1:.3f}** / {vseg:.3f} |")


if __name__ == "__main__":
    main()
