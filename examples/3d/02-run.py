"""Train + infer the 3D demo end-to-end.

Run ``01-data.py`` first. Mirrors the reference's 3D example workflow
(reference ``docs/examples/3d``) on synthetic spherical blobs; pass
``--quick`` for a 300-iteration smoke run.

The train config uses ``pair_count_mode = "all_dims"``: the reference's pair
count formula only uses the first two spatial dims (reference
``datasets/zarr_dataset.py:244-248``), which starves 3D crops of training
pairs — all_dims restores the intended pair density (see
docs/validation.md for the measured 3D quality difference).
"""

import os
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
os.chdir(HERE)
# make the demo runnable from a source checkout without installation
sys.path.append(str(HERE.parents[1]))

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig
from cellulus_tpu.io import zarr


def main():
    train_config = ExperimentConfig.from_toml("train.toml")
    if "--quick" in sys.argv:
        train_config.train_config.max_iterations = 300
    cellulus_tpu.train(train_config)

    # copy ground truth next to the outputs for the evaluate stage
    src = zarr.open("data_3d.zarr", "r")
    out = zarr.open("out_3d.zarr", "a")
    gt = np.asarray(src["groundtruth"][...])
    out["groundtruth"] = gt
    out["groundtruth"].attrs.update(src["groundtruth"].attrs.asdict())

    infer_config = ExperimentConfig.from_toml("infer.toml")
    results = cellulus_tpu.infer(infer_config)
    print("evaluation:", results)


if __name__ == "__main__":
    main()
