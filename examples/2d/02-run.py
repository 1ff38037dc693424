"""Train + infer the 2D demo end-to-end.

Run ``01-data.py`` first. Training takes ~5000 iterations (minutes on a TPU
chip); pass ``--quick`` for a 200-iteration smoke run.
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
        train_config.train_config.max_iterations = 200
    cellulus_tpu.train(train_config)

    # copy ground truth next to the outputs for the evaluate stage
    src = zarr.open("data_2d.zarr", "r")
    out = zarr.open("out_2d.zarr", "a")
    gt = np.asarray(src["groundtruth"][...])
    out["groundtruth"] = gt
    out["groundtruth"].attrs.update(src["groundtruth"].attrs.asdict())

    infer_config = ExperimentConfig.from_toml("infer.toml")
    results = cellulus_tpu.infer(infer_config)
    print("evaluation:", results)


if __name__ == "__main__":
    main()
