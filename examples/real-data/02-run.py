"""Train + infer on the real (or fallback-synthetic) dataset from 01-data.py.

Usage: python 02-run.py [--quick]
"""

import os
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
os.chdir(HERE)
sys.path.insert(0, str(HERE.parents[1]))

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig


def main():
    train_config = ExperimentConfig.from_toml("train.toml")
    if "--quick" in sys.argv:
        train_config.train_config.max_iterations = 200
        train_config.model_config.num_fmaps = 32
    cellulus_tpu.train(train_config)

    infer_config = ExperimentConfig.from_toml("infer.toml")
    if "--quick" in sys.argv:
        infer_config.model_config.num_fmaps = 32
    cellulus_tpu.infer(infer_config)
    print("outputs in out_hela.zarr (embeddings/detection/segmentation)")


if __name__ == "__main__":
    main()
