"""cellulus-tpu: TPU-native unsupervised cell instance segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
funkelab/cellulus (ICCV 2023, arXiv:2310.08501): a mini U-Net predicts
per-pixel object-centric offset embeddings trained with a self-supervised
pairwise loss; inference is a streaming zarr pipeline
predict -> detect -> segment -> evaluate.

Public surface (reference parity, cleanly exported at top level — see
SURVEY.md §3.5):

    import cellulus_tpu
    cellulus_tpu.train(experiment_config)
    cellulus_tpu.infer(experiment_config)
"""

import importlib
import sys

__version__ = "0.1.0"


def _train(experiment_config):
    mod = importlib.import_module(".train", __name__)
    # importing the submodule rebinds the package attribute `train` from
    # this wrapper to the module object (the reference has this exact trap,
    # SURVEY.md §3.5); restore the callable so repeated
    # `cellulus_tpu.train(...)` calls keep working
    sys.modules[__name__].train = _train
    return mod.train(experiment_config)


def _infer(experiment_config):
    mod = importlib.import_module(".infer", __name__)
    sys.modules[__name__].infer = _infer
    return mod.infer(experiment_config)


train = _train
infer = _infer

__all__ = ["train", "infer", "__version__"]
