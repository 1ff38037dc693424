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

__version__ = "0.1.0"


def train(experiment_config):
    import importlib
    import sys

    mod = importlib.import_module(".train", __name__)
    # importing the submodule rebinds the package attribute `train` to the
    # module object (the reference has this exact trap, SURVEY.md §3.5);
    # restore the callable so repeated `cellulus_tpu.train(...)` works
    sys.modules[__name__].train = train
    return mod.train(experiment_config)


def infer(experiment_config):
    import importlib
    import sys

    mod = importlib.import_module(".infer", __name__)
    sys.modules[__name__].infer = infer
    return mod.infer(experiment_config)


__all__ = ["train", "infer", "__version__"]
