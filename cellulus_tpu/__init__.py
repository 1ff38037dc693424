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
import os
import sys

__version__ = "0.1.0"


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first compiles of the U-Net /
    mean-shift kernels take tens of seconds on TPU; caching them on disk
    makes every later process start warm. Called by the train/infer entry
    points on TPU platforms only (CPU AOT results are machine-feature
    sensitive and can SIGILL when reloaded). Opt out with
    CELLULUS_TPU_NO_COMPILE_CACHE=1."""
    from .utils.env import env_flag

    if env_flag("CELLULUS_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.default_backend() == "cpu":
            return
        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(
                    os.path.expanduser("~"), ".cache", "cellulus_tpu", "jax"
                ),
            )
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


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
