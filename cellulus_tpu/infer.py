"""Inference orchestrator (reference parity: ``cellulus/infer.py:16-80``).

Derives method defaults from ``object_size`` (bandwidth, min instance size),
loads the checkpoint, and runs whichever of predict / detect / segment /
evaluate stages have dataset configs present.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .configs import ExperimentConfig
from .detect import detect
from .evaluate import evaluate
from .io import DatasetMetaData
from .models import init_params, spec_from_config
from .predict import predict
from .segment import segment
from .train import coerce_params_like
from .utils.checkpoint import load_checkpoint


def infer(experiment_config: ExperimentConfig):
    import cellulus_tpu

    cellulus_tpu.enable_compilation_cache()
    print(experiment_config)

    inference_config = experiment_config.inference_config
    normalization_factor = experiment_config.normalization_factor
    model_config = experiment_config.model_config

    meta = DatasetMetaData.from_dataset_config(inference_config.dataset_config)

    if inference_config.bandwidth is None:
        inference_config.bandwidth = 0.5 * experiment_config.object_size
    if inference_config.min_size is None:
        if meta.num_spatial_dims == 2:
            inference_config.min_size = int(
                0.1 * np.pi * (experiment_config.object_size**2) / 4
            )
        else:
            inference_config.min_size = int(
                0.1 * 4.0 / 3.0 * np.pi * (experiment_config.object_size**3) / 8
            )

    spec = spec_from_config(
        model_config,
        in_channels=meta.num_channels,
        num_spatial_dims=meta.num_spatial_dims,
    )
    compute_dtype = (
        jnp.bfloat16
        if getattr(inference_config, "precision", "float32") == "bfloat16"
        else jnp.float32
    )

    params = init_params(jax.random.PRNGKey(0), spec)
    if model_config.checkpoint is None or not os.path.exists(model_config.checkpoint):
        raise FileNotFoundError(
            f"Model weights do not exist at this location: "
            f"{model_config.checkpoint}!"
        )
    state = load_checkpoint(model_config.checkpoint)
    params = coerce_params_like(state["params"], params)

    from .utils.profiling import maybe_trace, stage_timer

    results = None
    pipelined = (
        getattr(inference_config, "pipelined", False)
        and inference_config.prediction_dataset_config is not None
        and inference_config.detection_dataset_config is not None
        and inference_config.segmentation_dataset_config is not None
    )
    if pipelined:
        from .pipeline import infer_pipelined

        with maybe_trace():
            with stage_timer(
                "predict+detect+segment (pipelined)",
                items=meta.num_samples,
                unit="samples",
            ):
                infer_pipelined(
                    spec, params, inference_config, normalization_factor,
                    compute_dtype,
                )
            if inference_config.evaluation_dataset_config is not None:
                with stage_timer(
                    "evaluate", items=meta.num_samples, unit="samples"
                ):
                    results = evaluate(inference_config)
        return results

    with maybe_trace():
        if inference_config.prediction_dataset_config is not None:
            with stage_timer("predict", items=meta.num_samples, unit="samples"):
                predict(
                    spec, params, inference_config, normalization_factor,
                    compute_dtype,
                )
        if inference_config.detection_dataset_config is not None:
            with stage_timer("detect", items=meta.num_samples, unit="samples"):
                detect(inference_config)
        if inference_config.segmentation_dataset_config is not None:
            with stage_timer("segment", items=meta.num_samples, unit="samples"):
                segment(inference_config)
        if inference_config.evaluation_dataset_config is not None:
            with stage_timer("evaluate", items=meta.num_samples, unit="samples"):
                results = evaluate(inference_config)
    return results


# Callable module: keeps `cellulus_tpu.infer(config)` working even after an
# `import cellulus_tpu.infer` shadows the package-level wrapper (SURVEY.md
# §3.5).
import sys as _sys  # noqa: E402


class _CallableModule(type(_sys.modules[__name__])):
    def __call__(self, experiment_config):
        return infer(experiment_config)


_sys.modules[__name__].__class__ = _CallableModule
