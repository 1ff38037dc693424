"""Serving export: the tile predictor as a self-contained StableHLO artifact.

The reference has no deployment story beyond "load the .pth in Python"
(reference ``infer.py:58-64``). For production serving the unit of
deployment here is a ``jax.export`` artifact: the batched-TTA tile
predictor (the entire inference device program — noise batch, U-Net
forward, mean/std reduction) serialized as version-stable StableHLO with
the trained parameters baked in as constants. A serving fleet loads it
with ``jax.export.deserialize`` and runs it on any JAX backend — no model
code, no checkpoint plumbing, no Python-side config.

The artifact's calling convention is fixed and minimal:

    predict(tiles: f32[T, *in_tile, C], keys: u32[T, 2])
        -> f32[T, *out_tile, D+1]

where ``T`` is the tile batch size chosen at export time, ``in_tile``
includes the valid-conv context halo, and ``keys`` are per-tile PRNG keys
for the salt-and-pepper TTA (pass fixed keys for deterministic serving).

A JSON sidecar records the geometry a scheduler needs (tile sizes, context,
channels) without deserializing the program.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence


ARTIFACT_NAME = "predictor.stablehlo"
META_NAME = "predictor.json"


def export_predictor(
    spec,
    params,
    inference_config,
    path,
    tile_batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    normalization_factor: Optional[float] = None,
) -> Path:
    """Serialize the batched-TTA tile predictor for serving.

    Args:
        spec: :class:`~cellulus_tpu.models.UNetSpec`.
        params: trained parameter pytree (baked into the artifact).
        inference_config: provides crop_size / num_infer_iterations /
            p_salt_pepper / precision — the full TTA recipe.
        path: output directory (created); receives ``predictor.stablehlo``
            and ``predictor.json``.
        tile_batch_size: tiles per call (default: config's
            ``tile_batch_size``).
        platforms: lowering platforms (e.g. ``("tpu", "cpu")``); defaults
            to the current backend. Cross-platform export lets a CPU host
            build TPU serving artifacts.
        normalization_factor: the scale the pipeline multiplies raw
            intensities by BEFORE the device program (predict.py applies
            it host-side). Recorded in the sidecar so a serving fleet can
            reproduce the preprocessing;
            :func:`export_from_experiment` resolves it from the config or
            the dataset dtype automatically.

    Returns:
        The artifact directory path.
    """
    import jax
    import jax.numpy as jnp

    from .models import compute_geometry, tta_embeddings

    ic = inference_config
    crop_size = tuple(ic.crop_size)
    geometry = compute_geometry(crop_size, spec.downsampling_factors)
    out_tile = geometry.output_size
    in_tile = tuple(o + 2 * c for o, c in zip(out_tile, geometry.context))
    if tile_batch_size is not None and int(tile_batch_size) < 1:
        raise ValueError(f"tile_batch_size must be >= 1, got {tile_batch_size}")
    T = int(
        tile_batch_size if tile_batch_size is not None else ic.tile_batch_size
    )
    compute_dtype = (
        jnp.bfloat16 if getattr(ic, "precision", "float32") == "bfloat16"
        else jnp.float32
    )

    def predict(tiles, keys):
        def one(tile, key):
            return tta_embeddings(
                spec,
                params,
                tile,
                key,
                float(ic.p_salt_pepper),
                int(ic.num_infer_iterations),
                compute_dtype,
            )

        return jax.vmap(one)(tiles, keys)

    tiles_spec = jax.ShapeDtypeStruct(
        (T, *in_tile, spec.in_channels), jnp.float32
    )
    keys_spec = jax.ShapeDtypeStruct((T, 2), jnp.uint32)
    exported = jax.export.export(
        jax.jit(predict),
        platforms=tuple(platforms) if platforms else None,
    )(tiles_spec, keys_spec)

    out_dir = Path(path)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / ARTIFACT_NAME).write_bytes(exported.serialize())
    meta = {
        "format": "jax.export/stablehlo",
        "calling_convention": "predict(tiles f32[T,*in,C], keys u32[T,2]) -> f32[T,*out,D+1]",
        "tile_batch_size": T,
        "in_tile": list(in_tile),
        "out_tile": list(out_tile),
        "context": list(geometry.context),
        "in_channels": spec.in_channels,
        "out_channels": spec.out_channels + 1,
        "num_spatial_dims": spec.num_spatial_dims,
        "num_infer_iterations": int(ic.num_infer_iterations),
        "p_salt_pepper": float(ic.p_salt_pepper),
        "platforms": list(exported.platforms),
        # tiles fed to predict() must be raw intensities times this factor
        # (null = caller must normalize to the training scale themselves)
        "normalization_factor": (
            float(normalization_factor)
            if normalization_factor is not None
            else None
        ),
    }
    (out_dir / META_NAME).write_text(json.dumps(meta, indent=2))
    return out_dir


def load_predictor(path):
    """Load a serving artifact. Returns ``(predict_fn, meta_dict)``; the
    function maps ``(tiles f32[T,*in,C], keys u32[T,2])`` to embeddings."""
    import jax

    art_dir = Path(path)
    exported = jax.export.deserialize(
        (art_dir / ARTIFACT_NAME).read_bytes()
    )
    meta = json.loads((art_dir / META_NAME).read_text())

    def predict(tiles, keys):
        return exported.call(tiles, keys)

    return predict, meta


def export_from_experiment(experiment_config, path, **kwargs) -> Path:
    """Export straight from a TOML-level config: builds the spec, loads the
    checkpoint named by ``model_config.checkpoint``, and serializes. The
    normalization factor is resolved like the live pipeline does
    (config value, else derived from the dataset dtype) and recorded in
    the sidecar."""
    from .datasets import normalization_factor_for
    from .io import DatasetMetaData, zarr
    from .models import spec_from_config
    from .utils.checkpoint import load_checkpoint

    dataset_config = experiment_config.inference_config.dataset_config
    meta = DatasetMetaData.from_dataset_config(dataset_config)
    if "normalization_factor" not in kwargs:
        nf = experiment_config.normalization_factor
        if nf is None:
            raw_ds = zarr.open(dataset_config.container_path, "r")[
                dataset_config.dataset_name
            ]
            nf = normalization_factor_for(raw_ds.dtype)
        kwargs["normalization_factor"] = nf
    spec = spec_from_config(
        experiment_config.model_config,
        in_channels=meta.num_channels,
        num_spatial_dims=meta.num_spatial_dims,
    )
    ckpt = experiment_config.model_config.checkpoint
    if ckpt is None:
        raise ValueError("model_config.checkpoint must name a trained model")
    state = load_checkpoint(ckpt)
    from .train import coerce_params_like
    from .models import init_params
    import jax

    template = init_params(jax.random.PRNGKey(0), spec)
    params = coerce_params_like(state["params"], template)
    return export_predictor(
        spec, params, experiment_config.inference_config, path, **kwargs
    )
