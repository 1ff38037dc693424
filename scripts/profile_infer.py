"""Per-stage wall-time profile of the inference path at bench scale.

Runs on the default backend (the tunneled TPU under axon). Reuses the bench
data + a freshly initialized (untrained) model unless PROFILE_TRAINED=1, so
it's fast to iterate; stage timings are what matters, not mask quality.

Usage: python scripts/profile_infer.py [repeat]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

SIZE = int(os.environ.get("BENCH_SIZE", "944"))
NUM_SAMPLES = int(os.environ.get("BENCH_SAMPLES", "2"))
NUM_FMAPS = int(os.environ.get("BENCH_NUM_FMAPS", "64"))


def main():
    import jax
    import jax.numpy as jnp

    import cellulus_tpu

    cellulus_tpu.enable_compilation_cache()
    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.detect import detect_sample, sample_rng
    from cellulus_tpu.io import zarr
    from cellulus_tpu.models import init_params, spec_from_config
    from cellulus_tpu.predict import predict_sample
    from cellulus_tpu.segment import cell_segment_sample
    from synthetic import make_blob_container

    work = REPO / ".bench_work"
    work.mkdir(exist_ok=True)
    container = work / "bench_data.zarr"
    if not (container / "train" / ".zarray").exists():
        make_blob_container(
            container, num_samples=NUM_SAMPLES, size=SIZE, ndim=2, seed=5
        )

    config = ExperimentConfig(
        **{
            "experiment_name": "profile",
            "object_size": int(SIZE * 0.13),
            "model_config": {
                "num_fmaps": NUM_FMAPS,
                "fmap_inc_factor": 3,
                "features_in_last_layer": 64,
            },
            "inference_config": {
                "crop_size": [252, 252],
                "num_infer_iterations": 16,
                "p_salt_pepper": 0.01,
                "reduction_probability": 0.1,
                "tile_batch_size": 4,
                "transfer_precision": "float16",
            },
        }
    )
    ic = config.inference_config
    ic.bandwidth = 0.5 * config.object_size
    ic.min_size = int(0.1 * np.pi * config.object_size**2 / 4)

    spec = spec_from_config(config.model_config, in_channels=1, num_spatial_dims=2)
    params = init_params(jax.random.PRNGKey(0), spec)

    raw_all = np.asarray(zarr.open(container, "r")["train"][...], np.float32)

    def t(fn, *a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        return out, time.perf_counter() - t0

    # warm all kernels
    emb0, t_warm_pred = t(
        predict_sample, spec, params, raw_all[0], ic, 1.0 / 255,
        sample_seed=0, compute_dtype=jnp.bfloat16,
    )
    (_, _, _, det0), t_warm_det = t(
        detect_sample, emb0, ic, 2, sample_rng(ic.seed, 0)
    )
    _, t_warm_seg = t(
        cell_segment_sample, det0[0], ic.grow_distance, ic.shrink_distance,
        ic.min_size,
    )
    print(
        f"warm (compile+run): predict {t_warm_pred:.2f}s detect "
        f"{t_warm_det:.2f}s segment {t_warm_seg:.2f}s", flush=True,
    )

    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for r in range(repeat):
        times = {}
        embs = []
        for s in range(NUM_SAMPLES):
            e, dt = t(
                predict_sample, spec, params, raw_all[s], ic, 1.0 / 255,
                sample_seed=s, compute_dtype=jnp.bfloat16,
            )
            embs.append(e)
            times.setdefault("predict", []).append(dt)
        dets = []
        for s in range(NUM_SAMPLES):
            (_, _, _, det), dt = t(
                detect_sample, embs[s], ic, 2, sample_rng(ic.seed, s)
            )
            dets.append(det[0])
            times.setdefault("detect", []).append(dt)
        for s in range(NUM_SAMPLES):
            _, dt = t(
                cell_segment_sample, dets[s], ic.grow_distance,
                ic.shrink_distance, ic.min_size,
            )
            times.setdefault("segment", []).append(dt)
        line = " ".join(
            f"{k}={sum(v):.3f}s({'+'.join(f'{x:.2f}' for x in v)})"
            for k, v in times.items()
        )
        print(f"round {r}: {line}", flush=True)

    # detect sub-phase breakdown for one sample
    from cellulus_tpu.ops.mean_shift import (
        add_coordinate_grid,
        mean_shift_fit_predict,
    )
    from cellulus_tpu.ops.otsu import threshold_otsu

    emb = embs[0]
    t0 = time.perf_counter(); thr = threshold_otsu(emb[-1]); t_otsu = time.perf_counter() - t0
    mask = emb[-1] < thr
    t0 = time.perf_counter()
    absolute = add_coordinate_grid(emb[:2])
    X = absolute.reshape(2, -1).T[mask.ravel()]
    t_prep = time.perf_counter() - t0
    rng = sample_rng(ic.seed, 0)
    t0 = time.perf_counter()
    labels = mean_shift_fit_predict(
        X, bandwidth=ic.bandwidth, seeds=None,
        reduction_probability=ic.reduction_probability, rng=rng,
    )
    t_ms = time.perf_counter() - t0
    t0 = time.perf_counter()
    spatial = np.full(mask.shape, -1, np.int32)
    spatial[mask] = labels
    t_scatter = time.perf_counter() - t0
    print(
        f"detect breakdown: otsu={t_otsu:.3f}s prep={t_prep:.3f}s "
        f"meanshift(n={len(X)})={t_ms:.3f}s scatter={t_scatter:.3f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
