"""Per-stage + detect-sub-phase profile of the 3D inference path at bench
scale (VERDICT r4 item 3: 3D detect dominates e2e and had no study like
the 2D one in profile_infer.py).

Mirrors bench.py's bench_3d protocol exactly (24 fmaps, factor 3,
downsampling [[1,2,2]], crop [40,76,76], 128^3 x 2 samples, brief
training so detect sees organized embeddings), then:

  1. per-stage wall times over `repeat` rounds (predict/detect/segment
     via the real detect_sample host path), and
  2. a fine-grained detect breakdown per sample: zarr-shaped host prep
     (otsu, mean-centering, coordinate grid, fg gather), bin_seeds,
     device fit+predict (blocked), label scatter.

Usage: python scripts/profile_infer_3d.py [repeat]
Env: BENCH_SIZE_3D / BENCH_SAMPLES_3D / BENCH_TRAIN_ITERS_3D as bench.py.
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

SIZE3 = int(os.environ.get("BENCH_SIZE_3D", "128"))
N3 = int(os.environ.get("BENCH_SAMPLES_3D", "2"))
ITERS3 = int(os.environ.get("BENCH_TRAIN_ITERS_3D", "100"))


def main():
    import jax
    import jax.numpy as jnp

    import cellulus_tpu

    cellulus_tpu.enable_compilation_cache()
    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.datasets import BatchLoader, get_dataset
    from cellulus_tpu.detect import detect_sample, sample_rng
    from cellulus_tpu.io import zarr
    from cellulus_tpu.models import (
        compute_geometry,
        init_params,
        spec_from_config,
    )
    from cellulus_tpu.predict import predict_sample
    from cellulus_tpu.segment import cell_segment_sample
    from cellulus_tpu.train import (
        make_multi_step,
        make_optimizer,
        make_train_step_grid,
    )
    from synthetic import make_blob_container

    work = REPO / ".bench_work"
    work.mkdir(exist_ok=True)
    container = work / "bench_data_3d.zarr"
    if not (container / "train" / ".zarray").exists():
        make_blob_container(container, num_samples=N3, size=SIZE3, ndim=3, seed=9)

    object_size = int(SIZE3 * 0.13)
    config = ExperimentConfig(
        **{
            "experiment_name": "profile3d",
            "object_size": object_size,
            "model_config": {
                "num_fmaps": 24,
                "fmap_inc_factor": 3,
                "downsampling_factors": [[1, 2, 2]],
            },
            "train_config": {
                "batch_size": 2,
                "crop_size": [40, 76, 76],
                "max_iterations": ITERS3,
                "num_workers": 4,
                "elastic_deform": False,
                "precision": "bfloat16",
                "train_data_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
            },
            "inference_config": {
                "crop_size": [40, 76, 76],
                "tile_batch_size": 2,
                "transfer_precision": "float16",
                "dataset_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
            },
        }
    )
    tc, ic = config.train_config, config.inference_config
    ic.bandwidth = 0.5 * object_size
    ic.min_size = int(0.1 * 4.0 / 3.0 * np.pi * (object_size**3) / 8)

    spec = spec_from_config(config.model_config, in_channels=1, num_spatial_dims=3)
    geometry = compute_geometry(tuple(ic.crop_size), spec.downsampling_factors)

    dataset = get_dataset(
        dataset_config=tc.train_data_config,
        crop_size=tuple(tc.crop_size),
        elastic_deform=False,
        control_point_spacing=tc.control_point_spacing,
        control_point_jitter=tc.control_point_jitter,
        density=tc.density,
        kappa=tc.kappa,
        normalization_factor=None,
        output_shape=geometry.output_size,
        seed=0,
        sample_pairs=False,
        normalize=False,
    )
    params = init_params(jax.random.PRNGKey(0), spec)
    optimizer = make_optimizer(1e-4)
    opt_state = optimizer.init(params)
    step_fn = make_train_step_grid(
        spec, optimizer, tc.temperature, tc.regularizer_weight,
        dataset.sampler, tc.batch_size, jnp.bfloat16,
        input_scale=dataset.normalization_factor,
    )
    K = 5
    multi = jax.jit(make_multi_step(step_fn), donate_argnums=(0, 1))
    base_key = jax.random.PRNGKey(11)
    keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(jnp.arange(K))
    print(f"training {ITERS3} iters so embeddings organize...", flush=True)
    with BatchLoader(dataset, tc.batch_size, num_workers=4) as loader:
        it = iter(loader)
        for c in range((ITERS3 + K - 1) // K):
            raw_K = jnp.asarray(
                np.stack([np.moveaxis(next(it)[0], 1, -1) for _ in range(K)])
            )
            params, opt_state, losses, _ = multi(params, opt_state, raw_K, keys)
    np.asarray(losses)

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
        detect_sample, emb0, ic, 3, sample_rng(ic.seed, 0)
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
        for s in range(N3):
            e, dt = t(
                predict_sample, spec, params, raw_all[s], ic, 1.0 / 255,
                sample_seed=s, compute_dtype=jnp.bfloat16,
            )
            embs.append(e)
            times.setdefault("predict", []).append(dt)
        dets = []
        for s in range(N3):
            (_, _, _, det), dt = t(
                detect_sample, embs[s], ic, 3, sample_rng(ic.seed, s)
            )
            dets.append(det[0])
            times.setdefault("detect", []).append(dt)
        for s in range(N3):
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

    # ---- detect sub-phase breakdown (per sample, 2 reps) --------------------
    from cellulus_tpu.detect import mean_center_embeddings
    from cellulus_tpu.ops.mean_shift import (
        _fit_predict_kernel,
        _next_pow2,
        _pad_rows,
        add_coordinate_grid,
        bin_seeds,
    )
    from cellulus_tpu.ops.otsu import threshold_otsu

    for rep in range(2):
        for s in range(N3):
            emb = embs[s]
            sub = {}
            (thr), sub["otsu"] = t(threshold_otsu, emb[-1])
            mask = emb[-1] < thr
            _, sub["center"] = t(mean_center_embeddings, emb, mask)
            absolute, sub["grid"] = t(add_coordinate_grid, emb[:3])
            def gather():
                return absolute.reshape(3, -1).T[mask.ravel()]
            X, sub["gather"] = t(gather)
            rng = sample_rng(ic.seed, s)
            if ic.reduction_probability < 1.0:
                X_fit = X[rng.random(len(X)) < ic.reduction_probability]
                if len(X_fit) == 0:
                    X_fit = X
            else:
                X_fit = X
            seeds, sub["bin_seeds"] = t(bin_seeds, X_fit, ic.bandwidth)
            n = len(X)
            N_pad = _next_pow2(max(len(X_fit), 256))
            S_pad = _next_pow2(max(len(seeds), 64))
            chunk = max(256, min(1 << 18, (1 << 26) // S_pad, N_pad))
            while N_pad % chunk:
                chunk //= 2
            Np_pad = _next_pow2(max(n, 256))
            chunk_p = max(256, min(1 << 18, (1 << 26) // S_pad, Np_pad))
            while Np_pad % chunk_p:
                chunk_p //= 2

            def pad_up():
                return (
                    jnp.asarray(_pad_rows(X_fit.astype(np.float32), N_pad)),
                    jnp.asarray(_pad_rows(np.ones(len(X_fit), bool), N_pad)),
                    jnp.asarray(_pad_rows(seeds.astype(np.float32), S_pad)),
                    jnp.asarray(_pad_rows(np.ones(len(seeds), bool), S_pad)),
                    jnp.asarray(_pad_rows(X.astype(np.float32), Np_pad)),
                )
            (xf, xv, sj, sv, xa), sub["pad"] = t(pad_up)
            jax.block_until_ready((xf, xv, sj, sv, xa))
            sub["upload"] = 0.0  # folded into pad (asarray blocks on copy)

            def kernel():
                out = _fit_predict_kernel(
                    xf, xv, sj, sv, xa, jnp.float32(ic.bandwidth),
                    max_iter=ic.mean_shift_max_iterations,
                    chunk_fit=chunk, chunk_pred=chunk_p,
                )
                return jax.block_until_ready(out)
            labels_u16, sub["kernel"] = t(kernel)
            def download():
                return np.asarray(labels_u16[:n]).astype(np.int32) - 1
            labels, sub["download"] = t(download)

            def scatter():
                spatial = np.full(mask.shape, -1, np.int32)
                spatial[mask] = labels
                return (spatial + 1).astype(np.uint16)
            _, sub["scatter"] = t(scatter)

            # fit/predict split (separately jitted stages; sum exceeds the
            # fused kernel slightly by one dispatch RTT)
            from cellulus_tpu.ops.mean_shift import (
                _fit_kernel,
                _predict_kernel,
                _use_pallas,
            )

            def fit_only():
                out = _fit_kernel(
                    xf, xv, sj, sv, jnp.float32(ic.bandwidth),
                    max_iter=ic.mean_shift_max_iterations, chunk=chunk,
                    use_pallas=_use_pallas(None),
                )
                return jax.block_until_ready(out)
            (centers, valid), sub["fit"] = t(fit_only)
            (centers, valid), sub["fit2"] = t(fit_only)

            def predict_only():
                out = _predict_kernel(
                    xa, centers, valid, jnp.float32(ic.bandwidth),
                    chunk=chunk_p,
                )
                return jax.block_until_ready(out)
            _, sub["predict"] = t(predict_only)
            _, sub["predict2"] = t(predict_only)
            sub["n_centers"] = float(np.asarray(valid).sum())
            total = sum(v for k, v in sub.items()
                        if k not in ("fit", "fit2", "predict", "predict2",
                                     "n_centers"))
            print(
                f"detect breakdown rep{rep} s{s}: fg={mask.sum()} "
                f"fit={len(X_fit)} seeds={len(seeds)} "
                f"S_pad={S_pad} Np_pad={Np_pad} | "
                + " ".join(f"{k}={v:.3f}s" for k, v in sub.items())
                + f" | sum={total:.3f}s", flush=True,
            )


if __name__ == "__main__":
    main()
