"""End-to-end inference throughput benchmark.

Measures 2D tiles/sec through the full inference path — TTA embedding
prediction + mean-shift clustering + segmentation post-processing, both
staged (per-stage breakdown) and pipelined end-to-end including zarr I/O
(the headline number) — on
synthetic blob data with the paper-recipe flagship model (64 fmaps, inc
factor 3, one 2x level, 252^2 tiles; BASELINE.md "paper training recipe").
The model is trained briefly on-device first so the foreground masks and
cluster structure the detect stage sees are realistic.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is measured against a PyTorch re-implementation of the
reference's inference hot path executed on this host's CPU (the reference's
own GPU environment is not available here): serial 2x16 TTA forwards with
per-pass host transfers (reference models/unet.py:73-100) + sklearn
MeanShift fit/predict (reference utils/mean_shift.py:60-76) + scipy
segmentation, on identical data. The baseline number is cached in
``.bench_baseline.json`` (per-host) after first measurement.

Env knobs: BENCH_TRAIN_ITERS (default 300), BENCH_SAMPLES (default 4),
BENCH_SIZE (default 944), BENCH_SKIP_BASELINE=1 to report vs_baseline from
cache only.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import deque
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

TRAIN_ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "300"))
NUM_SAMPLES = int(os.environ.get("BENCH_SAMPLES", "4"))
SIZE = int(os.environ.get("BENCH_SIZE", "944"))  # 4x4 output tiles of 236^2
NUM_FMAPS = int(os.environ.get("BENCH_NUM_FMAPS", "64"))
BASELINE_CACHE = REPO / ".bench_baseline.json"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def fence(x) -> float:
    """End a timed region with a REAL d2h fetch.

    ``jax.block_until_ready`` does not reliably block over the axon tunnel
    (NOTES.md measurement rule: a 20-iteration scan "completed" in 0.1 ms
    wall under it); only an actual host fetch of the final output is a
    trustworthy fence. Returns the last element as a float so callers can
    reuse the fetched value."""
    return float(np.asarray(x).ravel()[-1])


def _device_floor_rep(run_stages, out_container, n_tiles: int, tag: str):
    """One extra (untimed-for-headline) staged rep with per-stage device
    timers on: every jitted stage dispatch is individually fenced and its
    dispatch-to-completion time accumulated (utils/profiling.time_device).
    The sums are a transfer-independent device-time e2e floor — the wall
    numbers above ride the tunnel's >2x d2h jitter; these don't."""
    import shutil

    from cellulus_tpu.utils import profiling

    os.environ["CELLULUS_TPU_DEVICE_TIMERS"] = "1"
    profiling.reset_perf()
    try:
        if out_container.exists():
            shutil.rmtree(out_container)
        run_stages()
        rep = profiling.perf_report()
    finally:
        os.environ.pop("CELLULUS_TPU_DEVICE_TIMERS", None)
        profiling.reset_perf()
    sums = {
        stage: round(rep.get(f"{stage}.device", {}).get("seconds", 0.0), 3)
        for stage in ("predict", "detect", "segment")
    }
    total_dev = sum(sums.values())
    floor_tps = n_tiles / total_dev if total_dev > 0 else None
    log(
        f"{tag} device-time floor: predict {sums['predict']:.2f}s + detect "
        f"{sums['detect']:.2f}s + segment {sums['segment']:.2f}s = "
        f"{total_dev:.2f}s -> {floor_tps if floor_tps is None else round(floor_tps, 2)} tiles/s"
    )
    return {
        f"{tag}_device_s_predict": sums["predict"],
        f"{tag}_device_s_detect": sums["detect"],
        f"{tag}_device_s_segment": sums["segment"],
        f"{tag}_infer_tiles_per_sec_device_floor": (
            round(floor_tps, 3) if floor_tps else None
        ),
    }


def probe_device(timeout_s: float, platform: str | None = None):
    """Check that the JAX backend can initialize, in a SUBPROCESS.

    A killed device-holding process can leave the remote axon session
    claimed, after which every new process hangs forever inside backend
    init (no error, no logs). Probing in a child keeps this process
    healthy so it can emit an honest error record instead of hanging the
    caller (the round driver runs bench unattended).

    Returns ``(ok, reason)``; a fast non-zero exit (ImportError, bad env)
    is reported with its stderr tail, distinct from a hang. On timeout the
    child is ABANDONED, never killed — killing a process mid-device-init
    is exactly what wedges the remote session (NOTES.md)."""
    import subprocess
    import tempfile

    # a BENCH_PLATFORM=cpu smoke test must not touch the (possibly busy)
    # tunneled TPU session at all — probe the platform that will be used
    flip = (
        f"jax.config.update('jax_platforms', {platform!r}); " if platform else ""
    )
    with tempfile.TemporaryFile() as err:
        proc = subprocess.Popen(
            [sys.executable, "-c", f"import jax; {flip}jax.devices()"],
            stdout=subprocess.DEVNULL,
            stderr=err,
        )
        try:
            rc = proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            return False, (
                f"device init still hanging after {timeout_s:.0f}s "
                "(axon wedge? see NOTES.md); probe child left to finish "
                "on its own"
            )
        if rc == 0:
            return True, ""
        err.seek(0)
        tail = err.read()[-2000:].decode(errors="replace").strip()
        return False, (
            f"device probe exited rc={rc} (NOT a wedge — the child failed "
            f"fast); stderr tail: {tail[-400:]}"
        )


def main():
    probe_timeout = float(os.environ.get("BENCH_DEVICE_PROBE_TIMEOUT", "300"))
    ok, reason = probe_device(probe_timeout, os.environ.get("BENCH_PLATFORM"))
    if not ok:
        log(
            "device backend failed to initialize — emitting an error record "
            f"instead of hanging: {reason}"
        )
        print(json.dumps({
            "metric": "2d_infer_tiles_per_sec_e2e",  # same series as success
            "value": 0.0,
            "unit": "tiles/s",
            "vs_baseline": 0.0,
            "error": reason,
        }))
        return

    import jax

    if os.environ.get("BENCH_PLATFORM"):
        # JAX_PLATFORMS is overridden by the preloaded TPU plugin in this
        # image (NOTES.md); flip explicitly for CPU smoke tests so they
        # never contend with a TPU job
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    import cellulus_tpu

    cellulus_tpu.enable_compilation_cache()
    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.detect import detect_sample, sample_rng
    from cellulus_tpu.io import zarr
    from cellulus_tpu.models import compute_geometry, init_params, spec_from_config
    from cellulus_tpu.predict import predict_sample
    from cellulus_tpu.segment import cell_segment_sample
    from cellulus_tpu.train import make_optimizer, make_train_step_grid
    from cellulus_tpu.datasets import BatchLoader, get_dataset
    from synthetic import make_blob_container

    work = REPO / ".bench_work"
    work.mkdir(exist_ok=True)
    container = work / "bench_data.zarr"
    meta_path = container / "train" / ".zarray"
    regenerate = True
    if meta_path.exists():
        shape = json.loads(meta_path.read_text())["shape"]
        regenerate = shape[0] != NUM_SAMPLES or shape[-1] != SIZE
    if regenerate:
        import shutil as _shutil

        if container.exists():
            _shutil.rmtree(container)
        log("generating synthetic data...")
        make_blob_container(
            container, num_samples=NUM_SAMPLES, size=SIZE, ndim=2, seed=5,
        )

    config = ExperimentConfig(
        **{
            "experiment_name": "bench",
            "object_size": int(SIZE * 0.13),
            "model_config": {
                "num_fmaps": NUM_FMAPS,
                "fmap_inc_factor": 3,
                "features_in_last_layer": 64,
            },
            "train_config": {
                "batch_size": 8,
                "crop_size": [252, 252],
                "max_iterations": TRAIN_ITERS,
                "num_workers": 4,
                "elastic_deform": False,
                "precision": "bfloat16",
                "train_data_config": {
                    "container_path": str(container),
                    "dataset_name": "train",
                },
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

    tc = config.train_config
    ic = config.inference_config
    ic.bandwidth = 0.5 * config.object_size
    ic.min_size = int(0.1 * np.pi * config.object_size**2 / 4)

    spec = spec_from_config(config.model_config, in_channels=1, num_spatial_dims=2)
    geometry = compute_geometry(tuple(ic.crop_size), spec.downsampling_factors)
    out_tile = geometry.output_size
    tiles_per_sample = int(np.ceil(SIZE / out_tile[0])) * int(
        np.ceil(SIZE / out_tile[1])
    )
    n_tiles = tiles_per_sample * NUM_SAMPLES

    # ---- brief on-device training so detect sees realistic embeddings ----
    # streaming loop: native (uint8) crop transfer + K steps fused per
    # dispatch via lax.scan (train_config.steps_per_dispatch semantics)
    K = int(os.environ.get("BENCH_STEPS_PER_DISPATCH", "10"))
    log(
        f"training {TRAIN_ITERS} iters on {jax.devices()[0].platform} "
        f"(grid loss, native uint8 transfer, {K} steps/dispatch)..."
    )
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
    from cellulus_tpu.train import make_multi_step

    step_fn = make_train_step_grid(
        spec, optimizer, tc.temperature, tc.regularizer_weight,
        dataset.sampler, tc.batch_size, jnp.bfloat16,
        input_scale=dataset.normalization_factor,
    )
    multi = jax.jit(make_multi_step(step_fn), donate_argnums=(0, 1))
    base_key = jax.random.PRNGKey(7)

    # MFU bookkeeping: train step ~ 3x forward flops (fwd + act grads +
    # weight grads)
    from cellulus_tpu.models import model_flops

    step_flops = 3 * model_flops(spec, tuple(tc.crop_size)) * tc.batch_size
    # per-chip bf16 peak by device kind (override with BENCH_PEAK_TFLOPS)
    _PEAKS = {
        "TPU v4": 275.0,
        "TPU v5 lite": 197.0,  # v5e
        "TPU v5e": 197.0,
        "TPU v5p": 459.0,
        "TPU v6 lite": 918.0,  # v6e / Trillium
        "TPU v6e": 918.0,
    }
    kind = jax.devices()[0].device_kind
    peak_flops = float(
        os.environ.get("BENCH_PEAK_TFLOPS", _PEAKS.get(kind, 197.0))
    ) * 1e12
    log(f"device: {kind}, assuming bf16 peak {peak_flops/1e12:.0f} TFLOPs")

    t_train0 = time.perf_counter()
    train_samples = 0
    # chunk 0 is compile warm-up and excluded from the timed window; with
    # fewer than 2 chunks the streaming metric would be empty (and
    # TRAIN_ITERS=0 would leave `losses` unbound), so clamp K down
    K = max(1, min(K, TRAIN_ITERS // 2)) if TRAIN_ITERS >= 2 else 1
    n_chunks = (TRAIN_ITERS + K - 1) // K
    if n_chunks < 2:
        raise SystemExit(
            f"BENCH_TRAIN_ITERS={TRAIN_ITERS} too small: the streaming "
            "train metric needs >= 2 dispatch chunks (the first is compile "
            "warm-up)"
        )
    chunk_secs = []  # per-chunk walls under a bounded (depth-2) pipeline:
    # the median reads through transient host/tunnel stalls that a
    # single total-wall number conflates with framework regressions (r02
    # recorded 212 samples/s streaming, r03 78 on identical code).
    # Run-ahead is BOUNDED: before timing chunk c the host fences chunk
    # c-2's loss. Purely submission-to-submission walls would let PJRT
    # absorb unbounded in-flight dispatches, so whenever the DEVICE is the
    # bottleneck the walls would measure only host data prep and the
    # median would overstate streaming throughput; depth-2 keeps
    # host/device overlap (double buffering) while anchoring every wall
    # to real device completion within two chunks.
    inflight: deque = deque()
    with BatchLoader(dataset, tc.batch_size, num_workers=4) as loader:
        it = iter(loader)
        t_chunk = time.perf_counter()
        for c in range(n_chunks):
            raw_K = np.stack(
                [np.moveaxis(next(it)[0], 1, -1) for _ in range(K)]
            )
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                jnp.arange(c * K, (c + 1) * K)
            )
            params, opt_state, losses, _ = multi(
                params, opt_state, jnp.asarray(raw_K), keys
            )
            train_samples += K * tc.batch_size
            if c == 0:
                fence(losses)
                t_train0 = time.perf_counter()  # exclude compile
                train_samples = 0
            else:
                inflight.append(losses)
                if len(inflight) > 2:
                    fence(inflight.popleft())
                now = time.perf_counter()
                chunk_secs.append(now - t_chunk)
            t_chunk = time.perf_counter()
    loss = fence(losses)
    train_secs = time.perf_counter() - t_train0
    train_sps = train_samples / max(train_secs, 1e-9)
    # the first two timed chunks are recorded BEFORE the depth-2 fence
    # first fires (nothing has been popped from `inflight` yet), so their
    # walls are pure submission walls; exclude them so a small
    # BENCH_TRAIN_ITERS config cannot publish an unanchored median. The
    # total-wall number is always anchored (the final fence above chains
    # through every chunk's params).
    anchored_secs = chunk_secs[2:]
    med_chunk = (
        float(np.median(anchored_secs)) if anchored_secs else float("nan")
    )
    train_sps_median = (
        K * tc.batch_size / med_chunk if anchored_secs else train_sps
    )
    train_mfu = step_flops * (train_samples / tc.batch_size) / max(
        train_secs, 1e-9
    ) / peak_flops
    spread = (
        f"(p10 {K * tc.batch_size / np.percentile(anchored_secs, 90):.1f} / "
        f"p90 {K * tc.batch_size / np.percentile(anchored_secs, 10):.1f}) "
        if anchored_secs
        else "(too few chunks for anchored percentiles; median=total-wall) "
    )
    log(
        f"train (streaming, incl. h2d over tunnel): {train_sps:.2f} "
        f"samples/s/chip total-wall, {train_sps_median:.2f} median-chunk "
        + spread
        + f"MFU {100 * train_mfu:.1f}% (loss {float(loss):.3f})"
    )

    # device-resident throughput: scan over pre-staged batches — the loop
    # ceiling without the tunnel's per-dispatch h2d tax
    STAGE = 4  # dispatches of K steps over one staged super-batch
    with BatchLoader(dataset, tc.batch_size, num_workers=4) as loader:
        it = iter(loader)
        raw_K = jnp.asarray(
            np.stack([np.moveaxis(next(it)[0], 1, -1) for _ in range(K)])
        )
    keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(jnp.arange(K))
    params, opt_state, losses, _ = multi(params, opt_state, raw_K, keys)
    fence(losses)
    t0 = time.perf_counter()
    for c in range(STAGE):
        params, opt_state, losses, _ = multi(params, opt_state, raw_K, keys)
    fence(losses)
    t_res = time.perf_counter() - t0
    res_sps = STAGE * K * tc.batch_size / t_res
    res_mfu = step_flops * STAGE * K / t_res / peak_flops
    log(
        f"train (device-resident batches): {res_sps:.2f} samples/s/chip, "
        f"MFU {100 * res_mfu:.1f}% ({1e3 * t_res / (STAGE * K):.2f} ms/step)"
    )

    # pairs-mode (reference-parity loss) device-resident throughput + MFU
    from cellulus_tpu.train import make_train_step_fused

    pairs_step_fn = make_train_step_fused(
        spec, optimizer, tc.temperature, tc.regularizer_weight,
        dataset.sampler, tc.batch_size, jnp.bfloat16,
        input_scale=dataset.normalization_factor,
    )
    pairs_opt_state = optimizer.init(params)
    pairs_multi = jax.jit(make_multi_step(pairs_step_fn), donate_argnums=(0, 1))
    pparams, pairs_opt_state, losses, _ = pairs_multi(
        jax.tree_util.tree_map(jnp.copy, params), pairs_opt_state, raw_K, keys
    )
    fence(losses)
    t0 = time.perf_counter()
    for c in range(STAGE):
        pparams, pairs_opt_state, losses, _ = pairs_multi(
            pparams, pairs_opt_state, raw_K, keys
        )
    fence(losses)
    t_pairs = time.perf_counter() - t0
    pairs_sps = STAGE * K * tc.batch_size / t_pairs
    pairs_mfu = step_flops * STAGE * K / t_pairs / peak_flops
    del pparams, pairs_opt_state
    log(
        f"train pairs-mode (device-resident): {pairs_sps:.2f} samples/s/chip, "
        f"MFU {100 * pairs_mfu:.1f}% ({1e3 * t_pairs / (STAGE * K):.2f} ms/step)"
    )

    # ---- f32 A/B: the same grid step at float32 compute -------------------
    # the roofline analysis (docs/tpu_design.md) attributes the step floor to
    # HBM traffic with a 2x lane-padding tax on f32 narrow-channel tensors;
    # this row measures what precision="bfloat16" (the default lever) buys
    f32_step_fn = make_train_step_grid(
        spec, optimizer, tc.temperature, tc.regularizer_weight,
        dataset.sampler, tc.batch_size, jnp.float32,
        input_scale=dataset.normalization_factor,
    )
    f32_opt_state = optimizer.init(params)
    f32_multi = jax.jit(make_multi_step(f32_step_fn), donate_argnums=(0, 1))
    fparams, f32_opt_state, losses, _ = f32_multi(
        jax.tree_util.tree_map(jnp.copy, params), f32_opt_state, raw_K, keys
    )
    fence(losses)
    t0 = time.perf_counter()
    for c in range(STAGE):
        fparams, f32_opt_state, losses, _ = f32_multi(
            fparams, f32_opt_state, raw_K, keys
        )
    fence(losses)
    t_f32 = time.perf_counter() - t0
    f32_sps = STAGE * K * tc.batch_size / t_f32
    del fparams, f32_opt_state
    log(
        f"train grid f32 A/B (device-resident): {f32_sps:.2f} samples/s/chip "
        f"({1e3 * t_f32 / (STAGE * K):.2f} ms/step vs bf16 "
        f"{1e3 * t_res / (STAGE * K):.2f})"
    )

    # ---- elastic-on-device training throughput ---------------------------
    # the advertised augmented path (train_config.elastic_deform +
    # elastic_on_device): padded uint8 crops ship, the jitted step warps +
    # normalizes + trains in one program (datasets/elastic_jax.py).
    # Auxiliary metric: never let it take down the headline inference bench.
    el_sps = None
    try:
        from cellulus_tpu.datasets.elastic_jax import elastic_deform_batch

        el_dataset = get_dataset(
            dataset_config=tc.train_data_config,
            crop_size=tuple(tc.crop_size),
            elastic_deform=True,
            control_point_spacing=tc.control_point_spacing,
            control_point_jitter=tc.control_point_jitter,
            density=tc.density,
            kappa=tc.kappa,
            normalization_factor=None,
            output_shape=geometry.output_size,
            seed=0,
            sample_pairs=False,
            normalize=False,
            elastic_device=True,
        )
        deform = elastic_deform_batch(
            tuple(tc.crop_size),
            tc.control_point_spacing,
            tc.control_point_jitter,
        )

        def el_step(params, opt_state, raw, key):
            k_deform, k_loss = jax.random.split(key)
            return step_fn(params, opt_state, deform(raw, k_deform), k_loss)

        el_multi = jax.jit(make_multi_step(el_step), donate_argnums=(0, 1))
        el_opt_state = optimizer.init(params)
        with BatchLoader(el_dataset, tc.batch_size, num_workers=4) as loader:
            it = iter(loader)
            raw_K_el = jnp.asarray(
                np.stack([np.moveaxis(next(it)[0], 1, -1) for _ in range(K)])
            )
        eparams, el_opt_state, losses, _ = el_multi(
            jax.tree_util.tree_map(jnp.copy, params), el_opt_state,
            raw_K_el, keys
        )
        fence(losses)
        t0 = time.perf_counter()
        for c in range(STAGE):
            eparams, el_opt_state, losses, _ = el_multi(
                eparams, el_opt_state, raw_K_el, keys
            )
        fence(losses)
        t_el = time.perf_counter() - t0
        el_sps = STAGE * K * tc.batch_size / t_el
        del eparams, el_opt_state
        log(
            f"train grid + on-device elastic (device-resident): {el_sps:.2f} "
            f"samples/s/chip ({1e3 * t_el / (STAGE * K):.2f} ms/step)"
        )
    except Exception as e:
        log(f"elastic train bench FAILED (non-fatal): {type(e).__name__}: {e}")

    # ---- timed inference ---------------------------------------------------
    # Both paths run the REAL stage machinery including all zarr I/O (the
    # reference's staged flow is zarr-to-zarr per stage, reference
    # infer.py:69-80) — staged = predict()/detect()/segment() stage
    # functions, pipelined = infer_pipelined() overlapping them.
    raw_all = np.asarray(zarr.open(container, "r")["train"][...], np.float32)

    import shutil

    from cellulus_tpu.detect import detect as detect_stage
    from cellulus_tpu.pipeline import infer_pipelined
    from cellulus_tpu.predict import predict as predict_stage
    from cellulus_tpu.segment import segment as segment_stage

    out_container = work / "bench_out.zarr"
    ic.pipelined = True
    ic.dataset_config = type(tc.train_data_config)(
        container_path=container, dataset_name="train"
    )
    ic.prediction_dataset_config = type(tc.train_data_config)(
        container_path=out_container, dataset_name="embeddings"
    )
    ic.detection_dataset_config = type(tc.train_data_config)(
        container_path=out_container, dataset_name="detection",
        secondary_dataset_name="embeddings",
    )
    ic.segmentation_dataset_config = type(tc.train_data_config)(
        container_path=out_container, dataset_name="segmentation",
        secondary_dataset_name="detection",
    )

    # warm up compiles out of the timed region (steady-state throughput is
    # the metric; compiles amortize over real workloads)
    warm_emb = predict_sample(
        spec, params, raw_all[0], ic, 1.0 / 255, sample_seed=0,
        compute_dtype=jnp.bfloat16,
    )
    _, _, _, warm_det = detect_sample(warm_emb, ic, 2, sample_rng(ic.seed, 0))
    cell_segment_sample(
        warm_det[0], ic.grow_distance, ic.shrink_distance, ic.min_size
    )

    # ---- device-time TTA probe (chained, d2h-fenced) ----------------------
    # per-tile DEVICE time of the TTA embedding program, isolated from zarr
    # I/O and tunnel transfers: iterations chained inside one jitted
    # fori_loop (unchained dispatches can be elided — NOTES.md measurement
    # rule) with a value-neutral feedback so XLA cannot hoist the body, and
    # ended by a real scalar fetch. This is the stable series a wall-number
    # regression is judged against: if tiles/s drops but this holds, the
    # regression is tunnel/IO, not the compute path.
    B_t = ic.tile_batch_size
    in_ch = raw_all.shape[1] if raw_all.ndim == 4 else 1
    x0 = jnp.asarray(
        np.random.default_rng(0).random(
            (B_t, *ic.crop_size, in_ch), np.float32
        )
    )
    keys_t = jax.random.split(jax.random.PRNGKey(3), B_t)
    from cellulus_tpu.models import tta_embeddings

    tta_b = jax.vmap(
        lambda t, kk: tta_embeddings(
            spec, params, t, kk, ic.p_salt_pepper,
            ic.num_infer_iterations, jnp.bfloat16,
        ),
        in_axes=(0, 0),
    )
    TTA_CHAIN = int(os.environ.get("BENCH_TTA_CHAIN", "8"))

    def _tta_chained(x):
        def body(i, carry):
            x_i, acc = carry
            emb = tta_b(x_i, keys_t)
            m = jnp.mean(emb)
            return (x_i + (m * 1e-30).astype(x_i.dtype), acc + m)

        return jax.lax.fori_loop(0, TTA_CHAIN, body, (x, jnp.float32(0)))

    tta_chained = jax.jit(_tta_chained)
    float(tta_chained(x0)[1])  # compile + executable-upload warm-up
    t0 = time.perf_counter()
    float(tta_chained(x0)[1])
    tta_device_ms_tile = 1e3 * (time.perf_counter() - t0) / (TTA_CHAIN * B_t)
    log(
        f"TTA embed device time: {tta_device_ms_tile:.2f} ms/tile "
        f"({TTA_CHAIN} chained reps x {B_t} tiles, "
        f"{2 * ic.num_infer_iterations} passes/tile)"
    )

    # best of BENCH_REPS runs per path: the tunneled chip's d2h bandwidth
    # jitters by >2x run-to-run; best-of-N reads through the noise to the
    # pipeline's actual capability (labeled as such in the JSON)
    REPS = int(os.environ.get("BENCH_REPS", "3"))
    total = None
    staged_reps = []
    for rep in range(REPS):
        if out_container.exists():
            shutil.rmtree(out_container)
        t0 = time.perf_counter()
        predict_stage(spec, params, ic, 1.0 / 255, jnp.bfloat16)
        t_predict = time.perf_counter() - t0
        t0 = time.perf_counter()
        detect_stage(ic)
        t_detect = time.perf_counter() - t0
        t0 = time.perf_counter()
        segment_stage(ic)
        t_segment = time.perf_counter() - t0

        rep_total = t_predict + t_detect + t_segment
        log(
            f"infer (staged zarr-to-zarr, rep {rep}): {n_tiles} tiles in "
            f"{rep_total:.2f}s (predict {t_predict:.2f}s, detect "
            f"{t_detect:.2f}s, segment {t_segment:.2f}s) -> "
            f"{n_tiles / rep_total:.2f} tiles/s"
        )
        staged_reps.append(rep_total)
        if total is None or rep_total < total:
            total = rep_total
    tiles_per_sec = n_tiles / total
    staged_median = n_tiles / float(np.median(staged_reps))
    log(
        f"infer (staged, best of {REPS}): {tiles_per_sec:.2f} tiles/s "
        f"(median {staged_median:.2f})"
    )
    device_stage_s = _device_floor_rep(
        lambda: (
            predict_stage(spec, params, ic, 1.0 / 255, jnp.bfloat16),
            detect_stage(ic),
            segment_stage(ic),
        ),
        out_container,
        n_tiles,
        "2d",
    )
    embeddings_all = [
        np.asarray(zarr.open(out_container, "r")["embeddings"][s], np.float32)
        for s in range(NUM_SAMPLES)
    ]
    # Untimed pipelined warm-up: the staged loop above already absorbed the
    # executable-upload tax for the shared kernels, but the pipelined driver
    # has its own thread/queue startup and any residual compile — pay it
    # once outside the timed region so the recorded number is steady-state.
    if out_container.exists():
        shutil.rmtree(out_container)
    infer_pipelined(spec, params, ic, 1.0 / 255, jnp.bfloat16)
    # The pipelined path is the headline (the reference's staged flow is the
    # baseline architecture; overlap is the point) — give it more reps to
    # read through the tunnel's >2x d2h jitter.
    REPS_PIPE = int(os.environ.get("BENCH_REPS_PIPELINED", str(REPS + 2)))
    t_pipelined = None
    pipe_reps = []
    for rep in range(REPS_PIPE):
        if out_container.exists():
            shutil.rmtree(out_container)
        t0 = time.perf_counter()
        infer_pipelined(spec, params, ic, 1.0 / 255, jnp.bfloat16)
        rep_t = time.perf_counter() - t0
        log(
            f"infer (pipelined rep {rep}, incl. zarr I/O): {n_tiles} tiles "
            f"in {rep_t:.2f}s -> {n_tiles / rep_t:.2f} tiles/s"
        )
        pipe_reps.append(rep_t)
        if t_pipelined is None or rep_t < t_pipelined:
            t_pipelined = rep_t
    tiles_per_sec_piped = n_tiles / t_pipelined
    pipelined_median = n_tiles / float(np.median(pipe_reps))
    log(
        f"infer (pipelined, best of {REPS_PIPE}): "
        f"{tiles_per_sec_piped:.2f} tiles/s (median {pipelined_median:.2f})"
    )
    # Headline value IS the pipelined number — no max() flattering.
    tiles_per_sec = tiles_per_sec_piped

    # ---- 3D axis -----------------------------------------------------------
    metrics_3d = {}
    if os.environ.get("BENCH_3D", "1") == "1":
        try:
            metrics_3d = bench_3d(work, peak_flops)
        except Exception as e:  # auxiliary axis: never sink the 2D record
            log(f"3D bench FAILED (non-fatal): {type(e).__name__}: {e}")
            metrics_3d = {"3d_error": f"{type(e).__name__}: {e}"}

    # ---- baseline: reference-style torch-CPU hot path --------------------
    # cache is keyed by the knobs that change the workload (a 24-fmap live
    # run compared against a cached 64-fmap baseline would inflate
    # vs_baseline severalfold) plus a formula version plus a HOST
    # fingerprint: the baseline is this host's CPU, so a clone running on
    # different hardware must re-measure instead of silently reusing the
    # committed 1-core number
    import platform

    host_fp = f"{os.cpu_count()}cpu-{platform.machine()}"
    knobs = {
        "size": SIZE, "samples": NUM_SAMPLES, "fmaps": NUM_FMAPS, "v": 2,
        "host": host_fp,
    }
    baseline_tps = None
    if BASELINE_CACHE.exists():
        cached = json.loads(BASELINE_CACHE.read_text())
        if cached.get("knobs") == knobs:
            baseline_tps = cached.get("tiles_per_sec")
        else:
            log(f"baseline cache knobs {cached.get('knobs')} != {knobs}; remeasuring")
    if baseline_tps is None and os.environ.get("BENCH_SKIP_BASELINE") != "1":
        log("measuring torch-CPU reference baseline (one-time)...")
        baseline_tps = measure_torch_baseline(
            spec, params, raw_all[0], embeddings_all[0], ic, n_tiles
        )
        BASELINE_CACHE.write_text(
            json.dumps({"tiles_per_sec": baseline_tps, "knobs": knobs})
        )

    # None (unmeasured) must stay distinguishable from measured parity
    vs_baseline = (
        round(tiles_per_sec / baseline_tps, 2) if baseline_tps else None
    )
    print(
        json.dumps(
            {
                "metric": "2d_infer_tiles_per_sec_e2e",
                "value": round(tiles_per_sec, 3),
                "unit": (
                    "tiles/s (236^2 px output tiles; embed+meanshift+segment;"
                    " pipelined path, best of BENCH_REPS_PIPELINED runs —"
                    " tunnel d2h jitters >2x;"
                    " vs_baseline = reference-style torch on THIS HOST'S CPU,"
                    " not the A100 north star)"
                ),
                "vs_baseline": vs_baseline,
                "staged_tiles_per_sec": round(n_tiles / total, 3),
                "staged_tiles_per_sec_median": round(staged_median, 3),
                "pipelined_tiles_per_sec": round(tiles_per_sec_piped, 3),
                "pipelined_tiles_per_sec_median": round(pipelined_median, 3),
                "tta_device_ms_per_tile": round(tta_device_ms_tile, 3),
                "train_samples_per_sec_chip_streaming": round(train_sps, 2),
                "train_samples_per_sec_chip_streaming_median_chunk": round(
                    train_sps_median, 2
                ),
                "train_samples_per_sec_chip_device_resident": round(res_sps, 2),
                "train_step_ms_device": round(1e3 * t_res / (STAGE * K), 2),
                "train_step_ms_device_f32": round(
                    1e3 * t_f32 / (STAGE * K), 2
                ),
                "train_samples_per_sec_chip_f32": round(f32_sps, 2),
                "train_mfu_pct_grid": round(100 * res_mfu, 2),
                "train_mfu_pct_pairs": round(100 * pairs_mfu, 2),
                "train_samples_per_sec_chip_pairs": round(pairs_sps, 2),
                "train_samples_per_sec_chip_elastic": (
                    round(el_sps, 2) if el_sps is not None else None
                ),
                **device_stage_s,
                **metrics_3d,
            }
        )
    )


def bench_3d(work, peak_flops):
    """3D perf axis (fills BASELINE.md's '3D infer tiles/sec' row).

    Uses the repo's validated anisotropic 3D recipe (docs/validation.md:
    24 fmaps, fmap_inc_factor 3, downsampling [[1,2,2]], crop [40,76,76] —
    the regime proven to F1 1.000 / SEG 0.693; the reference's own 3D
    example is the same model family at [[2,2,2]],
    reference docs/examples/3d/02-train.py:34-41). Trains briefly so the
    detect stage sees realistic embeddings, then times the device-resident
    train step and the staged zarr-to-zarr inference path end-to-end.
    """
    import jax
    import jax.numpy as jnp

    from cellulus_tpu.configs import ExperimentConfig
    from cellulus_tpu.datasets import BatchLoader, get_dataset
    from cellulus_tpu.detect import detect as detect_stage
    from cellulus_tpu.io import zarr
    from cellulus_tpu.models import (
        compute_geometry,
        init_params,
        model_flops,
        spec_from_config,
    )
    from cellulus_tpu.predict import predict as predict_stage
    from cellulus_tpu.segment import segment as segment_stage
    from cellulus_tpu.train import (
        make_multi_step,
        make_optimizer,
        make_train_step_grid,
    )
    from synthetic import make_blob_container

    SIZE3 = int(os.environ.get("BENCH_SIZE_3D", "128"))
    N3 = int(os.environ.get("BENCH_SAMPLES_3D", "2"))
    ITERS3 = int(os.environ.get("BENCH_TRAIN_ITERS_3D", "100"))
    REPS3 = int(os.environ.get("BENCH_REPS_3D", "2"))

    container = work / "bench_data_3d.zarr"
    meta_path = container / "train" / ".zarray"
    regenerate = True
    if meta_path.exists():
        shape = json.loads(meta_path.read_text())["shape"]
        regenerate = shape[0] != N3 or shape[-1] != SIZE3
    if regenerate:
        import shutil as _shutil

        if container.exists():
            _shutil.rmtree(container)
        log("generating 3D synthetic data...")
        make_blob_container(container, num_samples=N3, size=SIZE3, ndim=3, seed=9)

    object_size = int(SIZE3 * 0.13)
    out_container = work / "bench_out_3d.zarr"
    config = ExperimentConfig(
        **{
            "experiment_name": "bench3d",
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
                "prediction_dataset_config": {
                    "container_path": str(out_container),
                    "dataset_name": "embeddings",
                },
                "detection_dataset_config": {
                    "container_path": str(out_container),
                    "dataset_name": "detection",
                    "secondary_dataset_name": "embeddings",
                },
                "segmentation_dataset_config": {
                    "container_path": str(out_container),
                    "dataset_name": "segmentation",
                    "secondary_dataset_name": "detection",
                },
            },
        }
    )
    tc = config.train_config
    ic = config.inference_config
    ic.bandwidth = 0.5 * object_size
    ic.min_size = int(0.1 * 4.0 / 3.0 * np.pi * (object_size**3) / 8)

    spec = spec_from_config(config.model_config, in_channels=1, num_spatial_dims=3)
    geometry = compute_geometry(tuple(ic.crop_size), spec.downsampling_factors)
    out_tile = geometry.output_size
    tiles_per_sample = int(
        np.prod([int(np.ceil(SIZE3 / o)) for o in out_tile])
    )
    n_tiles = tiles_per_sample * N3

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

    # brief streaming training so embeddings organize for detect
    log(f"3D: training {ITERS3} iters...")
    with BatchLoader(dataset, tc.batch_size, num_workers=4) as loader:
        it = iter(loader)
        raw_K = None
        for c in range((ITERS3 + K - 1) // K):
            raw_K = jnp.asarray(
                np.stack([np.moveaxis(next(it)[0], 1, -1) for _ in range(K)])
            )
            params, opt_state, losses, _ = multi(params, opt_state, raw_K, keys)
    fence(losses)

    # device-resident step timing (staged batch, chained via donation)
    STAGE = 4
    t0 = time.perf_counter()
    for c in range(STAGE):
        params, opt_state, losses, _ = multi(params, opt_state, raw_K, keys)
    fence(losses)
    t_res = time.perf_counter() - t0
    step_flops = 3 * model_flops(spec, tuple(tc.crop_size)) * tc.batch_size
    sps3 = STAGE * K * tc.batch_size / t_res
    mfu3 = step_flops * STAGE * K / t_res / peak_flops
    log(
        f"3D train (device-resident): {sps3:.2f} samples/s/chip, MFU "
        f"{100 * mfu3:.1f}% ({1e3 * t_res / (STAGE * K):.2f} ms/step)"
    )

    # staged zarr-to-zarr inference, warm-up + best/median of REPS3
    import shutil

    reps = []
    for rep in range(REPS3 + 1):
        if out_container.exists():
            shutil.rmtree(out_container)
        t0 = time.perf_counter()
        predict_stage(spec, params, ic, 1.0 / 255, jnp.bfloat16)
        t_pred = time.perf_counter() - t0
        t0 = time.perf_counter()
        detect_stage(ic)
        t_det = time.perf_counter() - t0
        t0 = time.perf_counter()
        segment_stage(ic)
        t_seg = time.perf_counter() - t0
        total = t_pred + t_det + t_seg
        log(
            f"3D infer ({'warm-up' if rep == 0 else f'rep {rep}'}): "
            f"{n_tiles} tiles in {total:.2f}s (predict {t_pred:.2f}, detect "
            f"{t_det:.2f}, segment {t_seg:.2f}) -> {n_tiles / total:.2f} "
            "tiles/s"
        )
        if rep > 0:
            reps.append(total)
    best = min(reps)
    device_stage_s = _device_floor_rep(
        lambda: (
            predict_stage(spec, params, ic, 1.0 / 255, jnp.bfloat16),
            detect_stage(ic),
            segment_stage(ic),
        ),
        out_container,
        n_tiles,
        "3d",
    )
    return {
        "3d_infer_tiles_per_sec_e2e": round(n_tiles / best, 3),
        **device_stage_s,
        "3d_infer_tiles_per_sec_median": round(
            n_tiles / float(np.median(reps)), 3
        ),
        "3d_out_tile": list(out_tile),
        "3d_train_samples_per_sec_chip": round(sps3, 2),
        "3d_train_step_ms_device": round(1e3 * t_res / (STAGE * K), 2),
        "3d_train_mfu_pct": round(100 * mfu3, 2),
    }


def measure_torch_baseline(spec, params, raw, embeddings, ic, n_tiles) -> float:
    """Reference-style pipeline on torch CPU: serial TTA with host
    round-trips per pass + sklearn MeanShift + scipy segment, one tile of
    prediction extrapolated to the full tile count."""
    import torch

    from torch_reference import TorchOCEModel, copy_jax_params_to_torch

    model = TorchOCEModel(
        1, 2, spec.num_fmaps, spec.fmap_inc_factor,
        spec.features_in_last_layer,
        [list(f) for f in spec.downsampling_factors], 2,
    )
    copy_jax_params_to_torch(params, model)
    model.eval()

    tile = torch.from_numpy(
        (raw[:, : ic.crop_size[0], : ic.crop_size[1]] / 255.0).astype(np.float32)
    )[None]
    t0 = time.perf_counter()
    preds = []
    with torch.no_grad():
        for val in (0.5, 1.0):
            for _ in range(ic.num_infer_iterations):
                noisy = tile.detach().clone()
                rnd = torch.rand(*noisy.shape)
                noisy[rnd <= ic.p_salt_pepper] = val
                preds.append(model(noisy)[0].cpu())
    torch.stack(preds).std(dim=0)
    t_tile = time.perf_counter() - t0

    # sklearn mean-shift + scipy segment on the same embeddings
    from sklearn.cluster import MeanShift

    from cellulus_tpu.ops.mean_shift import add_coordinate_grid
    from cellulus_tpu.ops.otsu import threshold_otsu
    from cellulus_tpu.segment import remove_halo
    from cellulus_tpu.ops.components import size_filter

    emb = np.asarray(embeddings, np.float32)
    t0 = time.perf_counter()
    thr = threshold_otsu(emb[-1])
    mask = emb[-1] < thr
    absolute = add_coordinate_grid(emb[:-1])
    X = absolute.reshape(2, -1).T[mask.ravel()]
    rng = np.random.default_rng(0)
    X_fit = X[rng.random(len(X)) < ic.reduction_probability]
    ms = MeanShift(bandwidth=ic.bandwidth, cluster_all=False)
    ms.fit(X_fit if len(X_fit) else X)
    labels = ms.predict(X)
    seg = np.full(mask.shape, -1, np.int32)
    seg[mask] = labels
    seg += 1
    seg = remove_halo(seg.astype(np.uint16), ic.grow_distance, ic.shrink_distance)
    size_filter(seg, ic.min_size)
    t_cluster_sample = time.perf_counter() - t0

    # cluster time is measured on one sample and paid ONCE PER SAMPLE in
    # the reference flow (it clusters every sample, reference
    # detect.py:84-135) — counting it once flattered the baseline
    return n_tiles / (t_tile * n_tiles + t_cluster_sample * NUM_SAMPLES)


if __name__ == "__main__":
    main()
