"""Multi-device sharding tests on the forced 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from cellulus_tpu.configs import InferenceConfig
from cellulus_tpu.datasets import PairSampler
from cellulus_tpu.models import UNetSpec, compute_geometry, init_params
from cellulus_tpu.parallel import batch_sharding, make_mesh, replicated_sharding
from cellulus_tpu.predict import predict_sample
from cellulus_tpu.train import make_optimizer, make_train_step


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _setup(batch):
    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    crop = (36, 36)
    geometry = compute_geometry(crop, spec.downsampling_factors)
    sampler = PairSampler(geometry.output_size, density=0.1, kappa=6.0)
    rng = np.random.default_rng(0)
    raw = rng.random((batch, *crop, 1)).astype(np.float32)
    pairs = [sampler.sample(rng) for _ in range(batch)]
    anchors = np.stack([p[0] for p in pairs])
    refs = np.stack([p[1] for p in pairs])
    params = init_params(jax.random.PRNGKey(0), spec)
    return spec, raw, anchors, refs, params


def _run_step(spec, raw, anchors, refs, params, n_devices):
    optimizer = make_optimizer(4e-5)
    opt_state = optimizer.init(params)
    mesh = make_mesh(n_devices)
    data_sh = batch_sharding(mesh)
    rep_sh = replicated_sharding(mesh)
    step = jax.jit(make_train_step(spec, optimizer, 10.0, 1e-5))
    new_params, _, loss, oce, _ = step(
        jax.device_put(params, rep_sh),
        jax.device_put(opt_state, rep_sh),
        jax.device_put(jnp.asarray(raw), data_sh),
        jax.device_put(jnp.asarray(anchors), data_sh),
        jax.device_put(jnp.asarray(refs), data_sh),
    )
    return new_params, float(loss)


def test_data_parallel_matches_single_device():
    """The sharded step computes the same loss and parameter update as the
    single-device step (XLA inserts the gradient all-reduce)."""
    spec, raw, anchors, refs, params = _setup(batch=8)
    params_1, loss_1 = _run_step(spec, raw, anchors, refs, params, 1)
    params_8, loss_8 = _run_step(spec, raw, anchors, refs, params, 8)
    assert abs(loss_1 - loss_8) / abs(loss_1) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(params_1), jax.tree_util.tree_leaves(params_8)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_sharded_tiled_inference_matches_single_device():
    """Tile-batch sharding over the mesh is bit-identical to single device."""
    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    params = init_params(jax.random.PRNGKey(1), spec)
    rng = np.random.default_rng(2)
    raw = rng.random((1, 100, 100)).astype(np.float32)
    ic = InferenceConfig(crop_size=[52, 52], num_infer_iterations=2,
                         tile_batch_size=8)

    out_single = predict_sample(spec, params, raw, ic, 1.0, sample_seed=0)
    out_sharded = predict_sample(
        spec, params, raw, ic, 1.0, sample_seed=0, mesh=make_mesh(8)
    )
    np.testing.assert_allclose(out_single, out_sharded, atol=1e-5, rtol=1e-5)


def test_stage_device_round_robin_matches_serial():
    """detect/segment pinned to different devices produce bit-identical
    results: the per-sample kernels are device-independent, so the stage
    round-robin (detect.py/segment.py/pipeline.py) only changes WHERE each
    sample runs."""
    import jax
    import numpy as np

    from cellulus_tpu.configs import InferenceConfig
    from cellulus_tpu.detect import detect_sample, sample_rng
    from cellulus_tpu.segment import cell_segment_sample

    rng = np.random.default_rng(5)
    emb = rng.normal(size=(3, 64, 64)).astype(np.float32)
    emb[2] = np.abs(emb[2])
    ic = InferenceConfig(
        crop_size=[52, 52], bandwidth=4.0, min_size=4, num_bandwidths=1
    )

    results = []
    for dev in (jax.devices()[0], jax.devices()[-1]):
        with jax.default_device(dev):
            _, _, _, det = detect_sample(emb, ic, 2, sample_rng(7, 0))
            seg = cell_segment_sample(det[0], ic.grow_distance,
                                      ic.shrink_distance, ic.min_size)
        results.append((det, seg))
    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_array_equal(results[0][1], results[1][1])
