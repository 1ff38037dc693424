"""Dense shifted-field loss: sanity + statistical agreement with pair loss."""

import jax
import jax.numpy as jnp
import numpy as np

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig
from cellulus_tpu.datasets import PairSampler
from cellulus_tpu.models import UNetSpec, compute_geometry, init_params
from cellulus_tpu.train import (
    make_optimizer,
    make_train_step_dense,
    make_train_step_fused,
)


def test_dense_loss_matches_pairs_in_expectation():
    """Averaged over many RNG draws, the dense estimator and the pair
    estimator agree (same expectation)."""
    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    crop = (52, 52)
    g = compute_geometry(crop, spec.downsampling_factors)
    sampler = PairSampler(g.output_size, density=0.2, kappa=6.0)
    params = init_params(jax.random.PRNGKey(0), spec)
    opt = make_optimizer(0.0)  # lr 0: loss evaluation only
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((2, *crop, 1)).astype(np.float32))

    step_pairs = jax.jit(
        make_train_step_fused(spec, opt, 10.0, 0.0, sampler, 2)
    )
    step_dense = jax.jit(
        make_train_step_dense(spec, opt, 10.0, 0.0, sampler, 2)
    )
    keys = jax.random.split(jax.random.PRNGKey(3), 40)
    pair_losses = []
    dense_losses = []
    for key in keys:
        _, _, lp, _, _ = step_pairs(params, opt_state, raw, key)
        _, _, ld, _, _ = step_dense(params, opt_state, raw, key)
        pair_losses.append(float(lp))
        dense_losses.append(float(ld))
    mp, md = np.mean(pair_losses), np.mean(dense_losses)
    assert np.isfinite(md)
    # same expectation; allow Monte-Carlo slack
    assert abs(mp - md) / mp < 0.15, (mp, md)


def test_dense_loss_trains(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = ExperimentConfig(
        **{
            "model_config": {"num_fmaps": 8, "fmap_inc_factor": 2,
                             "features_in_last_layer": 8},
            "train_config": {
                "batch_size": 2,
                "crop_size": [36, 36],
                "kappa": 6.0,
                "max_iterations": 2,
                "num_workers": 1,
                "elastic_deform": False,
                "loss_mode": "dense",
                "train_data_config": {
                    "container_path": str(blob_container_2d),
                    "dataset_name": "train",
                },
            },
        }
    )
    state = cellulus_tpu.train(config)
    assert np.isfinite(state["lowest_loss"])
    assert len(state["logger_data"]["loss"]) == 2


def test_grid_loss_matches_pairs_in_expectation():
    from cellulus_tpu.train import make_train_step_grid

    spec = UNetSpec(1, 2, 8, 2, 16, ((2, 2),), 2)
    crop = (52, 52)
    g = compute_geometry(crop, spec.downsampling_factors)
    sampler = PairSampler(g.output_size, density=0.2, kappa=6.0)
    params = init_params(jax.random.PRNGKey(0), spec)
    opt = make_optimizer(0.0)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.random((2, *crop, 1)).astype(np.float32))

    step_pairs = jax.jit(
        make_train_step_fused(spec, opt, 10.0, 0.0, sampler, 2)
    )
    step_grid = jax.jit(
        make_train_step_grid(spec, opt, 10.0, 0.0, sampler, 2)
    )
    keys = jax.random.split(jax.random.PRNGKey(3), 30)
    mp = np.mean([float(step_pairs(params, opt_state, raw, k)[2]) for k in keys])
    mg = np.mean([float(step_grid(params, opt_state, raw, k)[2]) for k in keys])
    assert abs(mp - mg) / mp < 0.1, (mp, mg)


def test_grid_loss_trains(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config = ExperimentConfig(
        **{
            "model_config": {"num_fmaps": 8, "fmap_inc_factor": 2,
                             "features_in_last_layer": 8},
            "train_config": {
                "batch_size": 2,
                "crop_size": [36, 36],
                "kappa": 6.0,
                "max_iterations": 2,
                "num_workers": 1,
                "elastic_deform": False,
                "loss_mode": "grid",
                "train_data_config": {
                    "container_path": str(blob_container_2d),
                    "dataset_name": "train",
                },
            },
        }
    )
    state = cellulus_tpu.train(config)
    assert np.isfinite(state["lowest_loss"])
