"""Train-loop variants: steps_per_dispatch scan fusion, native transfer,
init schemes, pair_count_mode."""

import numpy as np
import pytest

import cellulus_tpu
from cellulus_tpu.configs import ExperimentConfig


def _config(container, max_iterations=6, **train_overrides):
    train_config = {
        "batch_size": 2,
        "crop_size": [36, 36],
        "kappa": 6.0,
        "max_iterations": max_iterations,
        "num_workers": 1,
        "elastic_deform": False,
        "loss_mode": "grid",
        "save_model_every": 1000,
        "save_best_model_every": 1000,
        "save_snapshot_every": 1000,
        "train_data_config": {
            "container_path": str(container),
            "dataset_name": "train",
        },
    }
    train_config.update(train_overrides)
    return ExperimentConfig(
        **{
            "object_size": 10,
            "model_config": {
                "num_fmaps": 8,
                "fmap_inc_factor": 2,
                "features_in_last_layer": 8,
            },
            "train_config": train_config,
        }
    )


def _losses(state):
    return state["logger_data"]["loss"]


def test_steps_per_dispatch_matches_single_step(
    blob_container_2d, tmp_path, monkeypatch
):
    """K steps fused into one lax.scan dispatch produce the same per-step
    losses as K separate dispatches (same batches, same fold_in keys)."""
    monkeypatch.chdir(tmp_path)
    s1 = cellulus_tpu.train(_config(blob_container_2d))
    s3 = cellulus_tpu.train(_config(blob_container_2d, steps_per_dispatch=3))
    np.testing.assert_allclose(_losses(s1), _losses(s3), rtol=1e-5)


def test_native_transfer_bit_identical(blob_container_2d, tmp_path, monkeypatch):
    """Shipping uint8 crops + normalizing on device == shipping normalized
    float32 crops (scalar multiply commutes with the transfer)."""
    monkeypatch.chdir(tmp_path)
    a = cellulus_tpu.train(_config(blob_container_2d))
    b = cellulus_tpu.train(
        _config(blob_container_2d, transfer_precision="native")
    )
    np.testing.assert_allclose(_losses(a), _losses(b), rtol=1e-6)


def test_native_transfer_rejects_elastic(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError, match="elastic"):
        cellulus_tpu.train(
            _config(
                blob_container_2d,
                transfer_precision="native",
                elastic_deform=True,
            )
        )


def test_initialize_false_uses_torch_default_init(
    blob_container_2d, tmp_path, monkeypatch
):
    """initialize=False -> torch-default Kaiming-uniform(a=sqrt(5)) weights
    (bounded by 1/sqrt(fan_in)), not Kaiming-normal (reference
    train.py:65-68 keeps the torch init in that case)."""
    monkeypatch.chdir(tmp_path)
    config = _config(blob_container_2d, max_iterations=1)
    config.model_config.initialize = False
    state = cellulus_tpu.train(config)
    w = np.asarray(state["params"]["down"]["level0"]["conv1"]["w"])
    fan_in = w.shape[0] * w.shape[1] * w.shape[2]
    assert np.abs(w).max() <= 1.0 / np.sqrt(fan_in) + 1e-6

    config2 = _config(blob_container_2d, max_iterations=1)
    state2 = cellulus_tpu.train(config2)
    w2 = np.asarray(state2["params"]["down"]["level0"]["conv1"]["w"])
    # kaiming-normal exceeds the uniform bound with overwhelming probability
    assert np.abs(w2).max() > 1.0 / np.sqrt(fan_in)


def test_dense_mode_warns(blob_container_2d, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.warns(UserWarning, match="dense"):
        cellulus_tpu.train(
            _config(blob_container_2d, max_iterations=1, loss_mode="dense")
        )


def test_pair_count_mode_all_dims_3d():
    """all_dims scales anchors with the full unbiased volume and references
    with the kappa-ball volume (the reference formula uses only 2 dims,
    reference zarr_dataset.py:244-248)."""
    from cellulus_tpu.datasets import PairSampler

    ref = PairSampler(output_shape=(32, 32, 32), density=0.1, kappa=6.0)
    alld = PairSampler(
        output_shape=(32, 32, 32), density=0.1, kappa=6.0,
        count_mode="all_dims",
    )
    assert ref.n_anchors == int(0.1 * 20 * 20)
    assert alld.n_anchors == int(0.1 * 20 * 20 * 20)
    assert ref.n_references == int(0.1 * np.pi * 36)
    assert alld.n_references == int(0.1 * 4.0 / 3.0 * np.pi * 216)
    # 2D: both modes agree with the reference formula
    a = PairSampler(output_shape=(40, 40), density=0.1, kappa=6.0)
    b = PairSampler(
        output_shape=(40, 40), density=0.1, kappa=6.0, count_mode="all_dims"
    )
    assert (a.n_anchors, a.n_references) == (b.n_anchors, b.n_references)


def test_steps_per_dispatch_pairs_mode(blob_container_2d, tmp_path, monkeypatch):
    """K>1 also works for host-sampled pairs (coords stack on the scan
    axis; device_pair_sampling off)."""
    monkeypatch.chdir(tmp_path)
    base = dict(loss_mode="pairs", device_pair_sampling=False)
    s1 = cellulus_tpu.train(_config(blob_container_2d, **base))
    s2 = cellulus_tpu.train(
        _config(blob_container_2d, steps_per_dispatch=2, **base)
    )
    np.testing.assert_allclose(_losses(s1), _losses(s2), rtol=1e-5)


def test_steps_per_dispatch_key_driven_fast_path(
    blob_container_2d, tmp_path, monkeypatch
):
    """K>1 parity for the composed FAST path (on-device elastic warp +
    device pair sampling, the exact recipe scripts/validate_quality.py
    --fast and the 3D precision A/B cells run): fused K-step scan must
    reproduce the K=1 per-step losses bit-for-bit — both paths fold the
    same base key with the global iteration index."""
    monkeypatch.chdir(tmp_path)
    base = dict(
        max_iterations=8,
        loss_mode="pairs",
        elastic_deform=True,
        elastic_on_device=True,
        device_pair_sampling=True,
    )
    s1 = cellulus_tpu.train(_config(blob_container_2d, **base))
    s4 = cellulus_tpu.train(
        _config(blob_container_2d, steps_per_dispatch=4, **base)
    )
    np.testing.assert_allclose(_losses(s1), _losses(s4), rtol=1e-5)


def test_steps_per_dispatch_key_driven_fast_path_3d(
    blob_container_3d, tmp_path, monkeypatch
):
    """Same K>1 parity for the 3D fast path with anisotropic downsampling
    — the exact regime where the round-4 precision A/B cells (spd=4)
    systematically underperformed the single-step density sweep."""
    monkeypatch.chdir(tmp_path)

    def cfg(**overrides):
        train_config = {
            "batch_size": 2,
            "crop_size": [26, 34, 34],
            "kappa": 4.0,
            "max_iterations": 6,
            "num_workers": 1,
            "loss_mode": "pairs",
            "elastic_deform": True,
            "elastic_on_device": True,
            "device_pair_sampling": True,
            "save_model_every": 1000,
            "save_best_model_every": 1000,
            "save_snapshot_every": 1000,
            "train_data_config": {
                "container_path": str(blob_container_3d),
                "dataset_name": "train",
            },
        }
        train_config.update(overrides)
        return ExperimentConfig(
            **{
                "object_size": 8,
                "model_config": {
                    "num_fmaps": 8,
                    "fmap_inc_factor": 2,
                    "features_in_last_layer": 8,
                    "downsampling_factors": [[1, 2, 2]],
                },
                "train_config": train_config,
            }
        )

    s1 = cellulus_tpu.train(cfg())
    s3 = cellulus_tpu.train(cfg(steps_per_dispatch=3))
    np.testing.assert_allclose(_losses(s1), _losses(s3), rtol=1e-5)


def test_elastic_on_device_trains(blob_container_2d, tmp_path, monkeypatch):
    """On-device elastic warp composes with the jitted step (and with
    native uint8 transfer): finite losses, deterministic under seed."""
    monkeypatch.chdir(tmp_path)
    cfg = dict(
        max_iterations=3,
        elastic_deform=True,
        elastic_on_device=True,
        transfer_precision="native",
    )
    a = cellulus_tpu.train(_config(blob_container_2d, **cfg))
    assert np.isfinite(_losses(a)).all()
    b = cellulus_tpu.train(_config(blob_container_2d, **cfg))
    np.testing.assert_allclose(_losses(a), _losses(b))


def test_elastic_on_device_requires_key_driven(
    blob_container_2d, tmp_path, monkeypatch
):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError, match="key-driven"):
        cellulus_tpu.train(
            _config(
                blob_container_2d,
                max_iterations=1,
                loss_mode="pairs",
                device_pair_sampling=False,
                elastic_deform=True,
                elastic_on_device=True,
            )
        )


def test_lr_milestones_schedule():
    """Paper-recipe LR decay: update magnitude drops by the decay factor
    after each milestone; default (None) keeps the reference's constant LR."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cellulus_tpu.train import make_optimizer

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}

    opt = make_optimizer(1e-2, lr_milestones=[2, 4], lr_decay_factor=0.1)
    state = opt.init(params)
    seen = []
    for step in range(6):
        updates, state = opt.update(grads, state, params)
        seen.append(float(jnp.abs(updates["w"]).max()))
    # constant gradient => Adam's normalized update is ~lr in magnitude;
    # milestones at 2 and 4 divide it by 10 each time
    assert np.isclose(seen[1] / seen[0], 1.0, rtol=0.2)
    assert np.isclose(seen[2] / seen[1], 0.1, rtol=0.2)
    assert np.isclose(seen[4] / seen[3], 0.1, rtol=0.2)


def test_log_grad_norm(blob_container_2d, tmp_path, monkeypatch):
    """log_grad_norm=True records a positive, finite grad_norm column in
    loss.csv (and in logger_data), one entry per iteration; with
    steps_per_dispatch > 1 only chunk-end steps carry a value (NaN rows
    keep alignment). grad_norm does not perturb training."""
    import csv
    import math

    monkeypatch.chdir(tmp_path)
    state = cellulus_tpu.train(
        _config(blob_container_2d, log_grad_norm=True)
    )
    gns = state["logger_data"]["grad_norm"]
    assert len(gns) == len(state["logger_data"]["loss"])
    assert all(g > 0 and math.isfinite(g) for g in gns)
    with open("loss.csv") as f:
        header = next(csv.reader(f))
    assert "grad_norm" in header

    # identical training trajectory with the recorder off
    monkeypatch.chdir(tmp_path / "..")
    (tmp_path / "off").mkdir(exist_ok=True)
    monkeypatch.chdir(tmp_path / "off")
    base = cellulus_tpu.train(_config(blob_container_2d))
    np.testing.assert_allclose(
        _losses(state), _losses(base), rtol=1e-6
    )

    # K>1: chunk-end steps observable, mid-chunk rows NaN
    (tmp_path / "k3").mkdir(exist_ok=True)
    monkeypatch.chdir(tmp_path / "k3")
    s3 = cellulus_tpu.train(
        _config(blob_container_2d, log_grad_norm=True, steps_per_dispatch=3)
    )
    gns3 = s3["logger_data"]["grad_norm"]
    assert len(gns3) == len(s3["logger_data"]["loss"])
    assert all(
        (math.isnan(g) if (i % 3) != 2 else g > 0)
        for i, g in enumerate(gns3)
    )


def test_grad_clip_norm():
    """grad_clip_norm clips the RAW gradient before decay+Adam: a huge
    gradient produces the same first update as the same gradient pre-scaled
    to the clip norm; default (None) matches the unclipped reference chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cellulus_tpu.train import make_optimizer

    params = {"w": jnp.ones((4,))}
    huge = {"w": jnp.full((4,), 1e6)}
    norm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(huge))))
    scaled = jax.tree.map(lambda g: g * (1.0 / norm), huge)

    clipped = make_optimizer(1e-2, grad_clip_norm=1.0)
    plain = make_optimizer(1e-2)

    u_clip, _ = clipped.update(huge, clipped.init(params), params)
    u_ref, _ = plain.update(scaled, plain.init(params), params)
    np.testing.assert_allclose(
        np.asarray(u_clip["w"]), np.asarray(u_ref["w"]), rtol=1e-6
    )

    # below the threshold the clip is a no-op
    small = {"w": jnp.full((4,), 0.1)}
    u_small_clip, _ = clipped.update(small, clipped.init(params), params)
    u_small_plain, _ = plain.update(small, plain.init(params), params)
    np.testing.assert_allclose(
        np.asarray(u_small_clip["w"]), np.asarray(u_small_plain["w"]),
        rtol=1e-6,
    )

    # config surface: TOML-settable, validated
    from cellulus_tpu.configs import TrainConfig

    assert TrainConfig(grad_clip_norm="2.5").grad_clip_norm == 2.5
    assert TrainConfig().grad_clip_norm is None
    import pytest

    with pytest.raises(ValueError):
        TrainConfig(grad_clip_norm=0)


def test_steps_per_dispatch_checkpoint_boundary_semantics(
    blob_container_2d, tmp_path, monkeypatch
):
    """With K > 1, a cadence point landing mid-chunk is saved at the CHUNK
    BOUNDARY with params matching that iteration (regression: the old code
    saved end-of-chunk params under the mid-chunk iteration number, so
    resume double-applied up to K-1 steps)."""
    import jax
    import pathlib

    from cellulus_tpu.utils.checkpoint import load_checkpoint

    monkeypatch.chdir(tmp_path)
    base = dict(steps_per_dispatch=3, num_workers=0)

    # run A: 6 iterations, no mid-run checkpoints -> final params are the
    # ground truth for "params after iteration 5"
    full = cellulus_tpu.train(
        _config(blob_container_2d, max_iterations=6, **base)
    )

    # run B: identical seeds/data, but save_model_every=4 fires INSIDE the
    # chunk [3..5] -> must be recorded at the boundary iteration 5
    import shutil

    shutil.rmtree("models", ignore_errors=True)
    cellulus_tpu.train(
        _config(
            blob_container_2d, max_iterations=6, save_model_every=4, **base
        )
    )
    names = sorted(p.name for p in pathlib.Path("models").glob("0*.ckpt"))
    assert "000005.ckpt" in names and "000004.ckpt" not in names, names

    state = load_checkpoint("models/000005.ckpt")
    assert state["iteration"] == 5
    # params recorded under iteration 5 == run A's params after iteration 5
    for a, b in zip(
        jax.tree_util.tree_leaves(state["params"]),
        jax.tree_util.tree_leaves(full["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_3d_density_envelope_guard():
    """3D runs outside the validated lr x density envelope warn; the
    validated recipes (density 0.05 + all_dims at lr 4e-4; density 0.1 at
    lr 1e-4) and all 2D configs stay silent (docs/validation.md lr x density
    grid)."""
    import warnings

    from cellulus_tpu.train import check_3d_density_envelope

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        check_3d_density_envelope(2, 0.1)
        check_3d_density_envelope(2, 0.5, "reference")
        assert not w
        check_3d_density_envelope(3, 0.05, "all_dims")  # headline recipe
        check_3d_density_envelope(3, 0.025, "all_dims")  # stable point
        # density 0.1 is fine once lr compensates (grid: F1 1.0 at 1e-4)
        check_3d_density_envelope(3, 0.1, "all_dims", lr=1e-4)
        assert not w
        # 2D default density at the default-recipe lr: product 4e-5 > 2e-5
        check_3d_density_envelope(3, 0.1, "all_dims")
        assert len(w) == 1
        assert "outside the validated" in str(w[-1].message)
        # high lr collapses even the stable density (grid: F1 0.009)
        check_3d_density_envelope(3, 0.025, "all_dims", lr=1.6e-3)
        assert len(w) == 2
        assert "outside the validated" in str(w[-1].message)
        check_3d_density_envelope(3, 0.05, "reference")
        assert len(w) == 3
        assert "2-dim formula" in str(w[-1].message)
        check_3d_density_envelope(3, 0.0125, "all_dims")
        assert len(w) == 4
        assert "below the validated envelope" in str(w[-1].message)


def test_stop_file_checkpoints_and_exits(
    blob_container_2d, tmp_path, monkeypatch
):
    """Touching the stop sentinel mid-run ends training early with a
    resumable checkpoint under the in-hand iteration; a pre-existing file
    with the sentinel name is ignored (not deleted) instead of instantly
    killing the new run."""
    import threading
    import time

    monkeypatch.chdir(tmp_path)
    stop = tmp_path / "STOP"
    stop.touch()  # stale sentinel from a "previous" run
    done = threading.Event()

    def toucher():
        # keep touching until train returns: a single touch could land
        # before train() records its start epoch and be classed as
        # pre-existing
        time.sleep(2.0)
        while not done.is_set():
            stop.touch()
            time.sleep(0.5)

    t = threading.Thread(target=toucher, daemon=True)
    t.start()
    try:
        with pytest.warns(UserWarning, match="predates this run"):
            state = cellulus_tpu.train(
                _config(blob_container_2d, max_iterations=100_000)
            )
    finally:
        done.set()
        t.join()
    it = int(state["iteration"])
    assert it < 100_000 - 1  # stopped early
    ckpt = tmp_path / "models" / (str(it).zfill(6) + ".ckpt")
    assert ckpt.exists()

    # resume continues from the stopped iteration with intact history
    stop.unlink()
    cfg = _config(blob_container_2d, max_iterations=it + 3)
    cfg.model_config.checkpoint = ckpt
    state2 = cellulus_tpu.train(cfg)
    assert int(state2["iteration"]) == it + 2
    assert len(_losses(state2)) == it + 3


def test_multi_dataset_native_transfer(blob_container_2d, tmp_path, monkeypatch):
    """train_data_configs + transfer_precision='native' trains (the
    ConcatDataset exposes the members' shared normalization factor), and
    disagreeing member factors are rejected up front."""
    monkeypatch.chdir(tmp_path)
    cfg = _config(blob_container_2d, max_iterations=2,
                  transfer_precision="native")
    cfg.train_config.train_data_configs = [
        cfg.train_config.train_data_config,
        cfg.train_config.train_data_config,
    ]
    cfg.train_config.train_data_config = None
    state = cellulus_tpu.train(cfg)
    assert len(_losses(state)) == 2

    from cellulus_tpu.datasets.zarr_dataset import ConcatDataset

    class _Fake:
        num_channels = 1
        num_spatial_dims = 2
        output_shape = (10, 10)
        seed = 0
        sampler = None
        sample_pairs = False
        meta = None

        def __init__(self, f):
            self.normalization_factor = f

    cd = ConcatDataset([_Fake(1 / 255), _Fake(1 / 65535)])
    with pytest.raises(ValueError, match="normalization factor"):
        cd.normalization_factor
