"""Multi-host training: two real processes coordinate over jax.distributed.

Spawns two CPU-backend worker processes (1 device each) that form a
2-process cluster and jointly train the tiny 2D model for a few iterations:
each worker loads its local half of the global batch, the dp mesh spans
both processes' devices, and only process 0 writes checkpoints/logs. This
is the single-host-analog of a multi-slice TPU run (the reference has no
distributed story at all — SURVEY.md §2 parallelism inventory).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

from tests.synthetic import make_blob_container

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]; workdir = sys.argv[3]
os.chdir(workdir)
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
if proc_id == 0:
    # explicit-args path: initialize before train
    from cellulus_tpu.parallel import distributed as dist
    dist.initialize(f"localhost:{{port}}", num_processes=2, process_id=proc_id)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()
else:
    # env-driven path: train() itself must run dist.initialize() BEFORE
    # touching the backend (regression: enable_compilation_cache used to
    # initialize XLA first and break jax.distributed.initialize)
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{{port}}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(proc_id)
from cellulus_tpu.configs import ExperimentConfig
from cellulus_tpu.train import train
state = train(ExperimentConfig.from_toml("train.toml"))
assert jax.process_count() == 2, jax.process_count()
print("WORKER_DONE", proc_id, float(state["lowest_loss"]))
"""

TRAIN_TOML = """\
experiment_name = "dist-test"

[model_config]
num_fmaps = 6
fmap_inc_factor = 2
features_in_last_layer = 8
downsampling_factors = [[2, 2]]

[train_config]
crop_size = [48, 48]
batch_size = 2
max_iterations = 3
elastic_deform = false
num_workers = 0
save_model_every = 100
save_snapshot_every = 2
save_best_model_every = 2
loss_mode = "grid"
steps_per_dispatch = {steps_per_dispatch}

[train_config.train_data_config]
container_path = "data.zarr"
dataset_name = "train"

[train_config.validate_data_config]
container_path = "data.zarr"
dataset_name = "train"
"""


def test_single_process_helpers():
    """Single-process degenerate behavior: helpers are local equivalents."""
    import jax
    import numpy as np

    from cellulus_tpu.parallel import batch_sharding, distributed, make_mesh

    assert distributed.process_count() == 1
    assert distributed.is_primary()
    assert distributed.local_batch_size(8) == 8
    mesh = make_mesh(4)
    sh = batch_sharding(mesh)
    arr = distributed.put_process_batch(np.zeros((8, 5), np.float32), sh)
    assert isinstance(arr, jax.Array) and arr.shape == (8, 5)
    assert arr.sharding == sh

    # initialize() with no coordinator configured is a no-op
    distributed.initialize()
    assert jax.process_count() == 1


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


import pytest


@pytest.mark.parametrize("steps_per_dispatch", [1, 2])
def test_two_process_cpu_training(tmp_path, steps_per_dispatch):
    """K=1 exercises the per-step path; K=2 the lax.scan chunk path with
    key-driven grid sampling under multi-process (explicitly-replicated
    per-iteration PRNG keys + a ragged final chunk at max_iterations=3)."""
    make_blob_container(tmp_path / "data.zarr", num_samples=2, size=96, ndim=2)
    (tmp_path / "train.toml").write_text(
        TRAIN_TOML.format(steps_per_dispatch=steps_per_dispatch)
    )
    port = _free_port()

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                WORKER.format(repo=str(REPO)),
                str(i),
                str(port),
                str(tmp_path),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_DONE {i}" in out, out[-2000:]

    # only the primary prints per-iteration losses and writes checkpoints
    assert "===> iteration: 0" in outs[0]
    assert "===> iteration:" not in outs[1]
    ckpts = list((tmp_path / "models").glob("*.ckpt"))
    assert ckpts, "primary wrote no checkpoints"

    # primary-only validation: process 0 logs a validation loss (computed
    # on its local replica of the params), process 1 stays silent
    assert "===> validation loss:" in outs[0], outs[0][-2000:]
    assert "===> validation loss:" not in outs[1]
    # primary-only snapshot of the local batch rows
    assert (tmp_path / "snapshots.zarr").exists(), "primary wrote no snapshot"

    # the final numbered checkpoint loads back into a params tree
    from cellulus_tpu.utils.checkpoint import load_checkpoint

    state = load_checkpoint(tmp_path / "models" / "000002.ckpt")
    assert state["iteration"] == 2
