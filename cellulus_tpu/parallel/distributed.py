"""Multi-host / multi-slice execution via ``jax.distributed``.

The reference is single-process, single-device (reference
``configs/train_config.py:127``); within one host this framework shards
batches over the local mesh (:mod:`cellulus_tpu.parallel.mesh`). This module
extends the same data-parallel layout across *processes*: N hosts (one
process per TPU slice or per host within a pod) jointly form one global
``data`` mesh. XLA routes the gradient all-reduce over ICI within a slice
and DCN across slices — the program is unchanged; only the mesh and the
batch placement differ.

Contract:

- every process runs the same training loop with the same config;
- each process loads ``batch_size / process_count`` crops (its *local
  shard*) using a process-disjoint RNG stream (``seed + process_index``)
  so global batches contain distinct crops;
- local shards are assembled into one global device array with
  ``jax.make_array_from_process_local_data`` — no host gathers, no
  cross-host copies of raw data;
- checkpoints / snapshots / CSV logs are written by process 0 only
  (parameters are replicated, so one writer sees the same state).

Single-process behavior is identical to before: every helper degenerates to
a no-op / local equivalent, so the training loop calls them unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

__all__ = [
    "initialize",
    "is_primary",
    "process_count",
    "process_index",
    "local_batch_size",
    "put_process_batch",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Join (or form) a multi-process JAX cluster.

    Thin wrapper over :func:`jax.distributed.initialize`: call once per
    process before any other JAX API. On managed TPU pods all arguments are
    discovered from the environment; on hand-rolled clusters pass the
    coordinator's ``host:port`` plus this process's id. Calling with no
    arguments outside any cluster environment is a silent no-op
    (single-process mode).
    """
    # must not touch the backend here (jax.process_count() would initialize
    # XLA and make jax.distributed.initialize impossible) — inspect the
    # distributed client state directly
    try:
        from jax._src.distributed import global_state

        if getattr(global_state, "client", None) is not None:
            return  # already initialized
    except ImportError:  # pragma: no cover - private API moved
        pass
    explicit = coordinator_address is not None
    # deliberately narrow triggers: TPU-VM metadata vars exist on single-host
    # setups too, so only an explicit coordinator address (argument or env)
    # or the opt-in flag starts cluster negotiation
    flag = os.environ.get("CELLULUS_TPU_DISTRIBUTED", "")
    env_driven = "JAX_COORDINATOR_ADDRESS" in os.environ or flag.lower() in (
        "1",
        "true",
        "yes",
    )
    if not explicit and not env_driven:
        return
    # jax reads JAX_COORDINATOR_ADDRESS itself but discovers process
    # count/id only through cluster plugins (SLURM/TPU-pod/K8s); support
    # hand-rolled clusters through the matching env names
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns checkpoints, snapshots, and logs."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """This process's share of the global batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"batch_size {global_batch_size} is not divisible by the "
            f"process count {n}; choose a batch size that shards evenly "
            "across hosts"
        )
    return global_batch_size // n


def put_process_batch(local_np: np.ndarray, sharding) -> jax.Array:
    """Assemble per-process host shards into one global device array.

    ``local_np``'s leading axis is this process's local share of the global
    batch; ``sharding`` is the global batch sharding (leading axis over the
    ``data`` mesh axis). Single-process, this is just ``device_put``.
    """
    if jax.process_count() == 1:
        return jax.device_put(local_np, sharding)
    return jax.make_array_from_process_local_data(sharding, local_np)
