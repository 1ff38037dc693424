"""Spatially-sharded U-Net forward with ICI halo exchange.

Tiled inference covers arbitrarily large volumes with *independent* tiles
(halos come from overlapping host reads — no inter-chip traffic). When the
input already lives on the mesh (e.g. fused predict-after-train, or
pipelines keeping volumes resident in HBM), the halo can instead ride the
ICI: the image is sharded along its first spatial axis, each device
exchanges ``context`` rows with its neighbors via ``lax.ppermute``, and the
valid-conv U-Net then produces exactly its own output rows — bit-identical
to the unsharded forward (verified in tests/test_spatial_sharding.py).

This is the workload's analogue of sequence parallelism (SURVEY.md §5
"long-context"): the spatial extent is the long axis, and the only
communication is the boundary exchange, which is O(context) per device pair
regardless of image size.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import UNetSpec, compute_geometry
from ..models import unet as unet_mod

SPACE_AXIS = "space"


def make_spatial_mesh(n_devices: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices[:n_devices]), (SPACE_AXIS,))


def _exchange_halo(x_local: jnp.ndarray, context: int, n_shards: int):
    """Concatenate neighbor halos (reflect at the global boundary) along the
    first spatial axis of ``x_local (B, H_local, ..., C)``."""
    idx = lax.axis_index(SPACE_AXIS)
    # send my top rows to the previous device (they become its bottom halo)
    fwd_perm = [(i, i + 1) for i in range(n_shards - 1)]
    bwd_perm = [(i, i - 1) for i in range(1, n_shards)]
    from_prev = lax.ppermute(x_local[:, -context:], SPACE_AXIS, fwd_perm)
    from_next = lax.ppermute(x_local[:, :context], SPACE_AXIS, bwd_perm)
    # global edges: reflect my own rows (matches the tiled path's
    # reflect-boundary semantics: row -k mirrors row +k)
    reflect_top = jnp.flip(x_local[:, 1 : context + 1], axis=1)
    reflect_bottom = jnp.flip(x_local[:, -context - 1 : -1], axis=1)
    top = jnp.where(idx == 0, reflect_top, from_prev)
    bottom = jnp.where(idx == n_shards - 1, reflect_bottom, from_next)
    return jnp.concatenate([top, x_local, bottom], axis=1)


def sharded_forward(
    spec: UNetSpec,
    params,
    raw: jnp.ndarray,
    mesh: Mesh,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Forward pass with the first spatial axis sharded over ``mesh``.

    Args:
        raw: ``(B, H, *rest, C)`` channels-last input. ``H`` must split
            evenly over the mesh, each local slice plus its halo must be a
            valid U-Net input size, and the per-device output must equal
            ``H_local`` (use :func:`plan_spatial_split` to pick sizes).

    Returns:
        ``(B, H_out, *rest_out, C_out)`` — identical to the unsharded
        ``forward`` on the same input.
    """
    n_shards = mesh.devices.size
    H = raw.shape[1]
    if H % n_shards:
        raise ValueError(f"H={H} does not split over {n_shards} devices")
    h_local = H // n_shards
    # context along the sharded axis: derived from the local extended input
    ext_geom = compute_geometry(
        (h_local + 2 * _axis_context(spec, h_local, n_shards),)
        + tuple(raw.shape[2:-1]),
        spec.downsampling_factors,
    )
    context = _axis_context(spec, h_local, n_shards)
    if ext_geom.output_size[0] != h_local:
        raise ValueError(
            f"local slice {h_local} + halo {context} is not self-consistent "
            f"(output {ext_geom.output_size[0]}); pick sizes with "
            "plan_spatial_split"
        )

    def local_fn(params, x_local):
        ext = _exchange_halo(x_local, context, n_shards)
        return unet_mod.forward(spec, params, ext, compute_dtype)

    shard = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, SPACE_AXIS)),
        out_specs=P(None, SPACE_AXIS),
        check_vma=False,
    )
    raw_sh = jax.device_put(raw, NamedSharding(mesh, P(None, SPACE_AXIS)))
    params_sh = jax.device_put(params, NamedSharding(mesh, P()))
    return shard(params_sh, raw_sh)


def _axis_context(spec: UNetSpec, h_local: int, n_shards: int) -> int:
    """Halo rows needed so a local slice of ``h_local`` output rows is
    computable: half of (input - output) along the sharded axis."""
    # search the input size whose output is exactly h_local
    for inp in range(h_local, h_local + 256):
        try:
            out = compute_geometry(
                (inp,) * spec.num_spatial_dims, spec.downsampling_factors
            ).output_size[0]
        except ValueError:
            continue
        if out == h_local:
            return (inp - h_local) // 2
    raise ValueError(f"no valid halo found for local extent {h_local}")


def plan_spatial_split(
    spec: UNetSpec, n_shards: int, min_h_local: int = 8
) -> Tuple[int, int]:
    """Find the smallest ``(H, context)`` with ``H = n_shards * h_local``
    such that the sharded forward is self-consistent."""
    h_local = min_h_local
    while h_local < 4096:
        try:
            ctx = _axis_context(spec, h_local, n_shards)
            return n_shards * h_local, ctx
        except ValueError:
            h_local += 1
    raise ValueError("no valid spatial split found")


def _axis_output(spec: UNetSpec, axis: int, inp: int) -> int:
    """Output extent along ``axis`` for input extent ``inp`` (other axes
    probed at a large valid size so per-axis geometry decouples)."""
    probe = [512] * spec.num_spatial_dims
    probe[axis] = inp
    return compute_geometry(tuple(probe), spec.downsampling_factors).output_size[
        axis
    ]


def _axis_pad_for_output(spec: UNetSpec, axis: int, extent: int) -> int:
    """Smallest per-side input pad so output along ``axis`` == ``extent``."""
    for inp in range(extent, extent + 512):
        try:
            out = _axis_output(spec, axis, inp)
        except ValueError:
            continue
        if out == extent and (inp - extent) % 2 == 0:
            return (inp - extent) // 2
    raise ValueError(f"no valid pad found for extent {extent} on axis {axis}")


def plan_whole_sample(spec: UNetSpec, spatial, n_shards: int):
    """Plan a whole-sample sharded forward over ``spatial``: returns
    ``(h_pad, context, rest_pads)`` where the first axis is padded to
    ``h_pad = n_shards * h_local`` (with ``h_pad - H >= context`` so the
    bottom halo comes from host reflect rows, matching the tiled path's
    boundary semantics) and each remaining axis is reflect-padded by
    ``rest_pads[i]`` per side so its output equals its input extent."""
    H = int(spatial[0])
    h_local = -(-H // n_shards)
    while h_local < H + 4096:
        try:
            ctx = _axis_context(spec, h_local, n_shards)
        except ValueError:
            h_local += 1
            continue
        if n_shards * h_local >= H + ctx:
            return n_shards * h_local, ctx, [
                _axis_pad_for_output(spec, i, int(r))
                for i, r in enumerate(spatial[1:], start=1)
            ]
        h_local += 1
    raise ValueError(f"no valid whole-sample split for H={H} x{n_shards}")


def spatial_tta_sample(
    spec: UNetSpec,
    params,
    raw: np.ndarray,
    inference_config,
    normalization_factor: float,
    sample_seed: int = 0,
    compute_dtype=jnp.float32,
    devices=None,
) -> np.ndarray:
    """TTA-predict one full sample as ONE sharded whole-volume forward
    (`inference_config.spatial_shards` devices, conv halos over the ICI).

    The user-facing integration of the sharded forward (VERDICT r4 item
    7): tiled predict covers arbitrary volumes with independent tiles;
    this path instead keeps the volume resident across the mesh — the
    choice for device-attached pipelines where the volume (or its TTA
    batch) exceeds one chip's HBM. Per-pixel outputs are bit-identical to
    the tiled path at ``p_salt_pepper == 0``
    (tests/test_spatial_sharding.py); with noise the draws differ (tiles
    key noise per tile, this path per sample+shard).

    Args:
        raw: ``(C, *spatial)`` un-normalized; returns ``(D+1, *spatial)``
        float32 like :func:`cellulus_tpu.predict.predict_sample`.
    """
    n_shards = int(inference_config.spatial_shards)
    mesh = make_spatial_mesh(n_shards, devices)
    spatial = tuple(int(s) for s in raw.shape[1:])
    H = spatial[0]
    h_pad, context, rest_pads = plan_whole_sample(spec, spatial, n_shards)
    h_local = h_pad // n_shards

    x = np.moveaxis(
        np.asarray(raw, np.float32) * float(normalization_factor), 0, -1
    )  # (*spatial, C)
    pads = [(0, h_pad - H)] + [(p, p) for p in rest_pads] + [(0, 0)]
    x = np.pad(x, pads, mode="reflect")

    n = 2 * int(inference_config.num_infer_iterations)
    p_sp = float(inference_config.p_salt_pepper)
    transfer_dtype = (
        jnp.float16
        if getattr(inference_config, "transfer_precision", "float32")
        == "float16"
        else jnp.float32
    )
    base_key = jax.random.fold_in(
        jax.random.PRNGKey(inference_config.seed), sample_seed
    )

    def local_fn(params, x_local):
        # x_local (h_local, *rest_in, C): noise per local rows (halo rows
        # then carry the NEIGHBOR's noise, like a contiguous noisy volume)
        key = jax.random.fold_in(base_key, lax.axis_index(SPACE_AXIS))
        noise_vals = jnp.concatenate(
            [
                jnp.full((n // 2,), 0.5, dtype=x_local.dtype),
                jnp.full((n // 2,), 1.0, dtype=x_local.dtype),
            ]
        )
        rnd = jax.random.uniform(key, (n, *x_local.shape), dtype=jnp.float32)
        noisy = jnp.where(
            rnd <= p_sp,
            noise_vals.reshape((n,) + (1,) * x_local.ndim),
            x_local[None],
        )
        ext = _exchange_halo(noisy, context, n_shards)
        preds = unet_mod.forward(spec, params, ext, compute_dtype)
        mean = jnp.mean(preds, axis=0)
        std = jnp.std(preds, axis=0)
        out = jnp.concatenate(
            [mean, jnp.sum(std, axis=-1, keepdims=True)], axis=-1
        )
        return out.astype(transfer_dtype)

    shard = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(SPACE_AXIS)),
            out_specs=P(SPACE_AXIS),
            check_vma=False,
        )
    )
    x_sh = jax.device_put(x, NamedSharding(mesh, P(SPACE_AXIS)))
    params_sh = jax.device_put(params, NamedSharding(mesh, P()))
    from ..utils.profiling import time_device

    out = time_device("predict.device", shard, params_sh, x_sh)
    out_np = np.asarray(out, np.float32)[:H]  # crop the padded rows
    return np.moveaxis(out_np, -1, 0)  # (D+1, *spatial)
