"""Functional N-dimensional U-Net for object-centric embeddings.

TPU-first re-design of the reference model (reference ``models/unet.py:8-63``,
which wraps ``funlib.learn.torch.models.UNet``): pure functions over a params
pytree, channels-last layout (NHWC / NDHWC) so channels map onto TPU lanes
and the 1x1 convs become plain MXU matmuls, valid padding, per-level conv
pass with kernels ``[3, 1, 1, 3]``, max-pool downsampling, constant
(nearest-neighbor) upsampling, center-crop-and-concat skip connections, and a
two-layer 1x1 head.

The architecture is described by :class:`UNetSpec`; parameters are a nested
dict pytree. ``forward`` is jit/vmap/grad-compatible and dtype-polymorphic
(bfloat16 compute with float32 accumulation via ``preferred_element_type``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .geometry import compute_geometry

Params = Dict[str, Any]


@dataclass(frozen=True)
class UNetSpec:
    """Architecture hyper-parameters of the OCE U-Net."""

    in_channels: int
    out_channels: int
    num_fmaps: int
    fmap_inc_factor: int
    features_in_last_layer: int
    downsampling_factors: Tuple[Tuple[int, ...], ...]
    num_spatial_dims: int
    # True = nearest-neighbor upsampling (the reference's hardcoded choice,
    # reference models/unet.py:50); False = learned transposed conv with
    # kernel = stride = the level's factor (the funlib backbone's other mode)
    constant_upsample: bool = True

    def __post_init__(self):
        object.__setattr__(
            self,
            "downsampling_factors",
            tuple(tuple(int(f) for f in fac) for fac in self.downsampling_factors),
        )

    @property
    def num_levels(self) -> int:
        return len(self.downsampling_factors) + 1

    def level_channels(self, level: int) -> int:
        return self.num_fmaps * self.fmap_inc_factor**level

    # conv kernel extents per pass, every spatial dim: [3, 1, 1, 3]
    PASS_KERNELS: Tuple[int, ...] = (3, 1, 1, 3)


def spec_from_config(model_config, in_channels: int, num_spatial_dims: int) -> UNetSpec:
    """Build a spec from a :class:`~cellulus_tpu.configs.ModelConfig`."""
    return UNetSpec(
        in_channels=in_channels,
        out_channels=num_spatial_dims,
        num_fmaps=model_config.num_fmaps,
        fmap_inc_factor=model_config.fmap_inc_factor,
        features_in_last_layer=model_config.features_in_last_layer,
        downsampling_factors=tuple(
            tuple(f) for f in model_config.downsampling_factors
        ),
        num_spatial_dims=num_spatial_dims,
        constant_upsample=getattr(model_config, "constant_upsample", True),
    )


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------


def _init_conv(
    key, k_size: Tuple[int, ...], c_in: int, c_out: int,
    scheme: str = "kaiming_normal",
) -> Params:
    """Conv weight/bias init.

    ``"kaiming_normal"`` matches the reference's explicit re-init when
    ``initialize=True`` (reference ``train.py:65-68``). ``"torch_default"``
    matches the untouched torch Conv init the reference keeps when
    ``initialize=False``: ``kaiming_uniform_(a=sqrt(5))``, i.e.
    ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``. Biases are the torch conv default
    ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` in both schemes.
    """
    wkey, bkey = jax.random.split(key)
    fan_in = c_in * int(np.prod(k_size))
    bound = 1.0 / math.sqrt(fan_in)
    if scheme == "torch_default":
        w = jax.random.uniform(
            wkey, (*k_size, c_in, c_out),
            minval=-bound, maxval=bound, dtype=jnp.float32,
        )
    else:
        std = math.sqrt(2.0 / fan_in)
        w = (
            jax.random.normal(wkey, (*k_size, c_in, c_out), dtype=jnp.float32)
            * std
        )
    b = jax.random.uniform(
        bkey, (c_out,), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    return {"w": w, "b": b}


def _pass_kernel_sizes(spec: UNetSpec) -> List[Tuple[int, ...]]:
    d = spec.num_spatial_dims
    return [(k,) * d for k in UNetSpec.PASS_KERNELS]


def _init_conv_pass(
    key, spec: UNetSpec, c_in: int, c_out: int, scheme: str
) -> Params:
    params = {}
    keys = jax.random.split(key, len(UNetSpec.PASS_KERNELS))
    for i, k_size in enumerate(_pass_kernel_sizes(spec)):
        params[f"conv{i}"] = _init_conv(keys[i], k_size, c_in, c_out, scheme)
        c_in = c_out
    return params


def init_params(key, spec: UNetSpec, scheme: str = "kaiming_normal") -> Params:
    """Initialize the full parameter pytree (see :func:`_init_conv` for the
    two schemes; ``train()`` maps ``initialize=False`` to "torch_default")."""
    n_down = spec.num_levels  # conv passes on the down path (incl. bottom)
    n_up = spec.num_levels - 1
    keys = jax.random.split(key, n_down + n_up + 2)
    params: Params = {"down": {}, "up": {}, "head": {}}

    c_prev = spec.in_channels
    for level in range(n_down):
        c_out = spec.level_channels(level)
        params["down"][f"level{level}"] = _init_conv_pass(
            keys[level], spec, c_prev, c_out, scheme
        )
        c_prev = c_out

    if not spec.constant_upsample:
        params["up_tconv"] = {}
    for idx, level in enumerate(reversed(range(n_up))):
        c_skip = spec.level_channels(level)
        c_up = spec.level_channels(level + 1)
        c_out = (
            spec.features_in_last_layer if level == 0 else spec.level_channels(level)
        )
        up_key = keys[n_down + idx]
        if not spec.constant_upsample:
            up_key, tkey = jax.random.split(up_key)
            # funlib's transposed conv maps c_up -> c_up with
            # kernel = stride = the level's downsampling factor
            params["up_tconv"][f"level{level}"] = _init_conv(
                tkey, spec.downsampling_factors[level], c_up, c_up, scheme
            )
        params["up"][f"level{level}"] = _init_conv_pass(
            up_key, spec, c_skip + c_up, c_out, scheme
        )

    fil = spec.features_in_last_layer
    d = spec.num_spatial_dims
    params["head"]["conv0"] = _init_conv(keys[-2], (1,) * d, fil, fil, scheme)
    params["head"]["conv1"] = _init_conv(
        keys[-1], (1,) * d, fil, spec.out_channels, scheme
    )
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _dimension_numbers(ndim: int) -> lax.ConvDimensionNumbers:
    if ndim == 2:
        return lax.conv_dimension_numbers(
            (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
        )
    if ndim == 3:
        return lax.conv_dimension_numbers(
            (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC")
        )
    raise ValueError(f"unsupported spatial ndim {ndim}")


def _conv(
    x: jnp.ndarray, p: Params, ndim: int, compute_dtype, packed_dw: bool = False
) -> jnp.ndarray:
    # bf16 inputs/weights hit the MXU with f32 accumulation (XLA default);
    # an explicit preferred_element_type=f32 would break the transpose rule
    # under jax.grad (cotangent/weight dtype mismatch)
    w = p["w"].astype(compute_dtype)
    if packed_dw == "pallas":
        # custom VJP whose 3x3 filter gradient runs the Pallas VMEM-packed
        # kernel (ops/pallas_dw.py) — forward math is identical
        from ..ops.conv_vjp import conv_valid_pallas

        out = conv_valid_pallas(x.astype(compute_dtype), w, ndim)
    elif packed_dw:
        # training fast path: custom VJP whose filter gradient is a packed
        # matmul (see ops/conv_vjp.py) — forward math is identical
        from ..ops.conv_vjp import conv_valid_packed

        out = conv_valid_packed(x.astype(compute_dtype), w, ndim)
    else:
        out = lax.conv_general_dilated(
            x.astype(compute_dtype),
            w,
            window_strides=(1,) * ndim,
            padding="VALID",
            dimension_numbers=_dimension_numbers(ndim),
        )
    return out + p["b"].astype(compute_dtype)


def _conv_pass(
    x: jnp.ndarray, p: Params, ndim: int, compute_dtype, packed_dw: bool = False
) -> jnp.ndarray:
    for i in range(len(UNetSpec.PASS_KERNELS)):
        x = _conv(x, p[f"conv{i}"], ndim, compute_dtype, packed_dw)
        x = jax.nn.relu(x)
    return x


def _max_pool(x: jnp.ndarray, factor: Tuple[int, ...]) -> jnp.ndarray:
    window = (1, *factor, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, window, window, "VALID")


def _upsample_nearest(x: jnp.ndarray, factor: Tuple[int, ...]) -> jnp.ndarray:
    """Constant (nearest-neighbor) upsampling by an integer factor."""
    for axis, f in enumerate(factor, start=1):
        if f > 1:
            x = jnp.repeat(x, f, axis=axis)
    return x


def _upsample_tconv(
    x: jnp.ndarray, p: Params, factor: Tuple[int, ...], compute_dtype
) -> jnp.ndarray:
    """Learned transposed-conv upsampling with kernel = stride = ``factor``.

    Because kernel == stride, output blocks never overlap: each input pixel
    expands into an independent ``prod(factor)``-pixel block via one channel
    matmul — an MXU-shaped einsum + reshape instead of ``conv_transpose``
    (torch ConvTranspose semantics with kernel=stride:
    ``out[n, i*f+di, ..., co] = b[co] + sum_ci in[n, i, ..., ci] *
    w[ci, co, di, ...]``).
    """
    ndim = len(factor)
    w = p["w"].astype(compute_dtype)  # (*factor, C_in, C_out)
    b = p["b"].astype(compute_dtype)
    c_in, c_out = w.shape[-2], w.shape[-1]
    blk = int(np.prod(factor))
    wf = w.reshape((blk, c_in, c_out))
    y = jnp.einsum("...i,fio->...fo", x.astype(compute_dtype), wf)
    batch = x.shape[0]
    spatial = x.shape[1:-1]
    y = y.reshape((batch, *spatial, *factor, c_out))
    # interleave each block dim with its spatial dim:
    # (B, s0, ..., s{n-1}, f0, ..., f{n-1}, C) -> (B, s0, f0, ..., C)
    perm = [0]
    for d in range(ndim):
        perm += [1 + d, 1 + ndim + d]
    perm.append(1 + 2 * ndim)
    y = y.transpose(perm)
    y = y.reshape(
        (batch, *[s * f for s, f in zip(spatial, factor)], c_out)
    )
    return y + b


def _center_crop(x: jnp.ndarray, target_spatial: Tuple[int, ...]) -> jnp.ndarray:
    slices = [slice(None)]
    for size, target in zip(x.shape[1:-1], target_spatial):
        off = (size - target) // 2
        slices.append(slice(off, off + target))
    slices.append(slice(None))
    return x[tuple(slices)]


def forward(
    spec: UNetSpec,
    params: Params,
    raw: jnp.ndarray,
    compute_dtype=jnp.float32,
    fused_conv_pass: bool = False,
    packed_dw: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """U-Net + head forward pass.

    Args:
        raw: batched channels-last input ``(B, *spatial, C_in)``.
        fused_conv_pass: route 2D conv passes through the fused Pallas
            kernel (:func:`cellulus_tpu.ops.pallas_conv.conv_pass_2d`) —
            inference only (the kernel defines no VJP).
        packed_dw: use the packed-matmul filter gradient
            (:mod:`cellulus_tpu.ops.conv_vjp`) — identical forward and
            gradients; EXPERIMENTAL, measured slower than XLA's native
            filter-grad on v5e (see conv_vjp.py docstring).
        remat: rematerialize each conv pass's activations in the backward
            pass (``jax.checkpoint``): peak activation memory drops from
            all intermediate conv outputs to one pass's inputs, at the
            cost of re-running forward convs during the backward — the
            standard trade for large-batch / large-volume (3D) training
            crops that otherwise exceed HBM. Gradients are identical.

    Returns:
        Offsets ``(B, *spatial_out, out_channels)``; channel order is
        x-first (channel 0 = x/col offset), matching the reference embedding
        convention (reference ``models/unet.py:108-124``).
    """
    ndim = spec.num_spatial_dims
    if raw.ndim != ndim + 2:
        raise ValueError(
            f"expected (B, *spatial, C) input with {ndim} spatial dims, "
            f"got shape {raw.shape}"
        )

    if fused_conv_pass and ndim == 2:
        from ..ops.pallas_conv import conv_pass_2d

        def pass_fn(x, p, _ndim, dtype):
            return conv_pass_2d(x, p, dtype)

    else:
        pass_fn = partial(_conv_pass, packed_dw=packed_dw)

    if remat:
        # checkpoint at conv-pass granularity: each pass's four conv
        # activations are recomputed in the backward instead of stored
        pass_fn = jax.checkpoint(pass_fn, static_argnums=(2, 3))

    x = raw
    skips = []
    for level in range(spec.num_levels - 1):
        x = pass_fn(x, params["down"][f"level{level}"], ndim, compute_dtype)
        skips.append(x)
        x = _max_pool(x, spec.downsampling_factors[level])

    x = pass_fn(
        x, params["down"][f"level{spec.num_levels - 1}"], ndim, compute_dtype
    )

    if not spec.constant_upsample and "up_tconv" not in params:
        raise ValueError(
            "spec has constant_upsample=False but params carry no "
            "'up_tconv' weights — the checkpoint was trained with "
            "nearest-neighbor upsampling (set constant_upsample = true)"
        )
    if spec.constant_upsample and "up_tconv" in params:
        raise ValueError(
            "params carry 'up_tconv' (transposed-conv upsample) weights but "
            "spec has constant_upsample=True — running would silently ignore "
            "the checkpoint's upsample weights (set constant_upsample = "
            "false)"
        )
    for level in reversed(range(spec.num_levels - 1)):
        if spec.constant_upsample:
            x = _upsample_nearest(x, spec.downsampling_factors[level])
        else:
            x = _upsample_tconv(
                x,
                params["up_tconv"][f"level{level}"],
                spec.downsampling_factors[level],
                compute_dtype,
            )
        skip = _center_crop(skips[level], x.shape[1:-1])
        x = jnp.concatenate([skip, x], axis=-1)
        x = pass_fn(x, params["up"][f"level{level}"], ndim, compute_dtype)

    # head: 1x1 -> ReLU -> 1x1 (no trailing activation)
    x = _conv(x, params["head"]["conv0"], ndim, compute_dtype, packed_dw)
    x = jax.nn.relu(x)
    x = _conv(x, params["head"]["conv1"], ndim, compute_dtype, packed_dw)
    return x.astype(jnp.float32)


def output_spatial_shape(
    spec: UNetSpec, input_spatial: Sequence[int]
) -> Tuple[int, ...]:
    return compute_geometry(input_spatial, spec.downsampling_factors).output_size


def model_flops(spec: UNetSpec, input_spatial: Sequence[int]) -> int:
    """Forward-pass FLOPs per sample (2 * MACs of every conv), walking the
    same shape arithmetic as :func:`forward`. Used for MFU reporting:
    a train step is ~3x forward (forward + activation grads + weight grads).
    """
    ndim = spec.num_spatial_dims
    flops = 0

    def conv_pass(spatial, c_in, c_out):
        nonlocal flops
        for k in UNetSpec.PASS_KERNELS:
            spatial = [s - (k - 1) for s in spatial]
            flops += 2 * math.prod(spatial) * k**ndim * c_in * c_out
            c_in = c_out
        return spatial

    x = list(input_spatial)
    c_prev = spec.in_channels
    skips = []
    for level in range(spec.num_levels - 1):
        x = conv_pass(x, c_prev, spec.level_channels(level))
        c_prev = spec.level_channels(level)
        skips.append(x)
        x = [s // f for s, f in zip(x, spec.downsampling_factors[level])]

    x = conv_pass(x, c_prev, spec.level_channels(spec.num_levels - 1))

    for level in reversed(range(spec.num_levels - 1)):
        if not spec.constant_upsample:
            c_up_t = spec.level_channels(level + 1)
            # per input pixel: prod(factor) output pixels x C^2 MACs
            flops += (
                2 * math.prod(x)
                * math.prod(spec.downsampling_factors[level])
                * c_up_t * c_up_t
            )
        x = [s * f for s, f in zip(x, spec.downsampling_factors[level])]
        c_skip = spec.level_channels(level)
        c_up = spec.level_channels(level + 1)
        c_out = (
            spec.features_in_last_layer
            if level == 0
            else spec.level_channels(level)
        )
        x = conv_pass(x, c_skip + c_up, c_out)

    fil = spec.features_in_last_layer
    flops += 2 * math.prod(x) * fil * fil
    flops += 2 * math.prod(x) * fil * spec.out_channels
    return flops


# ---------------------------------------------------------------------------
# coordinate gather (training) and TTA embeddings (inference)
# ---------------------------------------------------------------------------


def select_and_add_coordinates(
    outputs: jnp.ndarray, coordinates: jnp.ndarray
) -> jnp.ndarray:
    """Gather offsets at pixel coordinates and add the coordinate.

    Args:
        outputs: ``(B, *spatial, D)`` predicted offsets (channels-last).
        coordinates: ``(B, P, D)`` integer coordinates in x-first order
            (``coordinates[..., 0]`` = x/col, ``[..., 1]`` = y/row,
            ``[..., 2]`` = z), matching reference ``models/unet.py:108-124``.

    Returns:
        Absolute embeddings ``(B, P, D)``.
    """
    ndim = outputs.ndim - 2
    spatial = outputs.shape[1:-1]
    flat = outputs.reshape(outputs.shape[0], -1, outputs.shape[-1])
    # row-major flatten: index = ((z * H) + y) * W + x
    idx = jnp.zeros(coordinates.shape[:-1], dtype=jnp.int32)
    stride = 1
    for d in range(ndim):
        # spatial axis order is (..., z, y, x); coordinate component d=0 is x
        idx = idx + coordinates[..., d].astype(jnp.int32) * stride
        stride *= spatial[ndim - 1 - d]
    gathered = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return gathered + coordinates.astype(gathered.dtype)


def tta_embeddings(
    spec: UNetSpec,
    params: Params,
    raw: jnp.ndarray,
    key: jnp.ndarray,
    p_salt_pepper: float,
    num_infer_iterations: int,
    compute_dtype=jnp.float32,
    fused_conv_pass: bool = False,
) -> jnp.ndarray:
    """Test-time-augmented embeddings for one tile.

    Replaces the reference's serial Python loop of ``2 * num_infer_iterations``
    forward passes (reference ``models/unet.py:73-100``) with a single batched
    forward: all noisy copies run as one MXU batch and the mean/std reduction
    stays on device.

    Args:
        raw: one tile, channels-last ``(*spatial, C)``, already normalized.

    Returns:
        ``(*spatial_out, D + 1)``: mean offsets followed by the channel-summed
        std (population std, ddof=0) as the uncertainty channel.
    """
    n = 2 * num_infer_iterations
    noise_vals = jnp.concatenate(
        [
            jnp.full((num_infer_iterations,), 0.5, dtype=raw.dtype),
            jnp.full((num_infer_iterations,), 1.0, dtype=raw.dtype),
        ]
    )
    rnd = jax.random.uniform(key, (n, *raw.shape), dtype=jnp.float32)
    mask = rnd <= p_salt_pepper
    val = noise_vals.reshape((n,) + (1,) * raw.ndim)
    noisy = jnp.where(mask, val, raw[None])
    preds = forward(
        spec, params, noisy, compute_dtype, fused_conv_pass=fused_conv_pass
    )  # (n, *out, D)
    mean = jnp.mean(preds, axis=0)
    std = jnp.std(preds, axis=0)  # ddof=0, matches torch unbiased=False
    std_sum = jnp.sum(std, axis=-1, keepdims=True)
    return jnp.concatenate([mean, std_sum], axis=-1)
