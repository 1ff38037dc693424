"""Fused [3,1,1,3] conv-pass Pallas kernel (2D, inference path).

One U-Net "conv pass" is conv3x3 -> ReLU -> conv1x1 -> ReLU -> conv1x1 ->
ReLU -> conv3x3 -> ReLU with VALID padding (reference funlib UNet kernel
sequence, reference ``models/unet.py:32-49``); all four stages share the
output channel count. XLA lowers this to four separate conv calls with HBM
round-trips between them and pays layout overhead at 64 channels (measured
24% MFU for the full forward on v5e, NOTES.md). This kernel keeps a
row-strip of the image in VMEM and runs all four stages back-to-back as MXU
matmuls:

- 3x3 convs are 9 shifted (rows*cols, C_in) @ (C_in, C) matmuls
  accumulated in f32,
- 1x1 convs are plain matmuls,
- bias + ReLU fuse into the accumulator epilogue.

Grid: (batch, H-strips). The input stays in HBM (``pl.ANY``); each program
DMAs its (strip + 4)-row window into VMEM (windows overlap by 4 rows, which
BlockSpec tiling cannot express).

STATUS (measured, round 2): the XLA TTA inference path already runs at
the chip's observed MXU ceiling (33.3% MFU — equal to a bare 4096^3 bf16
matmul on this v5e), so there is no headroom for this kernel to claim at
inference batch sizes; and Mosaic currently refuses the halo DMA when the
channel dim is not lane-aligned (memref_slice on a (B,H,W,1) HBM ref).
The kernel therefore stays an EXPERIMENTAL, interpret-verified reference
(enable with ``CELLULUS_TPU_PALLAS_CONV=1``; 2D inference forward only —
no custom VJP). See NOTES.md "Pallas conv pass post-mortem".
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_strip(h_out: int, w: int, c: int, budget_bytes: int = 6 << 20):
    """Largest strip height that divides h_out and keeps the widest f32
    intermediate (strip+2, w-2, c) x3 within the VMEM budget."""
    best = 1
    for strip in range(1, h_out + 1):
        if h_out % strip:
            continue
        need = (strip + 2) * max(w - 2, 1) * c * 4 * 3
        if need <= budget_bytes:
            best = strip
    return best


@lru_cache(maxsize=None)
def _pass_call(
    B: int, H: int, W: int, C_in: int, C: int, strip: int, dtype_name: str,
    interpret: bool,
):
    """Build the pallas_call for one conv pass at fixed shapes."""
    compute_dtype = jnp.dtype(dtype_name)
    H_out, W_out = H - 4, W - 4
    n_strips = H_out // strip
    win = strip + 4  # input rows needed per output strip

    def kernel(x_hbm, w1, b1, w2, b2, w3, b3, w4, b4, out_ref, x_vmem, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * strip, win)], x_vmem, sem
        )
        dma.start()
        dma.wait()

        x = x_vmem[:]  # (win, W, C_in)

        def conv3(src, w_ref, b_ref, rows_out, cols_out, c_in):
            # src: (rows_out+2, cols_out+2, c_in) -> (rows_out, cols_out, C)
            acc = jnp.zeros((rows_out * cols_out, C), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    a = src[dy : dy + rows_out, dx : dx + cols_out, :]
                    a2 = a.reshape(rows_out * cols_out, c_in)
                    acc = acc + jnp.dot(
                        a2,
                        w_ref[dy, dx],
                        preferred_element_type=jnp.float32,
                    )
            out = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
            return out.reshape(rows_out, cols_out, C)

        # stage 1: 3x3, (win, W, C_in) -> (win-2, W-2, C)
        y = conv3(x, w1, b1, win - 2, W - 2, C_in).astype(compute_dtype)
        # stages 2+3: 1x1 matmuls
        flat = y.reshape((win - 2) * (W - 2), C)
        y = jnp.maximum(
            jnp.dot(flat, w2[0, 0], preferred_element_type=jnp.float32)
            + b2[0].astype(jnp.float32),
            0.0,
        ).astype(compute_dtype)
        y = jnp.maximum(
            jnp.dot(y, w3[0, 0], preferred_element_type=jnp.float32)
            + b3[0].astype(jnp.float32),
            0.0,
        ).astype(compute_dtype)
        y = y.reshape(win - 2, W - 2, C)
        # stage 4: 3x3, (win-2, W-2, C) -> (strip, W_out, C)
        out = conv3(y, w4, b4, strip, W_out, C)
        out_ref[0] = out.astype(out_ref.dtype)

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)]
    flops = (
        2 * B * (H - 2) * (W - 2) * 9 * C_in * C
        + 2 * 2 * B * (H - 2) * (W - 2) * C * C
        + 2 * B * H_out * W_out * 9 * C * C
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H_out, W_out, C), compute_dtype),
        grid=(B, n_strips),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + w_specs,
        out_specs=pl.BlockSpec(
            (1, strip, W_out, C),
            lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((win, W, C_in), compute_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * H * W * (C_in + C),
            transcendentals=0,
        ),
        interpret=interpret,
    )


def conv_pass_2d(
    x: jnp.ndarray,
    pass_params: dict,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused [3,1,1,3] conv pass.

    Args:
        x: ``(B, H, W, C_in)`` channels-last input.
        pass_params: ``{"conv0": {"w","b"}, ..., "conv3": {...}}`` pytree
            matching :func:`cellulus_tpu.models.unet._conv_pass` params
            (w: ``(kh, kw, C_in, C_out)``, b: ``(C_out,)``).

    Returns:
        ``(B, H-4, W-4, C)`` activations in ``compute_dtype``.
    """
    B, H, W, C_in = x.shape
    C = int(pass_params["conv0"]["w"].shape[-1])
    strip = _pick_strip(H - 4, W, C)
    call = _pass_call(
        B, H, W, C_in, C, strip, jnp.dtype(compute_dtype).name, interpret
    )
    args = [x.astype(compute_dtype)]
    for i in range(4):
        p = pass_params[f"conv{i}"]
        args.append(p["w"].astype(compute_dtype))
        args.append(p["b"].reshape(1, -1).astype(jnp.float32))
    return call(*args)


def use_pallas_conv() -> bool:
    from ..utils.env import env_flag

    if not env_flag("CELLULUS_TPU_PALLAS_CONV"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
