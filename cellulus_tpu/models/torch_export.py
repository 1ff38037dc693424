"""Export cellulus-tpu params as a reference-format PyTorch checkpoint.

Inverse of :mod:`cellulus_tpu.models.torch_import`: writes a ``torch.save``d
dict with the same fields the reference training loop persists
(reference ``train.py:183-191``: ``iteration``, ``lowest_loss``,
``model_state_dict``, ``optim_state_dict``, ``logger_data``) and a
state_dict in funlib UNet naming (``backbone.l_conv.<l>.conv_pass.<2i>``,
``backbone.r_conv.0.<l>.conv_pass.<2i>``, ``head.<0|2>`` — even indices
because ReLUs occupy the odd slots of each ``nn.Sequential``), so models
trained here load into the reference implementation with
``load_state_dict(strict=True)``.

Weight layout conversion: jax channels-last ``(*K, C_in, C_out)`` ->
torch ``(C_out, C_in, *K)``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional


def _conv_to_torch(conv_params: Dict[str, Any], prefix: str, out: dict) -> None:
    import torch
    import numpy as np

    w = np.asarray(conv_params["w"])  # (*K, C_in, C_out)
    k = w.ndim - 2
    perm = (k + 1, k) + tuple(range(k))
    out[f"{prefix}.weight"] = torch.from_numpy(
        np.ascontiguousarray(w.transpose(perm)).astype(np.float32)
    )
    out[f"{prefix}.bias"] = torch.from_numpy(
        np.asarray(conv_params["b"], dtype=np.float32).copy()
    )


def params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a cellulus-tpu params pytree to a funlib-named state_dict."""
    sd: Dict[str, Any] = {}
    down = params["down"]
    up = params["up"]
    n_levels = len(down)
    if len(up) != n_levels - 1:
        raise ValueError(
            f"params tree has {n_levels} down levels but {len(up)} up levels; "
            "expected len(up) == len(down) - 1"
        )
    for l in range(n_levels):
        pass_params = down[f"level{l}"]
        for i in range(len(pass_params)):
            _conv_to_torch(
                pass_params[f"conv{i}"],
                f"backbone.l_conv.{l}.conv_pass.{2 * i}",
                sd,
            )
    for l in range(n_levels - 1):
        pass_params = up[f"level{l}"]
        for i in range(len(pass_params)):
            _conv_to_torch(
                pass_params[f"conv{i}"],
                f"backbone.r_conv.0.{l}.conv_pass.{2 * i}",
                sd,
            )
    if "up_tconv" in params:
        # constant_upsample=False: transposed-conv upsample weights live
        # under backbone.r_up.<head>.<level>.up.* in funlib naming; ours
        # are (*K, C_in, C_out), torch ConvTranspose is (C_in, C_out, *K)
        import numpy as np
        import torch

        for l in range(n_levels - 1):
            tp = params["up_tconv"][f"level{l}"]
            w = np.asarray(tp["w"])
            k = w.ndim - 2
            perm = (k, k + 1) + tuple(range(k))
            sd[f"backbone.r_up.0.{l}.up.weight"] = torch.from_numpy(
                np.ascontiguousarray(w.transpose(perm)).astype(np.float32)
            )
            sd[f"backbone.r_up.0.{l}.up.bias"] = torch.from_numpy(
                np.asarray(tp["b"], dtype=np.float32).copy()
            )
    _conv_to_torch(params["head"]["conv0"], "head.0", sd)
    _conv_to_torch(params["head"]["conv1"], "head.2", sd)
    return sd


def save_torch_checkpoint(
    path: Path,
    params: Dict[str, Any],
    iteration: int = 0,
    lowest_loss: float = 1e10,
    optim_state_dict: Optional[dict] = None,
    logger_data: Optional[dict] = None,
) -> None:
    """Write ``params`` as a reference-compatible ``.pth`` checkpoint."""
    import torch

    torch.save(
        {
            "iteration": int(iteration),
            "lowest_loss": float(lowest_loss),
            "model_state_dict": params_to_torch_state_dict(params),
            "optim_state_dict": optim_state_dict or {},
            "logger_data": logger_data or {},
        },
        Path(path),
    )
