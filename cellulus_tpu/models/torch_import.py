"""Import reference PyTorch checkpoints (.pth) into cellulus-tpu params.

The reference stores ``torch.save``d dicts with a funlib UNet state_dict
(reference ``train.py:126-149``; key layout from
``funlib.learn.torch.models.UNet``: ``backbone.l_conv.<level>.conv_pass.<i>``
down conv passes, ``backbone.r_conv.0.<j>.conv_pass.<i>`` up conv passes,
``head.<i>`` 1x1 head convs). This module converts such checkpoints into the
cellulus-tpu parameter pytree so reference-trained models run unchanged —
the basis of the bit-comparability story (weights identical; conv math is
then directly comparable).

Weight layout conversion: torch ``(C_out, C_in, *K)`` -> jax channels-last
``(*K, C_in, C_out)``.

Level orientation (whether ``l_conv.0`` is the top or bottom level) and the
up-path level mapping are *derived from weight shapes*, not assumed, so the
importer fails loudly on any mismatch rather than silently mis-assigning.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict

import numpy as np


def _w(t) -> np.ndarray:
    arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    return arr


def _conv_to_jax(weight: np.ndarray, bias: np.ndarray) -> Dict[str, np.ndarray]:
    k = weight.ndim - 2
    # (C_out, C_in, *K) -> (*K, C_in, C_out)
    perm = tuple(range(2, 2 + k)) + (1, 0)
    return {
        "w": np.ascontiguousarray(weight.transpose(perm)).astype(np.float32),
        "b": bias.astype(np.float32),
    }


def _tconv_to_jax(weight: np.ndarray, bias: np.ndarray) -> Dict[str, np.ndarray]:
    # torch ConvTranspose: (C_in, C_out, *K) -> ours (*K, C_in, C_out)
    k = weight.ndim - 2
    perm = tuple(range(2, 2 + k)) + (0, 1)
    return {
        "w": np.ascontiguousarray(weight.transpose(perm)).astype(np.float32),
        "b": bias.astype(np.float32),
    }


def torch_state_dict_to_params(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference ``model_state_dict`` to a cellulus-tpu params tree."""
    down_pat = re.compile(
        r"backbone\.l_conv\.(\d+)\.conv_pass\.(\d+)\.(weight|bias)"
    )
    up_pat = re.compile(
        r"backbone\.r_conv\.(\d+)\.(\d+)\.conv_pass\.(\d+)\.(weight|bias)"
    )
    tconv_pat = re.compile(r"backbone\.r_up\.(\d+)\.(\d+)\.up\.(weight|bias)")
    head_pat = re.compile(r"head\.(\d+)\.(weight|bias)")

    down: Dict[int, Dict[int, dict]] = {}
    up: Dict[int, Dict[int, dict]] = {}
    tconv: Dict[int, dict] = {}
    head: Dict[int, dict] = {}
    unrecognized = []
    for key, value in sd.items():
        m = down_pat.fullmatch(key)
        if m:
            lvl, idx, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            down.setdefault(lvl, {}).setdefault(idx, {})[kind] = _w(value)
            continue
        m = tconv_pat.fullmatch(key)
        if m:
            # funlib built with constant_upsample=False: a transposed conv
            # (kernel = stride = the level's factor) under r_up.<h>.<v>.up
            h, lvl, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            if h != 0:
                raise ValueError("multi-head UNet checkpoints are not supported")
            tconv.setdefault(lvl, {})[kind] = _w(value)
            continue
        m = up_pat.fullmatch(key)
        if m:
            h, lvl, idx, kind = (
                int(m.group(1)),
                int(m.group(2)),
                int(m.group(3)),
                m.group(4),
            )
            if h != 0:
                raise ValueError("multi-head UNet checkpoints are not supported")
            up.setdefault(lvl, {}).setdefault(idx, {})[kind] = _w(value)
            continue
        m = head_pat.fullmatch(key)
        if m:
            idx, kind = int(m.group(1)), m.group(2)
            head.setdefault(idx, {})[kind] = _w(value)
            continue
        unrecognized.append(key)
    if unrecognized:
        # silently dropping keys would "import" a model missing weights
        raise ValueError(
            "state_dict holds model weights the importer does not map "
            f"(first few: {sorted(unrecognized)[:4]}); refusing a partial "
            "import. Expected only backbone.l_conv.*/backbone.r_conv.0.*/"
            "backbone.r_up.0.*.up.*/head.* (funlib UNet as the reference "
            "constructs it — cellulus/models/unet.py:24-51)"
        )
    if not down or not head:
        raise ValueError(
            "state_dict does not look like a reference cellulus UNetModel "
            f"(found {len(sd)} keys; expected backbone.l_conv.*/head.* keys)"
        )

    def pass_params(convs: Dict[int, dict]) -> Dict[str, dict]:
        out = {}
        for pos, idx in enumerate(sorted(convs)):
            out[f"conv{pos}"] = _conv_to_jax(convs[idx]["weight"], convs[idx]["bias"])
        return out

    # orientation: l_conv.0's first conv has C_out == num_fmaps (top) when
    # top-first; if channel counts grow with index, it's top-first
    lvls = sorted(down)
    first_outs = [down[lv][min(down[lv])]["weight"].shape[0] for lv in lvls]
    top_first = first_outs == sorted(first_outs)
    ordered = lvls if top_first else list(reversed(lvls))

    params: Dict[str, Any] = {"down": {}, "up": {}, "head": {}}
    for my_level, torch_level in enumerate(ordered):
        params["down"][f"level{my_level}"] = pass_params(down[torch_level])

    # up levels identified by input channel count of the first conv:
    # level l consumes (num_fmaps * f^l) skip + (num_fmaps * f^(l+1)) up
    level_channels = {
        lv: down[torch_lv][min(down[torch_lv])]["weight"].shape[0]
        for lv, torch_lv in enumerate(ordered)
    }
    expected_in = {
        lv: level_channels[lv] + level_channels[lv + 1]
        for lv in range(len(ordered) - 1)
    }
    up_order = sorted(up)
    if not top_first:
        up_order = list(reversed(up_order))
    for torch_lvl, convs in up.items():
        c_in = convs[min(convs)]["weight"].shape[1]
        matches = [lv for lv, ci in expected_in.items() if ci == c_in]
        if len(matches) == 1:
            my_lvl = matches[0]
        elif len(matches) > 1 and len(set(expected_in.values())) == 1:
            # degenerate channel counts (fmap_inc_factor == 1): every up
            # level expects the same input width, so identify positionally
            # in the down path's orientation (funlib pairs r_conv.0.<l>
            # with l_conv.<l>)
            my_lvl = up_order.index(torch_lvl)
        else:
            raise ValueError(
                f"cannot identify up-path level for r_conv.0.{torch_lvl} "
                f"(input channels {c_in}, expected one of {expected_in})"
            )
        params["up"][f"level{my_lvl}"] = pass_params(convs)
    if len(params["up"]) != len(ordered) - 1:
        raise ValueError(
            f"found {len(params['up'])} up-path conv passes, expected "
            f"{len(ordered) - 1}"
        )

    if tconv:
        # constant_upsample=False: one transposed conv per up level, mapping
        # level_channels[lv+1] -> level_channels[lv+1] with kernel = stride =
        # the level's downsampling factor. Identify levels by input channel
        # count (weight shape (C_in, C_out, *K)); degenerate channel counts
        # (fmap_inc_factor == 1) fall back to the positional pairing, same
        # as the up conv passes.
        if len(tconv) != len(ordered) - 1:
            raise ValueError(
                f"found {len(tconv)} transposed-conv upsample levels, "
                f"expected {len(ordered) - 1}"
            )
        expected_tconv_in = {
            lv: level_channels[lv + 1] for lv in range(len(ordered) - 1)
        }
        tconv_order = sorted(tconv)
        if not top_first:
            tconv_order = list(reversed(tconv_order))
        params["up_tconv"] = {}
        for torch_lvl, wb in tconv.items():
            if "weight" not in wb or "bias" not in wb:
                raise ValueError(
                    f"r_up.0.{torch_lvl}.up is missing weight or bias"
                )
            c_in = wb["weight"].shape[0]
            matches = [
                lv for lv, ci in expected_tconv_in.items() if ci == c_in
            ]
            if len(matches) == 1:
                my_lvl = matches[0]
            elif len(matches) > 1 and len(set(expected_tconv_in.values())) == 1:
                my_lvl = tconv_order.index(torch_lvl)
            else:
                raise ValueError(
                    f"cannot identify upsample level for r_up.0.{torch_lvl} "
                    f"(input channels {c_in}, expected one of "
                    f"{expected_tconv_in})"
                )
            params["up_tconv"][f"level{my_lvl}"] = _tconv_to_jax(
                wb["weight"], wb["bias"]
            )

    head_keys = sorted(head)
    if len(head_keys) != 2:
        raise ValueError(f"expected 2 head convs, found {len(head_keys)}")
    params["head"]["conv0"] = _conv_to_jax(
        head[head_keys[0]]["weight"], head[head_keys[0]]["bias"]
    )
    params["head"]["conv1"] = _conv_to_jax(
        head[head_keys[1]]["weight"], head[head_keys[1]]["bias"]
    )
    return params


def load_torch_checkpoint(path: Path) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint into cellulus-tpu state format."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {
        "params": torch_state_dict_to_params(state["model_state_dict"]),
        "iteration": int(state.get("iteration", -1)),
        "lowest_loss": float(state.get("lowest_loss", 1e6)),
        "logger_data": state.get("logger_data", {}),
    }
    return out
