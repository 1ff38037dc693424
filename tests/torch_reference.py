"""A PyTorch replica of the OCE U-Net with funlib-compatible state_dict
naming (``backbone.l_conv.<l>.conv_pass.<i>``, ``backbone.r_conv.0.<j>``,
``head.<i>``).

Used by the tests to (a) validate the JAX model numerically against torch
conv semantics, and (b) produce reference-format ``.pth`` checkpoints to
exercise the checkpoint importer. It intentionally mirrors the architecture
*described* in SURVEY.md C5 (valid [3,1,1,3] conv passes, max-pool down,
nearest upsample, center-crop skip concat, 1x1 head), not any reference
source code.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import torch
import torch.nn as nn


def _conv_nd(ndim):
    return nn.Conv2d if ndim == 2 else nn.Conv3d


def _pool_nd(ndim):
    return nn.MaxPool2d if ndim == 2 else nn.MaxPool3d


class _ConvPass(nn.Module):
    def __init__(self, ndim, c_in, c_out, kernels=(3, 1, 1, 3)):
        super().__init__()
        layers = []
        for k in kernels:
            layers.append(_conv_nd(ndim)(c_in, c_out, k))
            layers.append(nn.ReLU())
            c_in = c_out
        self.conv_pass = nn.Sequential(*layers)

    def forward(self, x):
        return self.conv_pass(x)


class _Upsample(nn.Module):
    """funlib's transposed-conv Upsample: ``.up`` is a ConvTranspose with
    in = out channels and kernel = stride = the level's factor."""

    def __init__(self, ndim, channels, factor):
        super().__init__()
        tconv = nn.ConvTranspose2d if ndim == 2 else nn.ConvTranspose3d
        self.up = tconv(channels, channels, kernel_size=factor, stride=factor)

    def forward(self, x):
        return self.up(x)


class _Backbone(nn.Module):
    def __init__(
        self,
        ndim,
        in_channels,
        num_fmaps,
        inc,
        factors,
        num_fmaps_out,
        constant_upsample=True,
    ):
        super().__init__()
        self.ndim = ndim
        self.factors = [tuple(f) for f in factors]
        self.constant_upsample = constant_upsample
        L = len(factors)
        chans = [num_fmaps * inc**l for l in range(L + 1)]
        self.l_conv = nn.ModuleList()
        c_prev = in_channels
        for l in range(L + 1):
            self.l_conv.append(_ConvPass(ndim, c_prev, chans[l]))
            c_prev = chans[l]
        if not constant_upsample:
            self.r_up = nn.ModuleList(
                [
                    nn.ModuleList(
                        [
                            _Upsample(ndim, chans[l + 1], self.factors[l])
                            for l in range(L)
                        ]
                    )
                ]
            )
        self.r_conv = nn.ModuleList(
            [
                nn.ModuleList(
                    [
                        _ConvPass(
                            ndim,
                            chans[l] + chans[l + 1],
                            num_fmaps_out if l == 0 else chans[l],
                        )
                        for l in range(L)
                    ]
                )
            ]
        )

    def forward(self, x):
        skips = []
        for l in range(len(self.factors)):
            x = self.l_conv[l](x)
            skips.append(x)
            x = _pool_nd(self.ndim)(self.factors[l])(x)
        x = self.l_conv[len(self.factors)](x)
        for l in reversed(range(len(self.factors))):
            if self.constant_upsample:
                for axis, f in enumerate(self.factors[l]):
                    x = x.repeat_interleave(f, dim=2 + axis)
            else:
                x = self.r_up[0][l](x)
            skip = skips[l]
            crops = [
                (s - t) // 2
                for s, t in zip(skip.shape[2:], x.shape[2:])
            ]
            sl = (slice(None), slice(None)) + tuple(
                slice(c, c + t) for c, t in zip(crops, x.shape[2:])
            )
            x = torch.cat([skip[sl], x], dim=1)
            x = self.r_conv[0][l](x)
        return x


class TorchOCEModel(nn.Module):
    """Reference-shaped model: backbone UNet + 2-layer 1x1 head."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_fmaps: int,
        fmap_inc_factor: int,
        features_in_last_layer: int,
        downsampling_factors: List[Tuple[int, ...]],
        num_spatial_dims: int,
        constant_upsample: bool = True,
    ):
        super().__init__()
        self.backbone = _Backbone(
            num_spatial_dims,
            in_channels,
            num_fmaps,
            fmap_inc_factor,
            downsampling_factors,
            features_in_last_layer,
            constant_upsample=constant_upsample,
        )
        conv = _conv_nd(num_spatial_dims)
        self.head = nn.Sequential(
            conv(features_in_last_layer, features_in_last_layer, 1),
            nn.ReLU(),
            conv(features_in_last_layer, out_channels, 1),
        )

    def forward(self, x):
        return self.head(self.backbone(x))


def copy_jax_params_to_torch(params, model: TorchOCEModel) -> None:
    """Load a cellulus-tpu params pytree into the torch replica."""

    def to_torch(conv_params, conv: nn.Module):
        w = np.asarray(conv_params["w"])  # (*K, C_in, C_out)
        k = w.ndim - 2
        perm = (k + 1, k) + tuple(range(k))
        conv.weight.data = torch.from_numpy(
            np.ascontiguousarray(w.transpose(perm))
        )
        conv.bias.data = torch.from_numpy(np.array(conv_params["b"], copy=True))

    L = len(model.backbone.factors)
    for l in range(L + 1):
        pass_params = params["down"][f"level{l}"]
        seq = model.backbone.l_conv[l].conv_pass
        for i in range(4):
            to_torch(pass_params[f"conv{i}"], seq[2 * i])
    if "up_tconv" in params:
        for l in range(L):
            tp = params["up_tconv"][f"level{l}"]
            w = np.asarray(tp["w"])  # (*K, C_in, C_out) -> (C_in, C_out, *K)
            k = w.ndim - 2
            perm = (k, k + 1) + tuple(range(k))
            tconv = model.backbone.r_up[0][l].up
            tconv.weight.data = torch.from_numpy(
                np.ascontiguousarray(w.transpose(perm))
            )
            tconv.bias.data = torch.from_numpy(np.array(tp["b"], copy=True))
    for l in range(L):
        pass_params = params["up"][f"level{l}"]
        seq = model.backbone.r_conv[0][l].conv_pass
        for i in range(4):
            to_torch(pass_params[f"conv{i}"], seq[2 * i])
    to_torch(params["head"]["conv0"], model.head[0])
    to_torch(params["head"]["conv1"], model.head[2])
