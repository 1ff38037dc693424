"""The EXACT state_dict layout of a genuine reference checkpoint.

The reference's backbone is ``funlib.learn.torch.models.UNet`` pinned at
commit f36decaf (reference ``pyproject.toml:30``), wrapped by
``cellulus/models/unet.py:24-63`` (``self.backbone = UNet(...)`` plus a
2-conv ``self.head`` Sequential). This module generates, from first
principles, the key->shape mapping ``UNetModel(...).state_dict()`` emits,
derived from the funlib UNet's public module structure:

- ``UNet.l_conv``: ``ModuleList`` of ``ConvPass``, one per level
  (``num_levels = len(downsample_factors) + 1``); level 0 is the TOP
  (input) level. ConvPass ``v`` maps ``in_channels`` (v=0) or
  ``num_fmaps * fmap_inc_factor**(v-1)`` to ``num_fmaps *
  fmap_inc_factor**v``.
- ``UNet.l_down``: ``ModuleList`` of max-pool ``Downsample`` modules —
  parameterless, contributes NO state_dict entries.
- ``UNet.r_up``: ``ModuleList`` (per head) of ``ModuleList`` of
  ``Upsample``. The reference passes ``constant_upsample=True``, selecting
  nearest-neighbor ``torch.nn.Upsample`` — parameterless, NO entries.
  (With ``constant_upsample=False`` funlib uses a transposed conv, which
  WOULD add ``r_up.<h>.<v>.up.weight/bias`` keys; the importer must refuse
  such checkpoints rather than silently dropping the upsample weights.)
- ``UNet.r_conv``: ``ModuleList`` (per head; the reference uses 1 head) of
  ``ModuleList`` of ``ConvPass``; ``r_conv[h][v]`` consumes the
  concatenation of the level-``v`` skip (``num_fmaps * f**v``) and the
  upsampled level-``v+1`` output (``num_fmaps * f**(v+1)``), producing
  ``num_fmaps * f**v`` except at v=0 where ``num_fmaps_out``
  (= ``features_in_last_layer``) applies.
- ``ConvPass.conv_pass``: a ``Sequential`` of alternating ConvNd /
  activation, so with the reference's ``kernel_size_down/up =
  [3,1,1,3]``-per-level the conv entries sit at indices 0, 2, 4, 6:
  ``conv_pass.{0,2,4,6}.weight`` of shape ``(C_out, C_in, *K)`` and
  matching ``.bias`` of shape ``(C_out,)``. The first conv maps
  ``C_in -> C_out``; the remaining convs ``C_out -> C_out``.
- the wrapper's ``head``: ``Sequential(Conv(fil, fil, 1), ReLU(),
  Conv(fil, out_channels, 1))`` -> ``head.0.*`` and ``head.2.*``.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

KERNELS = (3, 1, 1, 3)  # reference kernel_size_down/up per level


def expected_funlib_keys(
    in_channels: int,
    out_channels: int,
    num_fmaps: int,
    fmap_inc_factor: int,
    features_in_last_layer: int,
    downsampling_factors: List[Tuple[int, ...]],
    num_spatial_dims: int,
    constant_upsample: bool = True,
) -> Dict[str, Tuple[int, ...]]:
    """Key -> weight/bias shape for ``UNetModel(...).state_dict()``.

    With ``constant_upsample=False``, funlib's ``Upsample`` holds a
    ``ConvTranspose`` at ``r_up.<h>.<v>.up`` with in = out = the
    level-``v+1`` channel count and kernel = stride = the level's
    downsampling factor; torch ConvTranspose weights are shaped
    ``(C_in, C_out, *K)``.
    """
    L = len(downsampling_factors)
    chans = [num_fmaps * fmap_inc_factor**v for v in range(L + 1)]
    out: Dict[str, Tuple[int, ...]] = {}

    def conv_pass(prefix: str, c_in: int, c_out: int) -> None:
        seq_idx = 0
        for k in KERNELS:
            kshape = (k,) * num_spatial_dims
            out[f"{prefix}.conv_pass.{seq_idx}.weight"] = (c_out, c_in) + kshape
            out[f"{prefix}.conv_pass.{seq_idx}.bias"] = (c_out,)
            c_in = c_out
            seq_idx += 2  # the activation module occupies the odd slots

    c_prev = in_channels
    for v in range(L + 1):
        conv_pass(f"backbone.l_conv.{v}", c_prev, chans[v])
        c_prev = chans[v]
    for v in range(L):
        if not constant_upsample:
            c_up = chans[v + 1]
            out[f"backbone.r_up.0.{v}.up.weight"] = (c_up, c_up) + tuple(
                downsampling_factors[v]
            )
            out[f"backbone.r_up.0.{v}.up.bias"] = (c_up,)
        conv_pass(
            f"backbone.r_conv.0.{v}",
            chans[v] + chans[v + 1],
            features_in_last_layer if v == 0 else chans[v],
        )
    ones = (1,) * num_spatial_dims
    fil = features_in_last_layer
    out["head.0.weight"] = (fil, fil) + ones
    out["head.0.bias"] = (fil,)
    out["head.2.weight"] = (out_channels, fil) + ones
    out["head.2.bias"] = (out_channels,)
    return out
