"""Checkpoint save/load.

Semantics mirror the reference's torch-pickle checkpoints
(reference ``train.py:126-149,183-191``): a state dict holding ``iteration``,
``lowest_loss``, model params, optimizer state and logger history, written as
``models/best_loss.ckpt`` / ``models/NNNNNN.ckpt``. Serialization uses
flax's msgpack (pytree-native, no pickle).

Reference PyTorch ``.pth`` checkpoints load transparently through
:mod:`cellulus_tpu.models.torch_import`.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: Path, state: Dict[str, Any]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = serialization.msgpack_serialize(_to_numpy(state))
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(payload)
    os.replace(tmp, path)


def load_checkpoint(path: Path) -> Dict[str, Any]:
    """Load a checkpoint; dispatches on format.

    ``.pth`` files (reference torch checkpoints) are converted via
    :func:`cellulus_tpu.models.torch_import.load_torch_checkpoint`.
    """
    path = Path(path)
    if path.suffix == ".pth":
        from ..models.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path)
    try:
        return serialization.msgpack_restore(path.read_bytes())
    except Exception as e:
        raise ValueError(
            f"corrupt or truncated checkpoint {path} "
            f"({type(e).__name__}: {e}); if this was written by the "
            "reference implementation, name it with a .pth suffix"
        ) from e


def save_model(
    state: Dict[str, Any], iteration: int, is_lowest: bool = False, out_dir="models"
) -> Path:
    """Reference-parity naming (``train.py:183-191``)."""
    out = Path(out_dir)
    if is_lowest:
        path = out / "best_loss.ckpt"
    else:
        path = out / (str(iteration).zfill(6) + ".ckpt")
    save_checkpoint(path, state)
    return path
