"""Persist / restore study checkpoints across host reboots.

The study workdirs keep their checkpoints in gitignored ``models/``
directories (optimizer state makes them large); two round-3 host reboots
wiped every one of them and killed the checkpoint-vs-F1 experiments
(NOTES.md sessions 3/5). This tool makes the *minimal retrainable state*
git-committable:

- ``persist <workdir>``: copy ``models/best_loss.ckpt`` and every numbered
  checkpoint into a git-tracked ``<workdir>/ckpt/`` directory, STRIPPED to
  params + iteration + lowest_loss (no optimizer moments, no logger
  history — a 24-fmap study checkpoint shrinks ~3x; scoring and
  resume-for-scoring only need params).
- ``restore <workdir>``: repopulate an empty ``models/`` from ``ckpt/``.
  Training resume from a stripped checkpoint reinitializes Adam moments
  with an explicit warning (``cellulus_tpu.train.unpack_opt_state``) —
  acceptable for finished runs (resume is then a no-op past
  max_iterations) and recorded for interrupted ones.

With ``--final`` only ``best_loss.ckpt`` and the highest numbered
checkpoint are persisted, and float params are cast to float16 — the
smallest state from which a later session can score or warm-start without
retraining (disaster recovery, not a bit-exact archive).

Usage: python scripts/ckpt_tools.py {persist|restore} [--final] <workdir> [...]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

KEEP_KEYS = ("iteration", "lowest_loss", "params")


def strip_state(state: dict, cast_f16: bool = False) -> dict:
    out = {k: state[k] for k in KEEP_KEYS if k in state}
    if cast_f16 and "params" in out:
        import numpy as np
        import jax

        out["params"] = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float16)
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else np.asarray(a),
            out["params"],
        )
    return out


def _holds_f16(ckpt_path: Path) -> bool:
    """True when a persisted checkpoint's float params were f16-cast."""
    import jax
    import numpy as np

    from cellulus_tpu.utils.checkpoint import load_checkpoint

    leaves = jax.tree_util.tree_leaves(load_checkpoint(ckpt_path).get("params", {}))
    return any(np.asarray(leaf).dtype == np.float16 for leaf in leaves)


def persist(workdir: Path, final_only: bool = False) -> int:
    from cellulus_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    models = workdir / "models"
    out = workdir / "ckpt"
    n = 0
    if not models.is_dir():
        return 0
    srcs = sorted(models.glob("*.ckpt"))
    if final_only:
        numbered = [p for p in srcs if p.stem.isdigit()]
        srcs = [p for p in srcs if p.name == "best_loss.ckpt"]
        if numbered:
            srcs.append(max(numbered, key=lambda p: int(p.stem)))
    for src in srcs:
        dst = out / src.name
        if dst.exists() and dst.stat().st_mtime >= src.stat().st_mtime:
            # up-to-date AND at least the requested precision: a full-
            # precision dst satisfies --final too, but an earlier --final
            # (f16) dst must NOT satisfy a later full-precision persist
            if final_only or not _holds_f16(dst):
                continue
        dst.parent.mkdir(parents=True, exist_ok=True)
        save_checkpoint(dst, strip_state(load_checkpoint(src), cast_f16=final_only))
        n += 1
    return n


def restore(workdir: Path) -> int:
    import shutil

    src_dir = workdir / "ckpt"
    models = workdir / "models"
    n = 0
    if not src_dir.is_dir():
        return 0
    models.mkdir(parents=True, exist_ok=True)
    for src in sorted(src_dir.glob("*.ckpt")):
        dst = models / src.name
        if dst.exists():
            continue
        shutil.copy2(src, dst)
        n += 1
    return n


def main() -> None:
    argv = list(sys.argv[1:])
    final_only = "--final" in argv
    argv = [a for a in argv if a != "--final"]
    if len(argv) < 2 or argv[0] not in ("persist", "restore"):
        raise SystemExit(__doc__)
    for arg in argv[1:]:
        wd = Path(arg)
        n = persist(wd, final_only) if argv[0] == "persist" else restore(wd)
        print(f"{argv[0]} {wd}: {n} checkpoint(s)")


if __name__ == "__main__":
    main()
