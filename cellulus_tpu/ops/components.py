"""Connected components and size filtering.

Replaces ``skimage.measure.label`` / reference ``utils/misc.py:11-25``.
Semantics: full connectivity (8 in 2D, 26 in 3D), components of *different*
input ids stay separate, labels relabeled consecutively from 1 ordered by
(input id, raster order of the component's first pixel) — identical to
looping ``ndi.label`` over each distinct value.

Two implementations with identical outputs (parity-tested):

- :func:`label_host` — scipy ``ndi.label`` once per distinct value. O(#ids)
  full-image passes on the host; kept as the parity oracle.
- :func:`label` — on-device single-pass kernel: per-pixel parent pointers
  initialised to the pixel's own flat index, then a ``lax.while_loop`` that
  alternates equal-value neighbor-min propagation (8/26 shifted compares,
  pure VPU work) with pointer jumping (``p <- p[p]``, a flat gather) until
  fixpoint. Parent values only ever decrease and ``p[i] <= i`` is invariant,
  so the fixpoint maps every pixel of a component to the component's
  *minimum* flat index — which is exactly its first pixel in raster order,
  giving the host ordering for free. One device dispatch per image instead
  of #ids host passes (the detect/segment hot-loop fix, VERDICT round 1
  item 2).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import numpy as np
from scipy import ndimage as ndi


def label_host(array: np.ndarray) -> np.ndarray:
    """Host (scipy) connected-component labeling; parity oracle for
    :func:`label`."""
    structure = np.ones((3,) * array.ndim, dtype=bool)
    out = np.zeros(array.shape, dtype=np.int32)
    next_label = 0
    for value in np.unique(array):
        if value == 0:
            continue
        comp, n = ndi.label(array == value, structure=structure)
        mask = comp > 0
        out[mask] = comp[mask] + next_label
        next_label += n
    return out


def cc_parents(values, jump_steps: int = 1, full_connectivity: bool = True):
    """Traceable connected-components body: ``values (int32, *shape) ->
    parents (int32, *shape)`` where background pixels map to the sentinel
    ``N = prod(shape)`` and every foreground pixel maps to its component's
    minimum flat index. Composable inside larger jitted programs.

    ``full_connectivity=False`` restricts merging to axis neighbors
    (4-connectivity in 2D / 6 in 3D — scipy's default ``binary_fill_holes``
    structure, used by the nucleus hole-fill kernel).

    Each round propagates the running minimum (a) along entire equal-value
    RUNS per axis via segmented min-scans (``lax.associative_scan``,
    O(log n) depth — a straight run of any length resolves in one round,
    vs one pixel per round for plain neighbor propagation), (b) across
    diagonal neighbors, then (c) through one pointer-jumping step
    (``p <- p[p]``). Rounds needed ~ number of "turns" in the most serpentine
    component, not its diameter.
    """
    import jax
    import jax.numpy as jnp

    shape = values.shape
    ndim = len(shape)
    N = math.prod(shape)
    # diagonal-ish shifts: >= 2 non-center components (axis-aligned ones are
    # covered by the segmented scans); pad-slice offsets in {0,1,2}^D
    diag_offsets = [
        off
        for off in np.ndindex(*(3,) * ndim)
        if sum(o != 1 for o in off) >= 2
    ]

    idx = jnp.arange(N, dtype=jnp.int32).reshape(shape)
    mask = values != 0
    parent0 = jnp.where(mask, idx, N)
    v_pad = jnp.pad(values, 1, constant_values=0)

    def seg_op(a, b):
        # segmented-min semigroup: (flagB & flagA, flagB ? min : valB)
        fa, va = a
        fb, vb = b
        return fa & fb, jnp.where(fb, jnp.minimum(va, vb), vb)

    def shifted_equal(axis, forward):
        """same[i] = values[i] == values[i -/+ 1] (and both foreground)."""
        off = [1] * ndim
        off[axis] = 0 if forward else 2
        sl = tuple(slice(o, o + s) for o, s in zip(off, shape))
        return (v_pad[sl] == values) & mask

    def axis_scans(p):
        for axis in range(ndim):
            same_f = shifted_equal(axis, True)
            _, p = jax.lax.associative_scan(seg_op, (same_f, p), axis=axis)
            same_b = shifted_equal(axis, False)
            _, p = jax.lax.associative_scan(
                seg_op, (same_b, p), axis=axis, reverse=True
            )
        return p

    def diag_min(parent):
        p_pad = jnp.pad(parent, 1, constant_values=N)
        best = parent
        for off in diag_offsets:
            sl = tuple(slice(o, o + s) for o, s in zip(off, shape))
            same = (v_pad[sl] == values) & mask
            best = jnp.where(same, jnp.minimum(best, p_pad[sl]), best)
        return best

    def body(state):
        parent, _ = state
        p = axis_scans(parent)
        if full_connectivity:
            p = diag_min(p)
        # pointer jumping: p <- p[p] (flat gather; sentinel row appended)
        for _ in range(jump_steps):
            pf = jnp.concatenate([p.ravel(), jnp.full((1,), N, jnp.int32)])
            p = pf[p]
        return p, jnp.any(p != parent)

    parent, _ = jax.lax.while_loop(
        lambda s: s[1], body, (parent0, jnp.bool_(True))
    )
    return parent


@lru_cache(maxsize=None)
def _cc_kernel(shape: tuple, jump_steps: int = 2):
    """Jitted :func:`cc_parents` for one shape."""
    import jax

    return jax.jit(partial(cc_parents, jump_steps=jump_steps))


def _relabel_from_parents(
    values_flat: np.ndarray, parents_flat: np.ndarray, N: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compact parent indices to consecutive labels ordered by
    (input id, component min flat index).

    Returns ``(labels_flat int32, component_sizes, component_input_ids)``
    with ``component_sizes[k]`` the pixel count of label ``k+1``.
    """
    # all O(N) table lookups: roots are flat indices in [0, N]
    root_counts = np.bincount(parents_flat, minlength=N + 1)
    uniq = np.flatnonzero(root_counts[:N]).astype(np.int64)  # sorted roots
    vals = values_flat[uniq]
    order = np.lexsort((uniq, vals))
    rank_of_root = np.zeros(N + 1, np.int32)  # sentinel/bg -> 0
    rank_of_root[uniq[order]] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    labels_flat = rank_of_root[parents_flat]
    sizes = np.empty(len(uniq), np.int64)
    sizes[rank_of_root[uniq] - 1] = root_counts[uniq]
    ids = np.empty(len(uniq), values_flat.dtype)
    ids[rank_of_root[uniq] - 1] = vals
    return labels_flat, sizes, ids


def label(array: np.ndarray) -> np.ndarray:
    """Connected-component labeling of ``array != 0`` with full connectivity
    (device kernel; output identical to :func:`label_host`)."""
    values = np.ascontiguousarray(array, dtype=np.int32)
    parents = np.asarray(_cc_kernel(values.shape)(values))
    labels_flat, _, _ = _relabel_from_parents(
        values.ravel(), parents.ravel(), values.size
    )
    return labels_flat.reshape(array.shape)


def filter_relabel_device(parents_flat, values_at_parent_flat, min_size: int):
    """Traceable device epilogue: drop components below ``min_size`` pixels
    and relabel survivors consecutively — identical output to
    :func:`filter_relabel_from_parents`, but composable inside one jitted
    program so only the final uint16 labels ever cross the PCIe/tunnel link
    (host epilogue: 2 x N int32 down; this: N uint16 down).

    Args:
        parents_flat: ``(N,)`` int32 root flat-indices in ``[0, N]``
            (sentinel ``N`` = background; roots point to themselves).
        values_at_parent_flat: ``(N,)`` integer input id at each pixel's
            root (0 for background).
        min_size: static pixel-count threshold.

    Returns:
        ``(N,)`` uint16 labels, consecutive from 1 in
        ``(input id, component min flat index)`` order over survivors.
    """
    import jax.numpy as jnp

    N = parents_flat.shape[0]
    counts = (
        jnp.zeros((N + 1,), jnp.int32).at[parents_flat].add(1).at[N].set(0)
    )
    valid = (counts > 0) & (counts >= min_size)
    # value at index r IF r is a root: roots are their own parent, so the
    # per-pixel root-value array is correct at root positions
    vals_root = jnp.concatenate(
        [
            values_at_parent_flat.astype(jnp.int32),
            jnp.zeros((1,), jnp.int32),
        ]
    )
    # rank survivors by (input id, root index): a STABLE sort on the value
    # alone preserves index order among ties — same order as
    # _relabel_from_parents' lexsort((uniq, vals)) restricted to keepers.
    # Invalid entries sort last via a sentinel above any uint16/int id.
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    key = jnp.where(valid, vals_root, sentinel)
    order = jnp.argsort(key, stable=True)
    valid_sorted = valid[order]
    ranks = jnp.cumsum(valid_sorted.astype(jnp.int32))
    rank_of_root = (
        jnp.zeros((N + 1,), jnp.int32)
        .at[order]
        .set(jnp.where(valid_sorted, ranks, 0))
    )
    return rank_of_root[parents_flat].astype(jnp.uint16)


def filter_relabel_from_parents(
    values_flat: np.ndarray, parents_flat: np.ndarray, min_size: int
) -> np.ndarray:
    """Host epilogue of :func:`size_filter` for precomputed parents: drop
    components below ``min_size`` pixels and relabel survivors consecutively
    (order preserved = ``label()`` of the filtered image). ``values_flat``
    only needs to be correct at root indices (``values[parents]`` works)."""
    labels_flat, sizes, _ = _relabel_from_parents(
        values_flat, parents_flat, len(parents_flat)
    )
    keep = sizes >= min_size
    remap = np.zeros(len(sizes) + 1, np.int32)
    remap[1:][keep] = np.arange(1, int(keep.sum()) + 1, dtype=np.int32)
    return remap[labels_flat]


def size_filter(
    segmentation: np.ndarray, min_size: int, filter_non_connected: bool = True
) -> np.ndarray:
    """Drop components smaller than ``min_size`` pixels, then relabel
    (reference ``utils/misc.py:11-25``).

    With ``filter_non_connected`` (the reference default) this is one device
    labeling pass: removing whole connected components cannot change the
    connectivity of the survivors, so the final ``label()`` of the filtered
    image equals the first labeling with small components dropped and ranks
    compacted.
    """
    if min_size == 0:
        return segmentation

    values = np.ascontiguousarray(segmentation, dtype=np.int32)
    parents = np.asarray(_cc_kernel(values.shape)(values)).ravel()

    if filter_non_connected:
        return filter_relabel_from_parents(
            values.ravel(), parents, min_size
        ).reshape(segmentation.shape)

    # filter_non_connected=False: sizes per ORIGINAL id decide survival;
    # components inherit their id's verdict
    labels_flat, sizes, comp_ids = _relabel_from_parents(
        values.ravel(), parents, values.size
    )
    ids, id_sizes = np.unique(values[values != 0], return_counts=True)
    id_keep = dict(zip(ids.tolist(), (id_sizes >= min_size).tolist()))
    keep = np.fromiter(
        (id_keep[int(i)] for i in comp_ids), bool, len(comp_ids)
    )

    # map: dropped -> 0, survivors -> consecutive ranks (order preserved,
    # which matches label() on the filtered image)
    remap = np.zeros(len(sizes) + 1, np.int32)
    remap[1:][keep] = np.arange(1, int(keep.sum()) + 1, dtype=np.int32)
    return remap[labels_flat].reshape(segmentation.shape)
