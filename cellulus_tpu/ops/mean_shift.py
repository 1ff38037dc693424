"""On-device mean-shift clustering with sklearn-compatible semantics.

Replaces the reference's host-CPU ``sklearn.cluster.MeanShift``
(reference ``utils/mean_shift.py:60-76``) with a jitted fixed-shape
implementation designed for the MXU: every iteration computes all
seed-to-point distances as one batched matmul (``|s|^2 + |x|^2 - 2 s.x``)
accumulated over point chunks, updating all seeds in parallel with per-seed
convergence freezing.

Replicated sklearn behaviors (validated by parity tests against sklearn):

- flat kernel, ball query inclusive (``dist <= bandwidth``),
- per-seed iteration until shift < 1e-3 * bandwidth or ``max_iter``,
- seeds whose ball is empty are dropped,
- bin seeding (``get_bin_seeds`` with ``bin_size = bandwidth``,
  ``min_bin_freq = 1``) when no explicit seeds are given,
- duplicate-center suppression: sort by ball population (descending), keep a
  center and suppress all others within ``bandwidth``,
- ``cluster_all=False`` orphan handling: points farther than ``bandwidth``
  from every center get label ``-1``,
- fit on a ``reduction_probability`` subsample, predict on all points
  (reference ``utils/mean_shift.py:67-76``).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def bin_seeds(X: np.ndarray, bin_size: float, min_bin_freq: int = 1) -> np.ndarray:
    """sklearn ``get_bin_seeds``: occupied-grid-cell centers at ``bin_size``."""
    if bin_size == 0:
        return X
    binned = np.round(X / bin_size)
    uniq, counts = np.unique(binned, axis=0, return_counts=True)
    return (uniq[counts >= min_bin_freq] * bin_size).astype(X.dtype)


def _fit_impl(
    X: jnp.ndarray,  # (N, d) zero-padded
    x_valid: jnp.ndarray,  # (N,) bool
    seeds: jnp.ndarray,  # (S, d) zero-padded
    s_valid: jnp.ndarray,  # (S,) bool
    bandwidth: jnp.ndarray,  # scalar
    max_iter: int,
    chunk: int,
    use_pallas: bool = False,
):
    N, d = X.shape
    S = seeds.shape[0]
    n_chunks = N // chunk
    bw2 = bandwidth * bandwidth
    x_norm2 = jnp.sum(X * X, axis=1)  # (N,)

    if use_pallas:
        from .pallas_mean_shift import ball_stats_padded, make_padded_point_set

        xp, xp_norm, xp_valid = make_padded_point_set(X, x_valid)

        def ball_stats(centers):
            return ball_stats_padded(
                centers, d, xp, xp_norm, xp_valid, bw2
            )

    else:

        def ball_stats(centers):
            """counts (S,), sums (S, d) of valid points with dist <= bw."""
            c_norm2 = jnp.sum(centers * centers, axis=1)  # (S,)

            def body(i, acc):
                counts, sums = acc
                sl = jax.lax.dynamic_slice_in_dim(X, i * chunk, chunk, axis=0)
                sl_norm2 = jax.lax.dynamic_slice_in_dim(
                    x_norm2, i * chunk, chunk
                )
                sl_valid = jax.lax.dynamic_slice_in_dim(
                    x_valid, i * chunk, chunk
                )
                # (S, chunk) squared distances via MXU matmul
                cross = jnp.dot(
                    centers, sl.T, preferred_element_type=jnp.float32
                )
                d2 = c_norm2[:, None] + sl_norm2[None, :] - 2.0 * cross
                within = (d2 <= bw2) & sl_valid[None, :]
                w = within.astype(jnp.float32)
                counts = counts + jnp.sum(w, axis=1)
                sums = sums + jnp.dot(
                    w, sl, preferred_element_type=jnp.float32
                )
                return counts, sums

            counts0 = jnp.zeros((S,), jnp.float32)
            sums0 = jnp.zeros((S, d), jnp.float32)
            return jax.lax.fori_loop(0, n_chunks, body, (counts0, sums0))

    stop_thresh = 1e-3 * bandwidth

    def cond(state):
        centers, n_final, frozen, it = state
        return (it < max_iter) & ~jnp.all(frozen)

    def step(state):
        centers, n_final, frozen, it = state
        counts, sums = ball_stats(centers)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        empty = counts == 0
        shift = jnp.linalg.norm(means - centers, axis=1)
        newly_done = empty | (shift < stop_thresh)
        new_centers = jnp.where(
            (frozen | empty)[:, None], centers, means
        )
        n_final = jnp.where(frozen, n_final, counts)
        frozen = frozen | newly_done
        return new_centers, n_final, frozen, it + 1

    frozen0 = ~s_valid
    init = (seeds, jnp.zeros((S,), jnp.float32), frozen0, jnp.int32(0))
    centers, n_final, frozen, _ = jax.lax.while_loop(cond, step, init)

    # seeds never frozen (hit max_iter): record their final ball population
    counts, _ = ball_stats(centers)
    n_final = jnp.where(frozen, n_final, counts)

    # drop empty / invalid seeds
    keep = s_valid & (n_final > 0)

    # sklearn dedupe: sort by (population, center coords) lexicographically
    # descending (sklearn sorts center_intensity_dict items with
    # ``key=lambda tup: (tup[1], tup[0]), reverse=True``), then greedily keep
    # a center and suppress everything within `bandwidth` of it
    sort_counts = jnp.where(keep, n_final, -1.0)
    lex_keys = [-centers[:, d_] for d_ in reversed(range(d))] + [-sort_counts]
    order = jnp.lexsort(lex_keys)
    sc = centers[order]
    s_keep = keep[order]
    d2_ss = (
        jnp.sum(sc * sc, axis=1)[:, None]
        + jnp.sum(sc * sc, axis=1)[None, :]
        - 2.0 * jnp.dot(sc, sc.T, preferred_element_type=jnp.float32)
    )
    neighbor = d2_ss <= bw2  # (S, S) inclusive, like sklearn radius query

    def dedupe_body(i, unique):
        is_active = unique[i]
        # an active center suppresses all other centers within bandwidth...
        unique = jnp.where(neighbor[i] & is_active, False, unique)
        # ...but stays kept itself
        return unique.at[i].set(is_active)

    unique0 = s_keep
    unique = jax.lax.fori_loop(0, S, dedupe_body, unique0)
    return sc, unique


_fit_kernel = jax.jit(
    _fit_impl, static_argnames=("max_iter", "chunk", "use_pallas")
)


def _predict_impl(
    X: jnp.ndarray,  # (N, d) zero-padded
    centers: jnp.ndarray,  # (S, d)
    center_valid: jnp.ndarray,  # (S,)
    bandwidth: jnp.ndarray,
    chunk: int,
):
    """Label each point with the nearest valid center (compact ids), or -1
    if farther than ``bandwidth`` from all centers (cluster_all=False)."""
    N, d = X.shape
    S = centers.shape[0]
    n_chunks = N // chunk
    bw2 = bandwidth * bandwidth
    # compact ids in center order (sklearn: labels index sorted unique centers)
    compact = jnp.cumsum(center_valid.astype(jnp.int32)) - 1
    c_norm2 = jnp.sum(centers * centers, axis=1)
    masked_c_norm2 = jnp.where(center_valid, c_norm2, jnp.inf)

    def body(i, labels):
        sl = jax.lax.dynamic_slice_in_dim(X, i * chunk, chunk, axis=0)
        cross = jnp.dot(sl, centers.T, preferred_element_type=jnp.float32)
        d2 = (
            jnp.sum(sl * sl, axis=1)[:, None]
            + masked_c_norm2[None, :]
            - 2.0 * cross
        )
        nearest = jnp.argmin(d2, axis=1)
        best_d2 = jnp.take_along_axis(d2, nearest[:, None], axis=1)[:, 0]
        lab = jnp.where(best_d2 <= bw2, compact[nearest], -1)
        return jax.lax.dynamic_update_slice_in_dim(labels, lab, i * chunk, axis=0)

    labels0 = jnp.full((N,), -1, jnp.int32)
    return jax.lax.fori_loop(0, n_chunks, body, labels0)


_predict_kernel = jax.jit(_predict_impl, static_argnames=("chunk",))


@partial(
    jax.jit,
    static_argnames=("max_iter", "chunk_fit", "chunk_pred", "use_pallas"),
)
def _fit_predict_kernel(
    X_fit: jnp.ndarray,  # (Nf, d) zero-padded
    fit_valid: jnp.ndarray,  # (Nf,)
    seeds: jnp.ndarray,  # (S, d) zero-padded
    s_valid: jnp.ndarray,  # (S,)
    X_all: jnp.ndarray,  # (N, d) zero-padded
    bandwidth: jnp.ndarray,
    max_iter: int,
    chunk_fit: int,
    chunk_pred: int,
    use_pallas: bool = False,
):
    """Fused fit + predict: ONE device dispatch per clustering problem
    (the staged kernels cost two tunnel round-trips each; VERDICT round 1
    item 2). Returns ``labels + 1`` as uint16 — background/orphans are 0 —
    halving the device->host label transfer."""
    centers, valid = _fit_impl(
        X_fit, fit_valid, seeds, s_valid, bandwidth, max_iter, chunk_fit,
        use_pallas,
    )
    labels = _predict_impl(X_all, centers, valid, bandwidth, chunk_pred)
    return (labels + 1).astype(jnp.uint16)


def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + a.shape[1:], dtype=a.dtype)
    out[: len(a)] = a
    return out


def _use_pallas(requested: Optional[bool] = None) -> bool:
    """Pallas fit kernel is OPT-IN (``inference_config.pallas_mean_shift``
    or, when that is None, CELLULUS_TPU_PALLAS=1): on trained embeddings at
    bench scale the XLA chunked-matmul fit measured ~2.7x faster than the
    Pallas ball kernel (0.063s vs 0.172s per sample, 87k fit points / 256
    seeds) — the MXU matmul path wins when S is small. The kernel stays for
    large-S regimes and as a Pallas reference."""
    from ..utils.env import env_flag

    if requested is None:
        requested = env_flag("CELLULUS_TPU_PALLAS")
    if not requested:
        return False
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def mean_shift_fit_predict(
    X: np.ndarray,
    bandwidth: float,
    seeds: Optional[np.ndarray],
    reduction_probability: float = 1.0,
    max_iter: int = 300,
    rng: Optional[np.random.Generator] = None,
    use_pallas: Optional[bool] = None,
) -> np.ndarray:
    """Fit on a subsample, predict labels for all rows of ``X``.

    ``use_pallas``: Pallas ball-kernel fit; ``None`` defers to the
    CELLULUS_TPU_PALLAS env var (see :func:`_use_pallas`).

    Returns int32 labels in ``[0, K)`` or ``-1`` for orphans.
    """
    X = np.asarray(X, dtype=np.float32)
    n, d = X.shape
    if n == 0:
        return np.zeros((0,), np.int32)

    if reduction_probability < 1.0:
        rng = rng or np.random.default_rng()
        X_fit = X[rng.random(n) < reduction_probability]
        if len(X_fit) == 0:
            X_fit = X
    else:
        X_fit = X

    if seeds is None:
        seeds = bin_seeds(X_fit, bin_size=bandwidth)
    seeds = np.asarray(seeds, dtype=np.float32)
    if len(seeds) == 0:
        return np.full((n,), -1, np.int32)

    N_pad = _next_pow2(max(len(X_fit), 256))
    S_pad = _next_pow2(max(len(seeds), 64))
    chunk = max(256, min(1 << 18, (1 << 26) // S_pad, N_pad))
    while N_pad % chunk:
        chunk //= 2
    Np_pad = _next_pow2(max(n, 256))
    chunk_p = max(256, min(1 << 18, (1 << 26) // S_pad, Np_pad))
    while Np_pad % chunk_p:
        chunk_p //= 2

    from ..utils.profiling import time_device

    labels_u16 = time_device(
        "detect.device",
        _fit_predict_kernel,
        jnp.asarray(_pad_rows(X_fit, N_pad)),
        jnp.asarray(_pad_rows(np.ones(len(X_fit), bool), N_pad)),
        jnp.asarray(_pad_rows(seeds, S_pad)),
        jnp.asarray(_pad_rows(np.ones(len(seeds), bool), S_pad)),
        jnp.asarray(_pad_rows(X, Np_pad)),
        jnp.float32(bandwidth),
        max_iter=max_iter,
        chunk_fit=chunk,
        chunk_pred=chunk_p,
        use_pallas=_use_pallas(use_pallas),
    )
    return np.asarray(labels_u16[:n]).astype(np.int32) - 1


def mean_shift_sweep_fit_predict(
    X: np.ndarray,
    bandwidths,
    reduction_probability: float = 1.0,
    max_iter: int = 300,
    rng: Optional[np.random.Generator] = None,
    mesh=None,
) -> np.ndarray:
    """Vectorized multi-bandwidth mean shift: fit + predict for K bandwidths
    in ONE vmapped device computation (the K clustering problems share the
    MXU batch instead of running serially). Returns ``(K, N)`` labels.

    TPU extension (BASELINE.json config[4]); semantics match per-bandwidth
    :func:`mean_shift_fit_predict` except that all bandwidths share one
    fit subsample draw.

    With ``mesh`` (and K a multiple of the mesh size), the K clustering
    problems shard over the mesh's ``data`` axis via ``shard_map``: each
    device fits/predicts its local bandwidths independently (the point set
    replicates; zero cross-device communication).
    """
    X = np.asarray(X, dtype=np.float32)
    n, d = X.shape
    bandwidths = [float(b) for b in bandwidths]
    K = len(bandwidths)
    if n == 0:
        return np.zeros((K, 0), np.int32)

    if reduction_probability < 1.0:
        rng = rng or np.random.default_rng()
        X_fit = X[rng.random(n) < reduction_probability]
        if len(X_fit) == 0:
            X_fit = X
    else:
        X_fit = X

    seeds_list = [bin_seeds(X_fit, bin_size=b) for b in bandwidths]
    S_max = max(len(s) for s in seeds_list)
    S_pad = _next_pow2(max(S_max, 128))
    N_pad = _next_pow2(max(len(X_fit), 512))
    chunk = max(256, min(1 << 18, (1 << 26) // S_pad, N_pad))
    while N_pad % chunk:
        chunk //= 2

    seeds_arr = np.zeros((K, S_pad, d), np.float32)
    seeds_valid = np.zeros((K, S_pad), bool)
    for k, s in enumerate(seeds_list):
        seeds_arr[k, : len(s)] = s
        seeds_valid[k, : len(s)] = True

    X_pad = jnp.asarray(_pad_rows(X_fit, N_pad))
    x_valid = jnp.asarray(_pad_rows(np.ones(len(X_fit), bool), N_pad))
    Np_pad = _next_pow2(max(n, 512))
    chunk_p = max(256, min(1 << 18, (1 << 26) // S_pad, Np_pad))
    while Np_pad % chunk_p:
        chunk_p //= 2
    X_all = jnp.asarray(_pad_rows(X, Np_pad))

    seeds_j = jnp.asarray(seeds_arr)
    sv_j = jnp.asarray(seeds_valid)
    bw_j = jnp.asarray(bandwidths, jnp.float32)

    n_dev = mesh.devices.size if mesh is not None else 1
    sharded = mesh is not None and n_dev > 1 and K % n_dev == 0
    sweep = _sweep_kernel(
        max_iter, chunk, chunk_p, mesh if sharded else None
    )
    from ..utils.profiling import time_device

    labels_u16 = time_device(
        "detect.device", sweep, X_pad, x_valid, seeds_j, sv_j, X_all, bw_j
    )
    return np.asarray(labels_u16[:, :n]).astype(np.int32) - 1


@lru_cache(maxsize=32)
def _sweep_kernel(max_iter: int, chunk_fit: int, chunk_pred: int, mesh):
    """Jitted K-bandwidth sweep, cached across samples: per-call data (the
    point set, seeds, bandwidths) enters as arguments, so the jit cache
    hits for every sample of the same padded shape instead of retracing
    (and recompiling) per call. With a mesh, the K problems shard over
    ``data`` — each device clusters its local bandwidths independently
    (point set replicated, no cross-device communication)."""

    def one(X_pad, x_valid, s, sv, X_all, bw):
        return _fit_predict_kernel(
            X_pad, x_valid, s, sv, X_all, bw,
            max_iter=max_iter, chunk_fit=chunk_fit, chunk_pred=chunk_pred,
            use_pallas=False,
        )

    vmapped = jax.vmap(one, in_axes=(None, None, 0, 0, None, 0))
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        return jax.jit(
            jax.shard_map(
                vmapped,
                mesh=mesh,
                in_specs=(P(), P(), P("data"), P("data"), P(), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )
        )
    return jax.jit(vmapped)


# ---------------------------------------------------------------------------
# full segmentation entry (reference utils/mean_shift.py:6-57 parity)
# ---------------------------------------------------------------------------


def add_coordinate_grid(embedding_mean: np.ndarray) -> np.ndarray:
    """Offsets -> absolute embeddings: add the pixel-coordinate grid, x-first
    channel order (reference ``utils/mean_shift.py:16-32``)."""
    out = np.array(embedding_mean, dtype=np.float32, copy=True)
    ndim = out.ndim - 1  # (D, *spatial)
    for channel in range(ndim):
        axis = ndim - 1 - channel  # channel 0 = x = last spatial axis
        shape = [1] * ndim
        shape[axis] = out.shape[1 + axis]
        out[channel] += np.arange(out.shape[1 + axis], dtype=np.float32).reshape(
            shape
        )
    return out


def mean_shift_segmentation(
    embedding_mean: np.ndarray,
    embedding_std: np.ndarray,
    bandwidth: float,
    min_size: int,
    reduction_probability: float,
    threshold: float,
    seeds: Optional[np.ndarray],
    max_iter: int = 300,
    rng: Optional[np.random.Generator] = None,
    use_pallas: Optional[bool] = None,
) -> np.ndarray:
    """Segment one sample's embeddings into instances.

    Args:
        embedding_mean: ``(1, D, *spatial)`` or ``(D, *spatial)`` offsets.
        embedding_std: ``(*spatial,)`` uncertainty channel.
        min_size: accepted and IGNORED — a reference-parity signature
            quirk: the reference's ``mean_shift_segmentation`` takes
            ``min_size`` and never reads it (reference
            ``utils/mean_shift.py:6-44``); size filtering happens in the
            segment stage.
        threshold: foreground threshold (std < threshold is foreground).
        seeds: optional ``(P, D)`` x-first seed coordinates.

    Returns:
        ``(*spatial,)`` uint-like labels; background/orphans are 0.
    """
    mean = np.asarray(embedding_mean, dtype=np.float32)
    if mean.ndim == embedding_std.ndim + 2:
        mean = mean[0]
    absolute = add_coordinate_grid(mean)
    mask = embedding_std < threshold
    if mask.sum() == 0:
        return np.zeros(mask.shape, dtype=np.int32)

    D = absolute.shape[0]
    X = absolute.reshape(D, -1).T[mask.ravel()]
    labels = mean_shift_fit_predict(
        X,
        bandwidth=bandwidth,
        seeds=seeds.astype(np.float32) if seeds is not None else None,
        reduction_probability=reduction_probability,
        max_iter=max_iter,
        rng=rng,
        use_pallas=use_pallas,
    )
    spatial = np.full(mask.shape, -1, np.int32)
    spatial[mask] = labels
    return spatial + 1  # background and orphans -> 0
