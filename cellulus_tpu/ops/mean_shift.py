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


def _make_ball_stats(X, x_valid, chunk, bw2, S, use_pallas=False):
    """Build ``ball_stats(centers) -> (counts, sums)`` over the fixed point
    set ``X``: per-center population and coordinate sum of valid points with
    ``dist <= bandwidth``. The N-chunked accumulation order is a function of
    ``chunk`` ONLY, so two callers with the same ``chunk`` produce
    bit-identical per-seed results regardless of how many seeds they carry
    (what makes phased seed compaction exact)."""
    N, d = X.shape
    n_chunks = N // chunk
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

    return ball_stats


def _make_step(ball_stats, stop_thresh, max_iter, cycle_shortcut):
    """One mean-shift iteration over state ``(centers, prev, n_final,
    frozen, halted, it)``.

    ``frozen`` = converged/empty (ball population recorded at freeze, like
    before). ``halted`` additionally includes seeds caught in an EXACT
    period-2 oscillation: flat-kernel mean shift 2-cycles (measured: 73 %
    of the 3D bin seeds at bench scale never satisfy the shift threshold
    and run to max_iter). Once ``c_{t+1} == c_{t-1}`` bitwise, the
    trajectory repeats deterministically, so the position after the
    remaining ``max_iter - (t+1)`` iterations is whichever cycle phase has
    matching parity — the seed is moved there immediately and halted.
    Halted-but-not-frozen seeds take the existing recount path (population
    measured at the final position), exactly like the un-shortcut loop's
    ran-to-max_iter seeds. Results are bit-identical; only the exit
    iteration changes.
    """

    def step(state):
        centers, prev, n_final, frozen, halted, it = state
        counts, sums = ball_stats(centers)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        empty = counts == 0
        shift = jnp.linalg.norm(means - centers, axis=1)
        newly_done = empty | (shift < stop_thresh)
        new_centers = jnp.where(
            (halted | empty)[:, None], centers, means
        )
        if cycle_shortcut:
            cycle = (
                jnp.all(new_centers == prev, axis=1)
                & ~halted
                & ~newly_done
            )
            remaining = max_iter - (it + 1)
            final_pos = jnp.where(
                (remaining % 2 == 0)[..., None], new_centers, centers
            )
            new_centers = jnp.where(cycle[:, None], final_pos, new_centers)
        else:
            cycle = jnp.zeros_like(newly_done)
        n_final = jnp.where(frozen, n_final, counts)
        frozen = frozen | newly_done
        halted = halted | newly_done | cycle
        return new_centers, centers, n_final, frozen, halted, it + 1

    return step


def _evolve_impl(
    X: jnp.ndarray,  # (N, d) zero-padded
    x_valid: jnp.ndarray,  # (N,) bool
    centers: jnp.ndarray,  # (S, d) current seed positions
    prev: jnp.ndarray,  # (S, d) positions one iteration back (inf at start)
    n_final: jnp.ndarray,  # (S,) ball population recorded at freeze
    frozen: jnp.ndarray,  # (S,) bool
    halted: jnp.ndarray,  # (S,) bool (frozen | cycled)
    it0: jnp.ndarray,  # scalar int32: iterations already taken
    bandwidth: jnp.ndarray,
    phase_iters: int,
    max_iter: int,
    chunk: int,
    cycle_shortcut: bool = True,
):
    """Advance all live seeds by up to ``phase_iters`` mean-shift
    iterations (bounded by ``max_iter`` total). The host-driven phased fit
    (``_fit_phased``) calls this, compacting halted seeds away between
    phases — exact because seed trajectories are independent and ``chunk``
    stays fixed across phases."""
    S = centers.shape[0]
    ball_stats = _make_ball_stats(
        X, x_valid, chunk, bandwidth * bandwidth, S
    )
    step = _make_step(
        ball_stats, 1e-3 * bandwidth, max_iter, cycle_shortcut
    )
    limit = jnp.minimum(it0 + phase_iters, max_iter)

    def cond(state):
        return (state[-1] < limit) & ~jnp.all(state[4])

    return jax.lax.while_loop(
        cond, step, (centers, prev, n_final, frozen, halted, it0)
    )


_evolve_kernel = jax.jit(
    _evolve_impl,
    static_argnames=("phase_iters", "max_iter", "chunk", "cycle_shortcut"),
)


def _fit_impl(
    X: jnp.ndarray,  # (N, d) zero-padded
    x_valid: jnp.ndarray,  # (N,) bool
    seeds: jnp.ndarray,  # (S, d) zero-padded
    s_valid: jnp.ndarray,  # (S,) bool
    bandwidth: jnp.ndarray,  # scalar
    max_iter: int,
    chunk: int,
    use_pallas: bool = False,
    cycle_shortcut: bool = True,
):
    N, d = X.shape
    S = seeds.shape[0]
    bw2 = bandwidth * bandwidth
    ball_stats = _make_ball_stats(X, x_valid, chunk, bw2, S, use_pallas)
    step = _make_step(ball_stats, 1e-3 * bandwidth, max_iter, cycle_shortcut)

    def cond(state):
        return (state[-1] < max_iter) & ~jnp.all(state[4])

    frozen0 = ~s_valid
    init = (
        seeds,
        jnp.full_like(seeds, jnp.inf),  # prev: no position one back yet
        jnp.zeros((S,), jnp.float32),
        frozen0,
        frozen0,
        jnp.int32(0),
    )
    centers, _, n_final, frozen, _, _ = jax.lax.while_loop(cond, step, init)

    return _finalize_impl(
        X, x_valid, centers, n_final, frozen, s_valid, bandwidth, chunk,
        use_pallas,
    )


def _finalize_impl(
    X: jnp.ndarray,
    x_valid: jnp.ndarray,
    centers: jnp.ndarray,  # (S, d) converged/frozen positions
    n_final: jnp.ndarray,  # (S,) population recorded at freeze
    frozen: jnp.ndarray,  # (S,) bool
    s_valid: jnp.ndarray,  # (S,) bool
    bandwidth: jnp.ndarray,
    chunk: int,
    use_pallas: bool = False,
):
    """Recount + sklearn dedupe on the full seed set (shared by the
    monolithic fit and the phased fit)."""
    S, d = centers.shape
    bw2 = bandwidth * bandwidth
    ball_stats = _make_ball_stats(X, x_valid, chunk, bw2, S, use_pallas)

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


_finalize_kernel = jax.jit(
    _finalize_impl, static_argnames=("chunk", "use_pallas")
)


_fit_kernel = jax.jit(
    _fit_impl,
    static_argnames=("max_iter", "chunk", "use_pallas", "cycle_shortcut"),
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


def _use_phased(S_pad: int) -> bool:
    """Host-driven phased fit with seed compaction: OPT-IN
    (CELLULUS_TPU_PHASED_MEANSHIFT=1), kept as a measured NEGATIVE result
    on this hardware: on real 3D embeddings at bench scale, 72 % of the
    ~12k bin seeds neither converge nor enter exact period-2 cycles (they
    wander at f32-noise amplitude above sklearn's 1e-3·bandwidth stop
    threshold), so the live set plateaus at ~8.6k and the fit runs all
    300 sklearn-semantic iterations regardless — compaction saves ~25 %
    of the distance work while ~37 extra host round-trips cost 2-3x that
    over the tunneled chip (NOTES.md round 5). It would win on a
    directly-attached host (RTT ~none) or workloads whose seeds mostly
    converge; the bit-exactness tests keep it safe to flip.
    """
    from ..utils.env import env_flag

    return env_flag("CELLULUS_TPU_PHASED_MEANSHIFT")


def _phased_fit(
    X_fit_dev,  # (Nf_pad, d) jnp, zero-padded
    fit_valid_dev,  # (Nf_pad,) jnp bool
    seeds: np.ndarray,  # (S0, d) float32, unpadded
    bandwidth: float,
    max_iter: int,
    chunk: int,
    phase_iters: int = 8,
):
    """Run the mean-shift fit as host-driven phases, compacting frozen
    seeds away between phases.

    Bit-exact vs the monolithic ``_fit_impl``: seed trajectories are
    independent (ball_stats reads only the fixed point set), per-phase
    ``n_final``/``frozen`` restarts reproduce the monolithic recurrence
    (a seed's population is recorded the iteration it freezes), and the
    N-chunked accumulation uses the SAME ``chunk`` in every phase, so each
    seed's arithmetic is identical regardless of the live-set size
    (tests/test_pallas_mean_shift.py::test_phased_fit_matches_monolithic).

    Returns full-seed-set ``(centers (S_pad, d), n_final, frozen,
    s_valid)`` numpy arrays in original seed order, ready for
    ``_finalize_kernel``.
    """
    from ..utils.profiling import time_device

    S0, d = seeds.shape
    S_pad = _next_pow2(max(S0, 64))
    centers_res = np.zeros((S_pad, d), np.float32)
    nfinal_res = np.zeros((S_pad,), np.float32)
    frozen_res = np.ones((S_pad,), bool)  # padding rows freeze immediately
    s_valid = np.zeros((S_pad,), bool)
    s_valid[:S0] = True

    from ..utils.env import env_flag

    debug = env_flag("CELLULUS_TPU_PHASED_DEBUG")
    active_idx = np.arange(S0)
    centers_a = np.ascontiguousarray(seeds, np.float32)
    prev_a = np.full_like(centers_a, np.inf)
    it = 0
    while len(active_idx) and it < max_iter:
        import time as _time

        t0 = _time.perf_counter()
        Sa = _next_pow2(max(len(active_idx), 64))
        v = np.zeros((Sa,), bool)
        v[: len(active_idx)] = True
        c, pv, nf, fr, ha, it_new = time_device(
            "detect.device",
            _evolve_kernel,
            X_fit_dev,
            fit_valid_dev,
            jnp.asarray(_pad_rows(centers_a, Sa)),
            jnp.asarray(_pad_rows(prev_a, Sa)),
            jnp.zeros((Sa,), jnp.float32),
            jnp.asarray(~v),
            jnp.asarray(~v),
            jnp.int32(it),
            jnp.float32(bandwidth),
            phase_iters=phase_iters,
            max_iter=max_iter,
            chunk=chunk,
        )
        n_act = len(active_idx)
        c_np, pv_np, nf_np, fr_np, ha_np = (
            np.asarray(a)[:n_act] for a in jax.device_get((c, pv, nf, fr, ha))
        )
        it = int(it_new)
        done = ha_np  # frozen OR cycled seeds leave the live set
        cycled = done & ~fr_np
        centers_res[active_idx[done]] = c_np[done]
        nfinal_res[active_idx[done & fr_np]] = nf_np[done & fr_np]
        # cycled seeds sit at their (parity-resolved) final position but
        # never recorded a population: finalize recounts where ~frozen
        frozen_res[active_idx[cycled]] = False
        centers_a = np.ascontiguousarray(c_np[~done])
        prev_a = np.ascontiguousarray(pv_np[~done])
        active_idx = active_idx[~done]
        if debug:
            print(  # noqa: debug-gated phased-fit diagnostics
                f"[phased] Sa={Sa} it->{it} done={int(done.sum())}/{n_act} "
                f"(cycled {int(cycled.sum())}) "
                f"wall={_time.perf_counter() - t0:.3f}s", flush=True,
            )

    if len(active_idx):  # hit max_iter unfrozen: finalize recounts these
        centers_res[active_idx] = centers_a
        frozen_res[active_idx] = False

    return centers_res, nfinal_res, frozen_res, s_valid


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

    if _use_phased(S_pad) and not _use_pallas(use_pallas):
        # host-driven phases with seed compaction (bit-exact; the fit's
        # S×N distance traffic shrinks with the live seed set) + a
        # predict over only the deduped centers (~2x fewer rows)
        X_fit_dev = jnp.asarray(_pad_rows(X_fit, N_pad))
        fit_valid_dev = jnp.asarray(_pad_rows(np.ones(len(X_fit), bool), N_pad))
        centers, n_final, frozen, s_valid = _phased_fit(
            X_fit_dev, fit_valid_dev, seeds, bandwidth, max_iter, chunk
        )
        sc, unique = time_device(
            "detect.device",
            _finalize_kernel,
            X_fit_dev,
            fit_valid_dev,
            jnp.asarray(centers),
            jnp.asarray(n_final),
            jnp.asarray(frozen),
            jnp.asarray(s_valid),
            jnp.float32(bandwidth),
            chunk=chunk,
        )
        sc_np = np.asarray(sc)
        u_np = np.asarray(unique)
        n_centers = int(u_np.sum())
        if n_centers == 0:
            return np.full((n,), -1, np.int32)
        # compact to valid centers only (keeps order => same compact ids)
        Sp = _next_pow2(max(n_centers, 64))
        chunk_pc = max(256, min(1 << 18, (1 << 26) // Sp, Np_pad))
        while Np_pad % chunk_pc:
            chunk_pc //= 2
        labels = time_device(
            "detect.device",
            _predict_kernel,
            jnp.asarray(_pad_rows(X, Np_pad)),
            jnp.asarray(_pad_rows(sc_np[u_np], Sp)),
            jnp.asarray(_pad_rows(np.ones(n_centers, bool), Sp)),
            jnp.float32(bandwidth),
            chunk=chunk_pc,
        )
        return np.asarray(labels[:n]).astype(np.int32)

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
