"""Rank estimation for the AFN preconditioner.

Rebuild of SRC/linearalg/rankest.c (+ MATLAB afn_setup.m:111-292):

- nystrom_error_rank (Nfft4GPRankestNysScaled, rankest.c:248-392):
  subsample m points, scale coordinates by (m/n)^(1/d) (preserves fill
  distance), FPS-order them, add the stabilization shift to the diagonal,
  then find the smallest rank k whose Nyström approximation has relative
  Frobenius error < 0.1; scale the answer back by n/m.  Repeated nsample_r
  times and averaged (the C behavior).

- The eigen-curve refinement (Nfft4GPRankestDefault) counts eigenvalues
  above 1.1*mu on the subsample — used when the scaled estimate is small.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kernels import KernelParams, kernel_matrix
from .fps import fps
from .matops import tril_solve


class RankestConfig(NamedTuple):
    nsample: int = 500       # subsample size (rankest.c:3-17)
    nsample_r: int = 2       # repeats (C default 5; 2 keeps tests cheap)
    max_rank: int = 2000
    full_tol: float = 0.9    # if k > full_tol * nsample -> "not low rank"
    tol: float = 0.1         # relative Frobenius error target


def nystrom_error_curve(kind: str, params: KernelParams, Xs, ranks):
    """Relative Frobenius Nyström error for FPS-ordered subsample Xs at each
    candidate rank (ref rankest.c:183-242 NysError)."""
    m = Xs.shape[0]
    K = kernel_matrix(kind, params, Xs)
    fro = jnp.linalg.norm(K)
    nu = jnp.sqrt(jnp.asarray(float(m), K.dtype)) * jnp.spacing(fro)
    K = K + nu * jnp.eye(m, dtype=K.dtype)

    # single cholesky of the full ordered subsample: leading k x k blocks
    # give every rank's Nyström factor at once
    L = jnp.linalg.cholesky(K)

    def err_at(k):
        # Nyström approx with k landmarks: Kk = K[:, :k] K[:k, :k]^{-1} K[:k, :]
        # = C C' with C = K[:, :k] L[:k, :k]^{-T}; but C = L[:, :k] exactly
        # (leading columns of the full Cholesky factor), so
        # err = ||K - L[:, :k] L[:, :k]'||_F — O(m^2 k) via masked product.
        mask = (jnp.arange(m) < k).astype(K.dtype)
        Lk = L * mask[None, :]
        return jnp.linalg.norm(K - Lk @ Lk.T) / fro

    return jax.vmap(err_at)(ranks)


def eigencurve_rank(kind: str, params: KernelParams, X, key,
                    nsample: int = 500, thresh_factor: float = 1.1):
    """Eigen-curve rank estimate (ref Nfft4GPRankestDefault, rankest.c:30-179;
    MATLAB afn_setup.m:230-292): on a subsample, count eigenvalues above
    thresh_factor * noise (the part of the spectrum Nyström must capture),
    then scale the count back to the full set.
    """
    import numpy as np

    n = X.shape[0]
    m = min(nsample, n)
    count = int(_count_fn(kind, n, m, float(thresh_factor))(X, params, key))
    return max(1, int(np.ceil(count * n / m)))


def fill_distance_estimate(kind: str, params: KernelParams, X, key,
                           nsample: int = 500, thresh_factor: float = 1.1,
                           knee_tol: float = 0.41, knee_tol2: float = 0.2):
    """Eigen-count + fill-distance-knee estimate on one random subsample.

    Ref Nfft4GPRankestDefaultToleranceEstimation (rankest.c:30-128): FPS-order
    a subsample recording the fill-distance curve, count kernel eigenvalues
    above thresh_factor * noise, then walk the rank DOWN from the eigen count
    until the fill-distance curve shows a knee — a relative jump > knee_tol
    between consecutive fill distances, or the distance returning within
    (1 + knee_tol2) of the eigen-count rank's distance.

    Returns (est_rank, h): the refined rank and the learned fill-distance
    tolerance h = dist[rank] used by the full-set FPS stage.
    """
    import numpy as np

    n = X.shape[0]
    m = min(nsample, n)
    eigs, dists = _eig_dist_fn(kind, n, m)(X, params, key)
    eigs = np.asarray(eigs)
    dists = np.asarray(dists)
    noise = float(params.f) ** 2 * float(params.mu)
    rank = int(np.sum(eigs > thresh_factor * noise))
    rank = max(rank, 1)
    rank2 = rank - 1
    # knee walk-down (rankest.c:103-112)
    r = rank
    while r > 1:
        r -= 1
        jump = (dists[r - 1] - dists[r]) / dists[r] if dists[r] > 0 else np.inf
        if jump > knee_tol or dists[r] <= (1.0 + knee_tol2) * dists[rank2]:
            break
    h = float(dists[min(r, m - 1)])
    return r + 1, h


@functools.lru_cache(maxsize=None)
def _eig_dist_fn(kind: str, n: int, m: int):
    @jax.jit
    def f(Xv, pv, kv):
        idx = jax.random.choice(kv, n, (m,), replace=False)
        Xs = Xv[idx]
        res = fps(Xs, m)
        K = kernel_matrix(kind, pv, Xs)
        eigs = jnp.linalg.eigvalsh(K)
        return eigs, res.dists

    return f


@functools.lru_cache(maxsize=None)
def _full_fps_fn(n: int, maxrank: int):
    @jax.jit
    def f(Xv):
        res = fps(Xv, maxrank)
        return res.perm, res.dists

    return f


def rankest_default(kind: str, params: KernelParams, X, key,
                    cfg: RankestConfig = RankestConfig(), *,
                    maxrank: int = 2000):
    """Full eigen-curve rank estimation with fill-distance refinement.

    Ref Nfft4GPRankestDefault (rankest.c:133-179): average the learned
    fill-distance tolerance h over nsample_r subsample repeats; if the mean
    estimated-rank fraction exceeds full_tol the data is "not low rank" (use
    maxrank); otherwise run FPS on the FULL set and return the number of
    landmarks whose fill distance is >= h.

    Returns (rank, perm): rank (<= maxrank) and the full-set FPS landmark
    prefix (maxrank,) whose first `rank` entries are the landmarks.
    """
    import numpy as np

    n = X.shape[0]
    m = min(cfg.nsample, n)
    hs, est_total = [], 0
    for _ in range(cfg.nsample_r):
        key, sub = jax.random.split(key)
        est, h = fill_distance_estimate(kind, params, X, sub, nsample=cfg.nsample)
        hs.append(h)
        est_total += est
    h = float(np.mean(hs))
    maxrank = min(maxrank, n)
    perm, dists = _full_fps_fn(n, maxrank)(X)
    if est_total / float(m * cfg.nsample_r) > cfg.full_tol:
        return maxrank, np.asarray(perm)
    dists = np.asarray(dists)
    rank = int(np.sum(dists >= h))  # dists[0] = inf always counts
    rank = int(np.clip(rank, 1, maxrank))
    return rank, np.asarray(perm)


@functools.lru_cache(maxsize=None)
def _count_fn(kind: str, n: int, m: int, thresh_factor: float):
    """Module-level jit cache keyed on (kind, shapes): eager ops are per-op
    compile round-trips on the remote-compile TPU backend, and per-call
    closures would re-trace every invocation (ADVICE r1).  X passed as an
    ARG (closures inline as MLIR constants there)."""

    @jax.jit
    def count(Xv, pv, kv):
        idx = jax.random.choice(kv, n, (m,), replace=False)
        K = kernel_matrix(kind, pv, Xv[idx])
        eigs = jnp.linalg.eigvalsh(K)
        noise = pv.f * pv.f * pv.mu
        return jnp.sum(eigs > thresh_factor * noise)

    return count


@functools.lru_cache(maxsize=None)
def _curve_fn(kind: str, n: int, m: int, d: int):
    """Module-level jit cache (like _count_fn): a per-call @jax.jit closure
    re-traces on EVERY estimate_rank invocation (ADVICE r1/r2)."""
    scale = (m / n) ** (1.0 / d)
    ranks = jnp.arange(1, m + 1)

    @jax.jit
    def curve_fn(Xv, pv, kv):
        idx = jax.random.choice(kv, n, (m,), replace=False)
        Xs = Xv[idx] * scale
        order = fps(Xs, m).perm
        return nystrom_error_curve(kind, pv, Xs[order], ranks)

    return curve_fn


def estimate_rank(
    kind: str,
    params: KernelParams,
    X,
    key,
    cfg: RankestConfig = RankestConfig(),
):
    """Scaled-subsample Nyström-error rank estimate (host-side driver).

    Returns a Python int (rank decisions are static — they size arrays).
    """
    import numpy as np

    n, d = X.shape
    m = min(cfg.nsample, n)
    curve_fn = _curve_fn(kind, n, m, d)

    ests = []
    for r in range(cfg.nsample_r):
        key, sub = jax.random.split(key)
        below = np.asarray(curve_fn(X, params, sub) < cfg.tol)
        k = int(np.argmax(below)) + 1 if below.any() else m
        ests.append(k * n / m)
    k_est = int(np.ceil(float(np.mean(ests))))
    return min(k_est, cfg.max_rank, n)
