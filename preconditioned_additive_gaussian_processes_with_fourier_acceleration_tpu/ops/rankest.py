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
    scale = (m / n) ** (1.0 / d)

    ranks = jnp.arange(1, m + 1)

    # One jitted graph per (shape, kind), reused across the nsample_r
    # repeats: the subsample + FPS + error-curve pipeline as eager ops is
    # dozens of per-op compile round-trips on the remote-compile backend.
    @jax.jit
    def curve_fn(Xv, pv, kv):
        idx = jax.random.choice(kv, n, (m,), replace=False)
        Xs = Xv[idx] * scale
        order = fps(Xs, m).perm
        return nystrom_error_curve(kind, pv, Xs[order], ranks)

    ests = []
    for r in range(cfg.nsample_r):
        key, sub = jax.random.split(key)
        below = np.asarray(curve_fn(X, params, sub) < cfg.tol)
        k = int(np.argmax(below)) + 1 if below.any() else m
        ests.append(k * n / m)
    k_est = int(np.ceil(float(np.mean(ests))))
    return min(k_est, cfg.max_rank, n)
