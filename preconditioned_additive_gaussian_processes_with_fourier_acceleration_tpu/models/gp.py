"""GP marginal-likelihood loss with analytic gradient, and GP prediction.

Rebuild of SRC/optimizer/gp_loss.c + gp_predict.c.

Loss (gp_loss.c:96-307):
  loss   = 0.5 * ( y' K^{-1} y / n  +  logdet(K)/n  +  log 2*pi )
  grad_j = 0.5 * ( -(K^{-1}y)' dK_j (K^{-1}y)/n + tr(K^{-1}dK_j)/n ) * dt_j
with softplus-transformed raw parameters (dt_j the transform derivative),
K^{-1}y by FGMRES (kdim = maxits*2, gp_loss.c:199-213) and the logdet/trace
terms by preconditioned SLQ (gp_loss.c:240-255).  This matches the
reference's *estimator* semantics — no autodiff through the solver, so
stochastic-trace behavior is identical given the same probes.

Prediction (gp_predict.c:61-280): mean = K12' K11^{-1} y; optional
std_i = sqrt|K22_ii - K12_i' K11^{-1} K12_i| where K22's diagonal includes
the noise term (K22 is a same-set kernel evaluation, gp_predict.c:181).
The reference's per-test-point FGMRES loop becomes one batched multi-rhs
solve.
"""

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.kernels import (
    KernelParams,
    kernel_matrix,
    kernel_matrix_with_grad,
    additive_kernel_matrix,
    additive_kernel_matrix_with_grad,
)
from ..solvers.fgmres import fgmres
from ..solvers.lanczos import slq_logdet
from .transforms import transform_forward

LOG_2PI = math.log(2.0 * math.pi)


class GPConfig(NamedTuple):
    kind: str = "gaussian"
    transform: str = "softplus"
    maxits: int = 10            # SLQ Lanczos steps; FGMRES uses 2*maxits
    nvecs: int = 10             # SLQ probes
    tol: float = 1e-6           # FGMRES relative tolerance
    atol: bool = False
    mask: tuple = (1, 1, 1)     # which of (f, l, mu) receive gradients


class GPLossResult(NamedTuple):
    loss: jnp.ndarray
    grad: jnp.ndarray
    l1: jnp.ndarray
    l2: jnp.ndarray
    solve_relres: jnp.ndarray
    solve_iters: jnp.ndarray


def make_dense_ops(kind: str, X, windows=None):
    """build_ops(params) -> (matvec, dmatvec) for the exact dense path."""

    def build(params: KernelParams, require_grad: bool = True):
        if windows is None:
            if require_grad:
                K, dK = kernel_matrix_with_grad(kind, params, X)
            else:
                K = kernel_matrix(kind, params, X)
                dK = None
        else:
            if require_grad:
                K, dK = additive_kernel_matrix_with_grad(kind, params, X, windows)
            else:
                K = additive_kernel_matrix(kind, params, X, windows)
                dK = None
        matvec = lambda x: K @ x
        dmatvec = (lambda x: jnp.einsum("knm,m->kn", dK, x)) if dK is not None else None
        return matvec, dmatvec

    return build


def gp_loss(
    raw_params,
    y,
    build_ops: Callable,
    probes,
    cfg: GPConfig,
    precond_setup: Optional[Callable] = None,
) -> GPLossResult:
    """Negative log marginal likelihood (per point) + analytic gradient.

    raw_params: (3,) untransformed (f, l, mu)
    build_ops(params) -> (matvec, dmatvec)
    probes: (nvecs, n) Rademacher matrix (inject for determinism)
    precond_setup(params) -> preconditioner pytree or None
    """
    n = y.shape[0]
    tvals, dtvals = transform_forward(cfg.transform, raw_params)
    params = KernelParams(f=tvals[0], l=tvals[1], mu=tvals[2])

    matvec, dmatvec = build_ops(params)
    precond = precond_setup(params) if precond_setup is not None else None
    psolve = precond.solve if precond is not None else None

    # --- L1 = y' K^{-1} y / n  (FGMRES, kdim = maxits*2; gp_loss.c:186-213)
    solve_its = min(n, cfg.maxits * 2)
    sol = fgmres(
        matvec,
        y,
        precond=psolve,
        kdim=solve_its,
        maxits=solve_its,
        tol=cfg.tol,
        atol=cfg.atol,
    )
    iKY = sol.x
    L1 = jnp.vdot(y, iKY) / n
    dKiKY = dmatvec(iKY)                      # (3, n)
    L1_grad = (dKiKY @ iKY) / n * dtvals

    # --- L2 = logdet(K)/n + traces (SLQ; gp_loss.c:240-255)
    slq = slq_logdet(matvec, dmatvec, probes, maxits=min(n, cfg.maxits), precond=precond)
    L2 = slq.logdet
    L2_grad = slq.dlogdet

    loss = 0.5 * (L1 + L2 + LOG_2PI)
    mask = jnp.asarray(cfg.mask, dtype=loss.dtype)
    grad = 0.5 * (-L1_grad + L2_grad * dtvals) * mask
    return GPLossResult(
        loss=loss,
        grad=grad,
        l1=L1,
        l2=L2,
        solve_relres=sol.relres,
        solve_iters=sol.niter,
    )


def gp_loss_gaussian_ran_softplus(
    raw_params, X, y, probes, *, rank: int = 50, maxits: int = 10, tol: float = 1e-6,
    perm=None,
):
    """Convenience loss: Gaussian kernel + Nyström ("RAN") preconditioner +
    softplus transform — ref Nfft4GPGpLossGaussianRANSoftPlus (gp_loss.c:28-94).
    """
    from ..preconds.nystrom import nystrom_setup
    from ..utils.datasets import expand_perm

    n = X.shape[0]
    k = min(rank, n)
    if perm is None:
        perm = jnp.arange(k)
    cfg = GPConfig(kind="gaussian", maxits=maxits, nvecs=probes.shape[0], tol=tol)
    build = make_dense_ops("gaussian", X)

    def precond_setup(params):
        return nystrom_setup("gaussian", params, X, perm, k, require_grad=True)

    return gp_loss(raw_params, y, build, probes, cfg, precond_setup)


class GPPredictResult(NamedTuple):
    mean: jnp.ndarray
    std: Optional[jnp.ndarray]
    solve_relres: jnp.ndarray
    solve_iters: jnp.ndarray


def gp_predict(
    raw_params,
    X,
    y,
    X_test,
    cfg: GPConfig,
    *,
    windows=None,
    precond_setup: Optional[Callable] = None,
    with_std: bool = False,
    maxits: Optional[int] = None,
) -> GPPredictResult:
    """GP posterior mean (and optional std) — dense path (gp_predict.c:61-280)."""
    n = X.shape[0]
    n_test = X_test.shape[0]
    tvals, _ = transform_forward(cfg.transform, raw_params)
    params = KernelParams(f=tvals[0], l=tvals[1], mu=tvals[2])

    if windows is None:
        K11 = kernel_matrix(cfg.kind, params, X)
        K12 = kernel_matrix(cfg.kind, params, X, X_test)     # no noise (cross)
    else:
        K11 = additive_kernel_matrix(cfg.kind, params, X, windows)
        K12 = additive_kernel_matrix(cfg.kind, params, X, windows, X_test)

    precond = precond_setup(params) if precond_setup is not None else None
    psolve = precond.solve if precond is not None else None
    matvec = lambda v: K11 @ v

    # cap the default basis size: kdim = n would allocate an (n+1, n) basis
    its = maxits if maxits is not None else min(n, 200)
    sol = fgmres(matvec, y, precond=psolve, kdim=min(n, its), maxits=min(n, its),
                 tol=cfg.tol, atol=cfg.atol)
    mean = K12.T @ sol.x

    std = None
    if with_std:
        # K22 diagonal includes noise (same-set evaluation, gp_predict.c:181)
        f2 = params.f * params.f
        K22_diag = f2 * (1.0 + params.mu) * jnp.ones((n_test,), K11.dtype)
        # batched multi-rhs solve replaces the reference's per-point loop
        # (gp_predict.c:231-255)
        iK_K12 = jax.vmap(
            lambda rhs: fgmres(matvec, rhs, precond=psolve, kdim=min(n, its),
                               maxits=min(n, its), tol=cfg.tol, atol=cfg.atol).x,
            in_axes=1,
            out_axes=1,
        )(K12)
        quad = jnp.sum(K12 * iK_K12, axis=0)
        std = jnp.sqrt(jnp.abs(K22_diag - quad))

    return GPPredictResult(mean=mean, std=std, solve_relres=sol.relres, solve_iters=sol.niter)


def gp_predict_fastsum(
    raw_params,
    X,
    y,
    X_test,
    cfg: GPConfig,
    *,
    windows=None,
    fastsum_N: int = 32,
    precond_setup: Optional[Callable] = None,
    with_std: bool = False,
    maxits: Optional[int] = None,
    oversample: int = 2,
    nearfield_lfil: int = 0,
    std_chunk: int = 16,
) -> GPPredictResult:
    """Fourier-accelerated GP prediction via a joint train+test plan.

    Ref Nfft4GPAdditiveNFFTGpPredict (nfft_interface.c:873-1061): build one
    fastsum plan on the stacked [train; test] points; the posterior mean is
    the tail of K_joint @ [K11^{-1} y; 0] (nfft_interface.c:966-987); the
    predictive std solves per-test-point e-vector systems on the joint plan
    (nfft_interface.c:1015-1057) — batched here instead of looped.
    """
    from ..ops import fastsum as fs

    n = X.shape[0]
    n_test = X_test.shape[0]
    tvals, _ = transform_forward(cfg.transform, raw_params)
    params = KernelParams(f=tvals[0], l=tvals[1], mu=tvals[2])

    X_all = jnp.concatenate([X, X_test], axis=0)
    fsopts = dict(oversample=oversample, nearfield_lfil=nearfield_lfil)
    if windows is not None:
        geom_tr = fs.additive_fastsum_geometry(X, windows, N=fastsum_N)
        geom_all = fs.additive_fastsum_geometry(X_all, windows, N=fastsum_N)
        plan_tr = fs.additive_fastsum_coeffs(cfg.kind, params, geom_tr, **fsopts)
        plan_all = fs.additive_fastsum_coeffs(cfg.kind, params, geom_all, **fsopts)
        mv_tr = lambda v: fs.additive_fastsum_matvec(plan_tr, v)
        mv_all = lambda v: fs.additive_fastsum_matvec(plan_all, v)
    else:
        geom_tr = fs.fastsum_geometry(X, N=fastsum_N)
        geom_all = fs.fastsum_geometry(X_all, N=fastsum_N)
        plan_tr = fs.fastsum_coeffs(cfg.kind, params, geom_tr, **fsopts)
        plan_all = fs.fastsum_coeffs(cfg.kind, params, geom_all, **fsopts)
        mv_tr = lambda v: fs.fastsum_matvec(plan_tr, v)
        mv_all = lambda v: fs.fastsum_matvec(plan_all, v)

    precond = precond_setup(params) if precond_setup is not None else None
    psolve = precond.solve if precond is not None else None

    its = maxits if maxits is not None else min(n, 200)
    sol = fgmres(mv_tr, y, precond=psolve, kdim=its, maxits=its, tol=cfg.tol, atol=cfg.atol)

    # mean: multiply the joint kernel by [iKY; 0], read the tail.  The joint
    # matvec includes the mu-diagonal term, but the tail of mu*[iKY;0] is 0,
    # so no correction is needed (matches the reference's use of the full
    # joint symv on a zero-padded vector).
    padded = jnp.concatenate([sol.x, jnp.zeros((n_test,), y.dtype)])
    mean = mv_all(padded)[n:]

    std = None
    if with_std:
        f2 = params.f * params.f
        K22_diag = f2 * (1.0 + params.mu) * jnp.ones((n_test,), y.dtype)

        # BATCHED per-point variance solves (replaces the reference's serial
        # loop, nfft_interface.c:1015-1057): chunks of test points run as
        # vmapped joint-plan column extractions + vmapped FGMRES solves —
        # under the streamed engine the vmapped matvecs dispatch to the
        # multi-RHS packed kernels (one table stream per pass,
        # ops/fastsum.packed_ndft_matvec_batch).  Chunking bounds the
        # (kdim+1, n)-basis memory at chunk * its * n.
        chunk = max(1, min(std_chunk, n_test))
        n_pad = -(-n_test // chunk) * chunk

        def solve_chunk(idx_chunk):
            E = jax.nn.one_hot(n + idx_chunk, n + n_test, dtype=y.dtype)
            cols = jax.vmap(mv_all)(E)          # (chunk, n+n_test)
            k12 = cols[:, :n]
            sx = jax.vmap(
                lambda rhs: fgmres(mv_tr, rhs, precond=psolve, kdim=its,
                                   maxits=its, tol=cfg.tol, atol=cfg.atol).x
            )(k12)
            return jnp.sum(k12 * sx, axis=1)    # quadratic forms

        idx_all = jnp.arange(n_pad).reshape(-1, chunk)
        quad = jax.lax.map(solve_chunk, idx_all).reshape(-1)[:n_test]
        std = jnp.sqrt(jnp.abs(K22_diag - quad))

    return GPPredictResult(mean=mean, std=std, solve_relres=sol.relres, solve_iters=sol.niter)
