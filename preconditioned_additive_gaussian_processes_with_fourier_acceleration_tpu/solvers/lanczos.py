"""Preconditioned Lanczos and stochastic Lanczos quadrature (SLQ).

TPU-native rebuild of Nfft4GPSolverLanczos + Nfft4GPLanczosQuadratureLogdet
(ref: SRC/solvers/lanczos.c).  The recursion maintains the bi-orthogonal pair
of bases V (preconditioned side, v = M^{-1} z) and Z (A-side) with
normalization by sqrt(v' z) — Lanczos on M^{-1}A in the M-inner product —
and records the tridiagonal (TD, TE) via two-basis Gram-Schmidt
(ref: Nfft4GPModifiedGS2, matops.c:346-433).

SLQ (ref: lanczos.c:421-610): for each Rademacher probe z,
  logdet/n  ≈ (1/nvecs) sum_probes sum_j (e1' v_j)^2 log|theta_j|
              + logdet(M)/n
  d logdet_i/n ≈ (1/(nvecs*n)) sum_probes [ (dA_i z)' x  -  (M^{-1}dM_i z)' z ]
              + tr(M^{-1} dM_i)/n
with x the Lanczos solve of A x = z.  Probes are batched with vmap — the
per-probe matvecs fuse into batched matmuls on the MXU instead of the
reference's serial probe loop.

Probes can be injected for determinism (ref: lanczos.h:72, gp_loss.h:44 —
the intended mechanism for reproducible parity tests).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class LanczosResult(NamedTuple):
    x: jnp.ndarray        # approximate solution of A x = b
    alpha: jnp.ndarray    # TD, shape (maxits,), identity-padded past tsize
    beta: jnp.ndarray     # TE, shape (maxits-1,), zero-padded past tsize-1
    tsize: jnp.ndarray    # effective tridiagonal size
    relres: jnp.ndarray
    niter: jnp.ndarray


def lanczos(
    matvec: Callable,
    b: jnp.ndarray,
    *,
    precond: Optional[Callable] = None,
    maxits: int = 50,
    full_reorth: bool = True,
    wsize: Optional[int] = None,
    tol: float = 0.0,
    atol: bool = False,
) -> LanczosResult:
    """Preconditioned Lanczos on A with preconditioner M (x0 = 0).

    With tol=0 the recursion always runs maxits steps (the SLQ setting:
    ref lanczos.c SLQ call passes tol=DBL_EPSILON).  wsize limits the
    reorthogonalization window (ref lanczos.c wsize; None/full_reorth=True =
    full window, full_reorth=False = classic 3-term recursion).
    """
    n = b.shape[0]
    dtype = b.dtype
    psolve = precond if precond is not None else (lambda r: r)
    eps = jnp.finfo(dtype).eps

    z0 = b
    v0 = psolve(z0)
    beta0_sq = jnp.vdot(v0, z0)
    beta0 = jnp.sqrt(jnp.maximum(beta0_sq, 0.0))
    normb = jnp.linalg.norm(b)
    safe_normb = jnp.where(normb == 0, 1.0, normb)
    # tolb: absolute threshold on the (estimated) residual norm — same
    # semantics as pcg.py; the M-norm estimate normr_est below is already an
    # absolute quantity (ref lanczos.c:223-247)
    tolb = jnp.where(jnp.asarray(atol), tol, tol * normb)

    safe_beta0 = jnp.where(beta0 == 0, 1.0, beta0)

    V0 = jnp.zeros((maxits + 1, n), dtype).at[0].set(v0 / safe_beta0)
    Z0 = jnp.zeros((maxits + 1, n), dtype).at[0].set(z0 / safe_beta0)
    TD0 = jnp.ones((maxits,), dtype)       # identity padding
    TE0 = jnp.zeros((max(maxits - 1, 1),), dtype)

    def cond(s):
        V, Z, TD, TE, it, tld, tle, ls, normr, stop = s
        return jnp.logical_and(it < maxits, jnp.logical_not(stop))

    def body(s):
        V, Z, TD, TE, it, TLD, TLE, ls, normr, stop = s
        w = matvec(V[it])  # z_new = A v_it

        # two-basis Gram-Schmidt against (V, Z)[0..it]; coefficients at it
        # and it-1 are the tridiagonal entries.  Two batched GEMV passes
        # (CGS2) replace the reference's sequential MGS2 + selective re-orth
        # (matops.c:346-433): rows past `it` are zero so no masking is
        # needed, and re-orth coefficients accumulate into TD/TE exactly
        # like the C re-orth loop does.
        if full_reorth:
            hp = lambda a, b: jnp.matmul(a, b, precision="highest")
            if wsize is not None:
                row = jnp.arange(maxits + 1)
                wmask = ((row > it - wsize) & (row <= it)).astype(dtype)
            else:
                wmask = 1.0
            t1 = hp(V, w) * wmask
            w = w - hp(t1, Z)
            t2 = hp(V, w) * wmask
            w = w - hp(t2, Z)
            coeff = t1 + t2
            td = coeff[it]
            te = jnp.where(it > 0, coeff[jnp.maximum(it - 1, 0)], 0.0)
        else:
            # window of 2 (classic three-term recursion)
            td = jnp.vdot(V[it], w)
            te = jnp.where(it > 0, jnp.vdot(V[jnp.maximum(it - 1, 0)], w), 0.0)
            w = w - td * Z[it] - te * Z[jnp.maximum(it - 1, 0)]

        t = jnp.linalg.norm(w)
        break1 = t < eps

        vnew = psolve(w)
        dotvz_sq = jnp.vdot(vnew, w)
        dotvz = jnp.sqrt(jnp.maximum(dotvz_sq, 0.0))
        break2 = dotvz < eps
        safe_dotvz = jnp.where(dotvz == 0, 1.0, dotvz)

        keep = jnp.logical_not(jnp.logical_or(break1, break2))
        V = V.at[it + 1].set(jnp.where(keep, vnew / safe_dotvz, 0.0))
        Z = Z.at[it + 1].set(jnp.where(keep, w / safe_dotvz, 0.0))
        TD = TD.at[it].set(jnp.where(jnp.logical_not(break1), td, TD[it]))
        TE = TE.at[jnp.maximum(it - 1, 0)].set(
            jnp.where((it > 0) & jnp.logical_not(break1), te, TE[jnp.maximum(it - 1, 0)])
        )

        # incremental Cholesky residual estimate (ref lanczos.c:223-247)
        normz = jnp.linalg.norm(Z[it + 1])
        first = it == 0
        tld_new = jnp.where(
            first,
            jnp.sqrt(jnp.maximum(td, 0.0)),
            jnp.sqrt(jnp.maximum(td - (te / jnp.where(TLD == 0, 1.0, TLD)) ** 2, 0.0)),
        )
        tle_new = jnp.where(first, 0.0, te / jnp.where(TLD == 0, 1.0, TLD))
        safe_tld_new = jnp.where(tld_new == 0, 1.0, tld_new)
        ls_new = jnp.where(first, 1.0 / safe_tld_new, -ls * tle_new / safe_tld_new)
        normr_new = jnp.where(
            first,
            dotvz / jnp.where(td == 0, 1.0, td) * beta0 * normz,
            jnp.abs(ls_new / safe_tld_new) * dotvz * beta0 * normz,
        )
        # note: ls in reference tracks le*ls product; here ls_new already
        # includes the 1/tld factor of the current step
        normr_est = jnp.where(keep, normr_new, normr)

        it = it + 1
        stop = jnp.logical_or(break1, break2)
        stop = jnp.logical_or(stop, normr_est <= tolb)
        return (V, Z, TD, TE, it, tld_new, tle_new, ls_new, normr_est, stop)

    state = (
        V0, Z0, TD0, TE0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
        normb, beta0 < eps,
    )
    V, Z, TD, TE, it, _, _, _, normr, _ = lax.while_loop(cond, body, state)
    tsize = it

    # mask the tridiagonal to tsize with identity padding
    idx = jnp.arange(maxits)
    TD = jnp.where(idx < tsize, TD, 1.0)
    if maxits > 1:
        eidx = jnp.arange(maxits - 1)
        TE = jnp.where(eidx < tsize - 1, TE[: maxits - 1], 0.0)
    else:
        TE = jnp.zeros((0,), dtype)

    # solution: x = V[:tsize]^T y with T y = beta0 e1 (ref lanczos.c:262-283)
    T = jnp.diag(TD) + (jnp.diag(TE, 1) + jnp.diag(TE, -1) if maxits > 1 else 0.0)
    e1 = jnp.zeros((maxits,), dtype).at[0].set(beta0)
    y = jnp.linalg.solve(T, e1)
    y = jnp.where(idx < tsize, y, 0.0)
    x = jnp.matmul(V[:maxits].T, y, precision="highest")

    return LanczosResult(
        x=x,
        alpha=TD,
        beta=TE,
        tsize=tsize,
        relres=normr / safe_normb,
        niter=it,
    )


class SlqResult(NamedTuple):
    logdet: jnp.ndarray       # logdet(K)/n estimate
    dlogdet: jnp.ndarray      # (p,) trace terms tr(K^{-1} dK_i)/n


def rademacher_probes(key, nvecs: int, n: int, dtype=None):
    """Rademacher +-1 probe matrix (nvecs, n) — ref: Nfft4GPVecRadamacher."""
    dtype = dtype or jnp.result_type(float)
    return jax.random.rademacher(key, (nvecs, n), dtype=dtype)


def slq_logdet(
    matvec: Callable,
    dmatvec: Callable,
    probes: jnp.ndarray,
    *,
    maxits: int = 10,
    precond=None,
) -> SlqResult:
    """Stochastic Lanczos quadrature for logdet(K)/n and tr(K^{-1}dK_i)/n.

    matvec: x -> K x; dmatvec: x -> (p, n) stacked dK_i x.
    probes: (nvecs, n) Rademacher matrix (injectable for determinism).
    precond: optional preconditioner pytree with .solve/.trace/.logdet/.dvp —
    Lanczos then runs on M^{-1}K and the estimate is corrected by
    logdet(M)/n and tr(M^{-1}dM_i)/n (ref lanczos.c:456-466, 588-596).
    """
    nvecs, n = probes.shape
    psolve = precond.solve if precond is not None else None

    def one_probe(z):
        res = lanczos(matvec, z, precond=psolve, maxits=maxits, tol=0.0)
        # NaN-trim: keep only the leading finite block of the tridiagonal
        # before quadrature (ref lanczos.c:526-548 trims T and dumps
        # diagnostics when the recursion blows up).  Trimmed diagonal
        # entries pad with 1 (log|1| = 0 contributes nothing).
        idx = jnp.arange(maxits)
        bad_a = jnp.logical_not(jnp.isfinite(res.alpha))
        keep = jnp.min(jnp.where(bad_a, idx, maxits))
        alpha = jnp.where(idx < keep, res.alpha, 1.0)
        if maxits > 1:
            eidx = jnp.arange(maxits - 1)
            bad_b = jnp.logical_not(jnp.isfinite(res.beta))
            keep = jnp.minimum(keep, jnp.min(jnp.where(bad_b, eidx + 1, maxits)))
            alpha = jnp.where(idx < keep, res.alpha, 1.0)
            beta = jnp.where(eidx < keep - 1, res.beta, 0.0)
        # quadrature on the tridiagonal: tiny dense eigh (maxits x maxits)
        T = jnp.diag(alpha)
        if maxits > 1:
            T = T + jnp.diag(beta, 1) + jnp.diag(beta, -1)
        theta, vecs = jnp.linalg.eigh(T)
        w = vecs[0, :] ** 2
        val = jnp.sum(w * jnp.log(jnp.abs(theta)))

        dAz = dmatvec(z)                       # (p, n)
        # sanitize the Lanczos solve the same way: a blown-up recursion
        # yields NaN x; zeroing keeps the trace estimate finite (degraded,
        # like the reference's trimmed quadrature).
        x = jnp.where(jnp.isfinite(res.x), res.x, 0.0)
        dval = dAz @ x                         # (p,)
        if precond is not None:
            pz = precond.dvp(z)                # (p, n) = M^{-1} dM_i z
            dval = dval - pz @ z
        return val, dval

    vals, dvals = jax.vmap(one_probe)(probes)
    logdet = jnp.mean(vals)
    dlogdet = jnp.mean(dvals, axis=0) / n

    if precond is not None:
        logdet = logdet + precond.logdet() / n
        dlogdet = dlogdet + precond.trace() / n
    return SlqResult(logdet=logdet, dlogdet=dlogdet)
