"""Flexible GMRES.

TPU-native rebuild of Nfft4GPSolverFgmres (ref: SRC/solvers/fgmres.c:3-252):
restarted flexible GMRES with modified Gram-Schmidt + selective
re-orthogonalization (tol 1/sqrt(2), ref matops.c:274-346), Givens rotations
for the small least-squares problem, and per-column storage of the
preconditioned basis Z = M^{-1} V (flexible preconditioning).

All basis arrays are fixed (kdim+1, n) blocks; the Arnoldi loop is a
lax.while_loop with an active flag, so convergence-dependent iteration counts
compile once (SURVEY.md §7 "convergence-dependent loops under jit").
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .reductions import comp_gemv, make_reducers


class FgmresResult(NamedTuple):
    x: jnp.ndarray
    relres: jnp.ndarray
    niter: jnp.ndarray
    res_history: jnp.ndarray
    converged: jnp.ndarray


def _cgs2(w, V, compensated: bool = False, norm_fn=jnp.linalg.norm):
    """Two-pass classical Gram-Schmidt of w against the rows of V.

    Rows of V past the current Arnoldi step are zero, so they contribute
    nothing — no masking or sequential loop needed.  Two batched GEMVs per
    pass replace the reference's sequential MGS + selective re-orth
    (matops.c:274-346): CGS2 has the same stability and maps to the MXU.
    compensated=True uses TwoSum-accumulated GEMVs for the projection
    coefficients (f64 accumulation parity at f32, see reductions.py).
    Returns (w_orth, h, ||w_orth||).
    """
    hp = lambda a, b: jnp.matmul(a, b, precision="highest")
    proj = (lambda V_, w_: comp_gemv(V_, w_)) if compensated else hp
    h1 = proj(V, w)
    w = w - hp(h1, V)
    h2 = proj(V, w)
    w = w - hp(h2, V)
    return w, h1 + h2, norm_fn(w)


def fgmres(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    precond: Optional[Callable] = None,
    kdim: int = 50,
    maxits: Optional[int] = None,
    tol: float = 1e-8,
    atol: bool = False,
    compensated: bool = False,
) -> FgmresResult:
    """compensated=True: TwoSum float-float accumulation in norms and
    Gram-Schmidt projections (reference f64 semantics at f32; reductions.py)."""
    n = b.shape[0]
    dtype = b.dtype
    x0 = jnp.zeros_like(b) if x0 is None else x0
    psolve = precond if precond is not None else (lambda r: r)
    maxits = kdim if maxits is None else maxits
    dot_fn, norm_fn = make_reducers(compensated)

    normb = norm_fn(b)
    safe_normb = jnp.where(normb == 0, 1.0, normb)
    tolb = jnp.where(jnp.asarray(atol), tol, tol * normb)

    hist0 = jnp.full((maxits + 1,), jnp.nan, dtype=dtype)

    def cycle(carry):
        x, total_it, hist, stop = carry
        r = b - matvec(x)
        beta = norm_fn(r)
        hist = hist.at[total_it].set(beta / safe_normb)
        safe_beta = jnp.where(beta == 0, 1.0, beta)

        V0 = jnp.zeros((kdim + 1, n), dtype)
        Z0 = jnp.zeros((kdim, n), dtype)
        H0 = jnp.zeros((kdim + 1, kdim), dtype)
        V0 = V0.at[0].set(r / safe_beta)
        g0 = jnp.zeros((kdim + 1,), dtype).at[0].set(beta)
        cs0 = jnp.zeros((kdim,), dtype)
        sn0 = jnp.zeros((kdim,), dtype)

        def inner_cond(s):
            (V, Z, H, g, cs, sn, j, res, hist, inner_stop) = s
            return jnp.logical_and(j < kdim, jnp.logical_not(inner_stop))

        def inner_body(s):
            (V, Z, H, g, cs, sn, j, res, hist, inner_stop) = s
            zj = psolve(V[j])
            Z = Z.at[j].set(zj)
            w = matvec(zj)
            w, h, t = _cgs2(w, V, compensated, norm_fn)
            h = h.at[j + 1].set(t)
            lucky = t <= jnp.finfo(dtype).eps * safe_normb
            safe_t = jnp.where(t == 0, 1.0, t)
            V = V.at[j + 1].set(w / safe_t)

            # apply previous Givens rotations to column h
            def rot_body(i, h):
                active = i < j
                hi = h[i]
                hi1 = h[i + 1]
                new_hi = cs[i] * hi + sn[i] * hi1
                new_hi1 = -sn[i] * hi + cs[i] * hi1
                h = h.at[i].set(jnp.where(active, new_hi, hi))
                h = h.at[i + 1].set(jnp.where(active, new_hi1, hi1))
                return h

            h = lax.fori_loop(0, kdim, rot_body, h)

            # new rotation zeroing h[j+1]
            denom = jnp.sqrt(h[j] * h[j] + h[j + 1] * h[j + 1])
            safe_denom = jnp.where(denom == 0, 1.0, denom)
            c = jnp.where(denom == 0, 1.0, h[j] / safe_denom)
            sgn = jnp.where(denom == 0, 0.0, h[j + 1] / safe_denom)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(sgn)
            h = h.at[j].set(denom).at[j + 1].set(0.0)
            H = H.at[:, j].set(h)

            gj = g[j]
            g = g.at[j].set(c * gj)
            g = g.at[j + 1].set(-sgn * gj)
            res = jnp.abs(g[j + 1])
            hist = hist.at[total_it + j + 1].set(res / safe_normb)

            inner_stop = jnp.logical_or(res <= tolb, lucky)
            inner_stop = jnp.logical_or(inner_stop, total_it + j + 1 >= maxits)
            return (V, Z, H, g, cs, sn, j + 1, res, hist, inner_stop)

        s0 = (V0, Z0, H0, g0, cs0, sn0, jnp.asarray(0, jnp.int32), beta, hist, beta <= tolb)
        V, Z, H, g, cs, sn, j, res, hist, _ = lax.while_loop(inner_cond, inner_body, s0)

        # solve the (masked) upper-triangular system R y = g
        col_idx = jnp.arange(kdim)
        active_col = col_idx < j
        R = H[:kdim, :]
        R = jnp.where(active_col[None, :] & active_col[:, None], R, 0.0)
        R = R + jnp.diag(jnp.where(active_col, 0.0, 1.0))
        ge = jnp.where(active_col, g[:kdim], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, ge, lower=False)
        if compensated:
            # the update sum_j y_j Z_j cancels catastrophically when the
            # preconditioned basis is 1/eta-amplified (Nystrom/AFN solves
            # scale by 1/(mu f^2)): terms O(1/eta) sum to x = O(1).  A
            # TwoSum scan over the kdim axis caps the cancellation error at
            # ~eps * max|y_j Z_j| instead of ~eps * sqrt(k) * max (measured
            # true-residual floor 3e-3 -> deeper at n=1e5, mu=0.01).
            from .reductions import _two_sum

            def upd(carry, yz):
                hi, lo = carry
                hi, e = _two_sum(hi, yz)
                return (hi, lo + e), None

            z0 = jnp.zeros_like(x)
            (hi, lo), _ = lax.scan(upd, (x, z0), y[:, None] * Z)
            x = hi + lo
        else:
            x = x + jnp.matmul(Z.T, y, precision="highest")

        total_it = total_it + j
        # stop on the TRUE residual, not the Givens estimate: in f32 the
        # inner estimate drifts optimistic below ~1e-3 (measured: estimate
        # 1e-4 vs true 1.8e-3 at n=1e5), so gating the restart loop on it
        # both stops too early and loses the self-correcting restart
        # (each cycle restarts from the true residual — the f32 analog of
        # the reference's convergence behavior in f64, fgmres.c:197-240).
        # One extra matvec per restart cycle.
        rt = b - matvec(x)
        res_true = norm_fn(rt)
        stop = jnp.logical_or(res_true <= tolb, total_it >= maxits)
        return (x, total_it, hist, stop)

    def outer_cond(carry):
        x, total_it, hist, stop = carry
        return jnp.logical_not(stop)

    carry = (x0, jnp.asarray(0, jnp.int32), hist0, jnp.asarray(False))
    # restart cycles until true-residual convergence or the iteration
    # budget; a while_loop (not a cycle-count fori) because early inner
    # exits make the per-cycle iteration count data-dependent
    x, total_it, hist, stop = lax.while_loop(outer_cond, cycle, carry)

    r = b - matvec(x)
    relres = norm_fn(r) / safe_normb
    return FgmresResult(
        x=x,
        relres=relres,
        niter=total_it,
        res_history=hist,
        converged=relres * safe_normb <= tolb,
    )
