"""Preconditioned conjugate gradient.

TPU-native rebuild of Nfft4GPSolverPcg (ref: SRC/solvers/pcg.c:3-206):
textbook PCG with relative-or-absolute tolerance, breakdown guards on
rho == 0 / pq <= 0, a true-residual re-check on tentative convergence
(pcg.c:181-193 — guards inexact fast matvecs), and a full residual history.

The loop is a fixed-shape lax.while_loop so the whole solve stays inside one
XLA computation; each dot product is a full reduction (a psum under
shard_map on a device mesh — see parallel/).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .reductions import make_reducers


class PcgResult(NamedTuple):
    x: jnp.ndarray
    relres: jnp.ndarray          # final true relative residual
    niter: jnp.ndarray           # iterations executed
    res_history: jnp.ndarray     # relative residual per iteration, nan-padded
    converged: jnp.ndarray


def pcg(
    matvec: Callable,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    precond: Optional[Callable] = None,
    tol: float = 1e-8,
    atol: bool = False,
    maxits: int = 100,
    compensated: bool = False,
    replace_every: int = 0,
) -> PcgResult:
    """compensated=True: TwoSum float-float dot/norm accumulation — restores
    the reference's f64 reduction semantics on f32 TPUs (see reductions.py);
    needed for deep tolerances at N ~ 1e6.

    replace_every=m > 0: RESIDUAL REPLACEMENT — every m iterations the
    recursion residual is replaced by the true residual b - A x (van der
    Vorst/Ye strategy).  In f32 the recursion residual drifts from the true
    one at ~sqrt(n)*eps*||A||*||x|| per step; replacement restores the
    attainable accuracy to the operator's own noise floor for one extra
    matvec per m iterations.  The reference (f64 CPU) needs only the final
    true-residual re-check (pcg.c:181-193); on f32 TPUs this is the
    periodic form of the same guard."""
    n = b.shape[0]
    dtype = b.dtype
    x0 = jnp.zeros_like(b) if x0 is None else x0
    psolve = precond if precond is not None else (lambda r: r)
    dot_fn, norm_fn = make_reducers(compensated)

    normb = norm_fn(b)
    # tolb: absolute threshold on ||r|| (ref pcg.c:41-52)
    tolb = jnp.where(jnp.asarray(atol), tol, tol * normb)
    safe_normb = jnp.where(normb == 0, 1.0, normb)

    r0 = b - matvec(x0)
    normr0 = norm_fn(r0)

    hist0 = jnp.full((maxits + 1,), jnp.nan, dtype=dtype)
    hist0 = hist0.at[0].set(normr0 / safe_normb)

    def cond(state):
        x, r, p, rho, it, normr, hist, stop = state
        return jnp.logical_and(it < maxits, jnp.logical_not(stop))

    def body(state):
        x, r, p, rho_prev, it, normr, hist, stop = state
        z = psolve(r)
        rho = dot_fn(z, r)
        first = it == 0
        beta = jnp.where(first, 0.0, rho / jnp.where(rho_prev == 0, 1.0, rho_prev))
        p = jnp.where(first, z, z + beta * p)
        q = matvec(p)
        pq = dot_fn(p, q)
        breakdown = jnp.logical_or(rho == 0.0, pq <= 0.0)
        alpha = jnp.where(breakdown, 0.0, rho / jnp.where(pq == 0, 1.0, pq))
        x = x + alpha * p
        r = r - alpha * q
        normr = norm_fn(r)
        it = it + 1
        hist = hist.at[it].set(normr / safe_normb)

        # true-residual re-check on tentative convergence (ref pcg.c:181-193)
        def recheck(args):
            x, r, normr, hist = args
            rt = b - matvec(x)
            normrt = norm_fn(rt)
            hist = hist.at[it].set(normrt / safe_normb)
            return x, rt, normrt, hist

        periodic = jnp.logical_and(
            replace_every > 0, jnp.equal(jnp.mod(it, max(replace_every, 1)), 0)
        )
        tentative = jnp.logical_or(normr <= tolb, periodic)
        x, r, normr, hist = lax.cond(
            tentative, recheck, lambda a: a, (x, r, normr, hist)
        )
        stop = jnp.logical_or(breakdown, normr <= tolb)
        return (x, r, p, rho, it, normr, hist, stop)

    # direct-solution early exit (ref pcg.c:70-84)
    init_stop = normr0 < tolb
    state = (x0, r0, jnp.zeros_like(b), jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32),
             normr0, hist0, init_stop)
    x, r, p, rho, it, normr, hist, stop = lax.while_loop(cond, body, state)
    return PcgResult(
        x=x,
        relres=normr / safe_normb,
        niter=it,
        res_history=hist,
        converged=normr <= tolb,
    )
