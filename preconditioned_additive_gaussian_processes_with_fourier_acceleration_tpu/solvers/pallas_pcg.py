"""Fused dense-operator PCG — one Pallas kernel for the whole solve.

The reference's PCG (SRC/solvers/pcg.c) does one matvec + a handful of
axpys/dots per iteration.  At small n (the multiclass / TEST2-scale
problems, n <= a few thousand) the XLA while_loop version is dominated by
per-op latencies, not FLOPs (~30 ms for a whole GP loss step at n=2048,
PLAN.md).  This kernel runs the ENTIRE CG iteration loop on-core:

- x, r, p, q live in VMEM scratch for the whole solve;
- K streams from HBM in (blk, n) row panels with double-buffered async
  DMA, so the matvec runs at the HBM roofline;
- dots/axpys are VPU ops between panels — no dispatch gaps;
- breakdown guards (rho == 0, pq <= 0) and the tolerance check use the
  same masking semantics as solvers/pcg.py (iterations past convergence
  become no-ops, matching the fixed-shape while_loop design).

Unpreconditioned CG only (M = I): the dense-K small-n regime this kernel
targets is exactly where the reference runs plain CG; preconditioned
variants stay on solvers/pcg.py.  Returns (x, relres, niter).

Ref: SRC/solvers/pcg.c:3-206 (semantics), SURVEY.md §7.4 (fused Krylov).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _pcg_kernel(n, npad, blk, maxits, tol,
                K_hbm, b_ref, out_x, out_stats,
                xs, rs, ps, qs, Kbuf, sem):
    nb = npad // blk
    f32 = jnp.float32

    # mask of valid rows (padding rows are zero in b and K panels)
    b = b_ref[:, :]                               # (1, npad)
    normb_sq = jnp.sum(b * b)
    safe_nb2 = jnp.where(normb_sq == 0, 1.0, normb_sq)
    tolb_sq = (tol * tol) * safe_nb2

    xs[:, :] = jnp.zeros_like(xs)
    rs[:, :] = b
    ps[:, :] = b

    def matvec_into_q():
        """q = K @ p with double-buffered (blk, npad) panel streaming."""

        def get_dma(slot, j):
            return pltpu.make_async_copy(
                K_hbm.at[pl.ds(j * blk, blk), :],
                Kbuf.at[slot],
                sem.at[slot],
            )

        get_dma(0, 0).start()

        def body(j, _):
            slot = j % 2

            @pl.when(j + 1 < nb)
            def _():
                get_dma((j + 1) % 2, j + 1).start()

            get_dma(slot, j).wait()
            # (blk, npad) @ (npad, 1) -> contraction over lanes: use
            # row-wise multiply + lane reduction (p broadcast over rows)
            panel = Kbuf[slot]                     # (blk, npad)
            qj = jnp.sum(panel * ps[0, :][None, :], axis=1)  # (blk,)
            qs[0, pl.ds(j * blk, blk)] = qj
            return 0

        jax.lax.fori_loop(0, nb, body, 0)

    def step(it, carry):
        rho_prev, normr_sq, niter, stop = carry

        rho = jnp.sum(rs[:, :] * rs[:, :])        # M = I: z = r
        first = it == 0
        beta = jnp.where(first, 0.0,
                         rho / jnp.where(rho_prev == 0, 1.0, rho_prev))

        @pl.when(jnp.logical_not(stop))
        def _():
            ps[:, :] = rs[:, :] + beta * ps[:, :]

        matvec_into_q()

        pq = jnp.sum(ps[:, :] * qs[:, :])
        breakdown = jnp.logical_or(rho == 0.0, pq <= 0.0)
        alpha = jnp.where(
            jnp.logical_or(breakdown, stop),
            0.0,
            rho / jnp.where(pq == 0, 1.0, pq),
        )
        xs[:, :] = xs[:, :] + alpha * ps[:, :]
        rs[:, :] = rs[:, :] - alpha * qs[:, :]
        normr_sq_new = jnp.sum(rs[:, :] * rs[:, :])

        active = jnp.logical_not(stop)
        normr_sq = jnp.where(active, normr_sq_new, normr_sq)
        niter = niter + jnp.where(active, 1, 0)
        stop = jnp.logical_or(
            stop, jnp.logical_or(breakdown, normr_sq <= tolb_sq)
        )
        return rho, normr_sq, niter, stop

    init = (
        jnp.asarray(0.0, f32),
        normb_sq,
        jnp.asarray(0, jnp.int32),
        normb_sq <= tolb_sq,
    )
    _, normr_sq, niter, _ = jax.lax.fori_loop(0, maxits, step, init)

    out_x[:, :] = xs[:, :]
    out_stats[0, 0] = jnp.sqrt(jnp.maximum(normr_sq, 0.0) / safe_nb2)
    out_stats[0, 1] = niter.astype(f32)


@functools.partial(jax.jit, static_argnames=("maxits", "tol", "blk",
                                             "interpret"))
def fused_pcg_dense(K, b, *, maxits: int = 100, tol: float = 1e-6,
                    blk: int = 256, interpret: bool = False):
    """Solve K x = b (SPD dense K, no preconditioner) in ONE kernel launch.

    Returns (x, relres, niter).  K is padded to lane/sublane multiples;
    padding rows/cols are zero so they never affect the iteration (their
    residual entries stay 0).
    """
    n = b.shape[0]
    npad = _cdiv(n, 256) * 256
    blk = min(blk, npad)
    f32 = jnp.float32
    Kp = jnp.zeros((npad, npad), f32).at[:n, :n].set(K.astype(f32))
    bp = jnp.zeros((1, npad), f32).at[0, :n].set(b.astype(f32))

    out_x, out_stats = pl.pallas_call(
        functools.partial(_pcg_kernel, n, npad, blk, maxits, tol),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # K stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, npad), f32),
            jax.ShapeDtypeStruct((1, 2), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, npad), f32),                # x
            pltpu.VMEM((1, npad), f32),                # r
            pltpu.VMEM((1, npad), f32),                # p
            pltpu.VMEM((1, npad), f32),                # q
            pltpu.VMEM((2, blk, npad), f32),           # K panel double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(Kp, bp)
    x = out_x[0, :n].astype(b.dtype)
    return x, out_stats[0, 0], out_stats[0, 1].astype(jnp.int32)


# --- fused batched Lanczos (SLQ engine for small dense K) -------------------

def _lanczos_kernel(nv, npad, maxits, K_ref, Z_ref,
                    out_alpha, out_beta, out_V, out_beta0,
                    Vh, Zh, w_s, t1_s):
    """All nv probes' FULL Lanczos recursions in one kernel.

    K stays resident in VMEM (npad^2 * 4 B — the <=4k dense regime fits);
    the matvec for all probes is ONE (nv, npad) @ (npad, npad) MXU GEMM per
    iteration; CGS2 reorthogonalization is elementwise multiply+reduce over
    the VMEM-resident basis history.  Matches solvers/lanczos.lanczos with
    precond=None, full_reorth=True, wsize=None, tol=0 (the SLQ setting).

    Histories are (maxits+1, nv, npad) VMEM scratch: Vh the normalized
    V basis, Zh the A-side basis (identical to Vh when M = I except for
    shared normalization — kept separate to mirror the two-basis recursion).
    """
    f32 = jnp.float32
    K = K_ref[...]
    Z = Z_ref[...]                                   # (nv, npad)

    beta0_sq = jnp.sum(Z * Z, axis=1, keepdims=True)     # (nv, 1)
    beta0 = jnp.sqrt(jnp.maximum(beta0_sq, 0.0))
    safe_b0 = jnp.where(beta0 == 0.0, 1.0, beta0)
    eps = jnp.asarray(jnp.finfo(f32).eps, f32)

    Vh[...] = jnp.zeros_like(Vh)
    Zh[...] = jnp.zeros_like(Zh)
    Vh[0] = Z / safe_b0
    Zh[0] = Z / safe_b0
    out_alpha[...] = jnp.ones_like(out_alpha)        # identity padding
    out_beta[...] = jnp.zeros_like(out_beta)
    out_beta0[...] = beta0

    def step(it, stop):
        v_it = Vh[it]                                # (nv, npad)
        w_s[...] = jax.lax.dot_general(
            v_it, K, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

        # CGS2 against the full history: rows past `it` are zero, so no
        # masking is needed (same trick as solvers/lanczos.py).
        for _ in range(2):
            w = w_s[...]
            t1_s[...] = jnp.sum(Vh[...] * w[None, :, :], axis=2)   # (m+1, nv)
            w_s[...] = w - jnp.sum(
                t1_s[...][:, :, None] * Zh[...], axis=0
            )
            if _ == 0:
                coeff = t1_s[...]
            else:
                coeff = coeff + t1_s[...]

        td = jax.lax.dynamic_slice_in_dim(coeff, it, 1, 0)[0]      # (nv,)
        itm1 = jnp.maximum(it - 1, 0)
        te = jax.lax.dynamic_slice_in_dim(coeff, itm1, 1, 0)[0]
        te = jnp.where(it > 0, te, 0.0)

        w = w_s[...]
        t = jnp.sqrt(jnp.sum(w * w, axis=1))                       # (nv,)
        break1 = t < eps
        # M = I: vnew = w, dotvz = ||w||
        break2 = break1
        keep = jnp.logical_and(jnp.logical_not(break1 | break2),
                               jnp.logical_not(stop))
        safe_t = jnp.where(t == 0.0, 1.0, t)
        Vh[it + 1] = jnp.where(keep[:, None], w / safe_t[:, None], 0.0)
        Zh[it + 1] = Vh[it + 1]

        live = jnp.logical_not(stop) & jnp.logical_not(break1)
        a_row = jnp.where(live, td, 1.0)
        out_alpha[...] = jax.lax.dynamic_update_slice_in_dim(
            out_alpha[...], a_row[None, :], it, 0
        )
        b_live = live & (it > 0)
        b_row = jnp.where(b_live, te, 0.0)
        out_beta[...] = jax.lax.dynamic_update_slice_in_dim(
            out_beta[...], b_row[None, :], itm1, 0
        )
        return jnp.logical_or(stop, break1 | break2)

    jax.lax.fori_loop(0, maxits, step, jnp.zeros((nv,), jnp.bool_))
    out_V[...] = Vh[: maxits + 1]


@functools.partial(jax.jit, static_argnames=("maxits", "interpret"))
def fused_lanczos_dense(K, Z, *, maxits: int = 10, interpret: bool = False):
    """Batched unpreconditioned Lanczos of all probes in ONE kernel launch.

    K: (n, n) SPD dense; Z: (nv, n) probes.  Returns (alpha (nv, maxits),
    beta (nv, maxits-1), V (nv, maxits+1, n), beta0 (nv,)) matching
    solvers/lanczos.lanczos per probe (identity/zero padding past
    breakdown).  The SLQ quadrature + tridiagonal solve stay outside (tiny
    eigh/solve).  Ref: SRC/solvers/lanczos.c:421-610; SURVEY.md §7.4.

    VMEM bound: K (npad^2 f32) plus the V/Z histories (2 (maxits+1, nv,
    npad)) must fit in ~128 MB VMEM unblocked — with nv=10, maxits=10 that
    caps n at ~2k (K 16 MB + histories 18 MB at npad=2048; n=4k needs 64 MB
    for K alone and is the hard ceiling).  Currently validated in interpret
    mode and on-chip via tests/chip probes only; not wired into a
    production loss path (the XLA-batched lanczos in solvers/lanczos.py is
    the shipped SLQ engine).
    """
    n = Z.shape[-1]
    nv = Z.shape[0]
    npad = _cdiv(n, 256) * 256
    f32 = jnp.float32
    Kp = jnp.zeros((npad, npad), f32).at[:n, :n].set(K.astype(f32))
    Zp = jnp.zeros((nv, npad), f32).at[:, :n].set(Z.astype(f32))
    m1 = maxits + 1

    alpha, beta, V, beta0 = pl.pallas_call(
        functools.partial(_lanczos_kernel, nv, npad, maxits),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((maxits, nv), f32),
            jax.ShapeDtypeStruct((max(maxits - 1, 1), nv), f32),
            jax.ShapeDtypeStruct((m1, nv, npad), f32),
            jax.ShapeDtypeStruct((nv, 1), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m1, nv, npad), f32),           # V history
            pltpu.VMEM((m1, nv, npad), f32),           # Z history
            pltpu.VMEM((nv, npad), f32),               # w workspace
            pltpu.VMEM((m1, nv), f32),                 # reorth coeffs
        ],
        interpret=interpret,
    )(Kp, Zp)

    alpha = alpha.T                                    # (nv, maxits)
    beta = beta.T[:, : max(maxits - 1, 0)]
    V = jnp.moveaxis(V, 1, 0)[:, :, :n]                # (nv, m1, n)
    return alpha, beta, V, beta0[:, 0]
