"""FSAI — factored sparse approximate inverse preconditioner.

TPU-native rebuild of SRC/preconds/fsai.c: G ~= L^{-1} lower-triangular on a
KNN pattern, so M^{-1} = G' G ~= K^{-1}.

Per row i with pattern J (lfil-1 nearest preceding points + i last):
  u  = K(J,J)^{-1} e_last            (small cholesky solve, fsai.c:374-397)
  g  = u / sqrt(u_last)
  dg_j = -K^{-1} (dK_j g) - 0.5 * dg_j[last] * dd * g   (fsai.c:470-663)

The reference's per-row OpenMP loop with per-thread LAPACK becomes ONE
vmap'ed batched cholesky over all n rows of fixed size lfil — padded rows are
spliced with identity blocks so every row has static shape.

Apply / trace / dvp (fsai.c:106-300):
  solve:   x = G'(G r)                     (two padded-ELL products)
  logdet:  -2 sum log diag(G)
  trace_j: 2 sum_i dG_ii / G_ii
  dvp:     exactly the reference's operator sequence (fsai.c:158-216):
             px = G' G^{-T} dG' G^{-T} z + G' dG (G^{-1} G^{-T} z)
           E_z[z' px] equals trace exactly (consistent pair), using blocked
           ELL triangular solves (ops/matops.py) in place of the reference's
           sequential CSR substitution.
  A triangular-solve-free alternative pair (dvp_gram / trace_gram:
  px_j = G'(dG_j z) + dG_j'(G z), trace'_j = 2 <G, dG_j>_F) is kept for
  speed-of-light SLQ where the variance-reduction pairing may be looser.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from ..ops.matops import (
    ell_matvec,
    ell_matvec_batch,
    ell_rmatvec,
    ell_rmatvec_batch,
    ell_rmatvec_t,
    ell_tril_solve,
    ell_triu_solve,
)
from ..ops.knn import knn_pattern
from ..ops.kernels import (
    KernelParams,
    kernel_matrix,
    kernel_matrix_with_grad,
    additive_kernel_matrix,
    additive_kernel_matrix_with_grad,
)


@pytree_dataclass
class FsaiPrecond:
    idx: jnp.ndarray             # (n, lfil) pattern, diagonal at slot lfil-1
    mask: jnp.ndarray            # (n, lfil) validity
    val: jnp.ndarray             # (n, lfil) rows of G
    dval: Optional[jnp.ndarray]  # (3, n, lfil) rows of dG or None
    # True if any row's cholesky broke down (non-SPD block) and was repaired
    # to a diagonal row — the traceable analog of the reference's
    # FSAI-breakdown detection (afn_setup.m:93-98); host callers may use it
    # to fall back to RAN wholesale.
    breakdown: Optional[jnp.ndarray] = None
    # optional precomputed TRANSPOSE pattern (ops/matops.ell_transpose_pattern):
    # makes every G' product a gather-only contraction instead of a
    # scatter-add (which serializes on the tunneled TPU backend — the
    # dominant AFN/FSAI apply cost, ~15 ms at (1e5, 16)).  Params-independent;
    # attach once per dataset (afn_plan / fsai_setup pattern_t).
    t_rows: Optional[jnp.ndarray] = None
    t_slot: Optional[jnp.ndarray] = None
    t_mask: Optional[jnp.ndarray] = None
    # optional CELL-STENCIL layout (ops/cellgrid.py) — the gather-free apply
    # (0.71 vs 11.3 ms at (1e5, 16) on v5e, .r5_stencil_probe.log): rows in
    # cell-sorted order (AFN sorts the Schur tail), G embedded as a dense
    # stencil tensor + tiny COO exception term for nonlocal pattern edges.
    sdev: Optional[object] = None    # cellgrid.CellGridDev
    sA: Optional[object] = None      # StencilMatrix of G
    sAT: Optional[object] = None     # StencilMatrix of G'
    exc_rows: Optional[jnp.ndarray] = None
    exc_cols: Optional[jnp.ndarray] = None
    exc_v: Optional[jnp.ndarray] = None

    def _rmat(self, vals, x):
        """G(vals)' x — gather-only when the transpose pattern is present."""
        if self.t_rows is not None:
            return ell_rmatvec_t(self.t_rows, self.t_slot, self.t_mask, vals, x)
        return ell_rmatvec(self.idx, vals, x)

    def solve(self, r):
        """M^{-1} r = G'(G r); vmapped callers dispatch to the batched ELL
        products (one row-gather/scatter for all probes — SLQ's shape)."""
        if self.sdev is not None:
            return self.apply_Gt(self.apply_G(r))
        return _fsai_solve(self.idx, self.val, self.t_rows, self.t_slot,
                           self.t_mask, r)

    def solve_batch(self, Rb):
        if self.sdev is not None:
            return self.apply_Gt(self.apply_G(Rb.T)).T
        return ell_rmatvec_batch(
            self.idx, self.val, ell_matvec_batch(self.idx, self.val, Rb)
        )

    def apply_G(self, r):
        """G r; r (n,) or (n, nv) on the stencil path."""
        if self.sdev is not None:
            from ..ops.cellgrid import stencil_matvec

            y = stencil_matvec(self.sdev, self.sA, r)
            if r.ndim == 1:
                return y.at[self.exc_rows].add(self.exc_v * r[self.exc_cols])
            return y.at[self.exc_rows].add(self.exc_v[:, None] * r[self.exc_cols])
        return ell_matvec(self.idx, self.val, r)

    def apply_Gt(self, r):
        """G' r; r (n,) or (n, nv) on the stencil path."""
        if self.sdev is not None:
            from ..ops.cellgrid import stencil_matvec

            y = stencil_matvec(self.sdev, self.sAT, r)
            if r.ndim == 1:
                return y.at[self.exc_cols].add(self.exc_v * r[self.exc_rows])
            return y.at[self.exc_cols].add(self.exc_v[:, None] * r[self.exc_rows])
        return self._rmat(self.val, r)

    def logdet(self):
        return -2.0 * jnp.sum(jnp.log(self.val[:, -1]))

    def trace(self):
        """2 sum_i dG_ii/G_ii (fsai.c:222-276); consistent with dvp."""
        return 2.0 * jnp.sum(self.dval[:, :, -1] / self.val[None, :, -1], axis=1)

    def solve_G(self, b):
        """G^{-1} b (ref Nfft4GPPrecondFsaiInvL, fsai.c:675-702)."""
        return ell_tril_solve(self.idx, self.val, b)

    def solve_Gt(self, b):
        """G^{-T} b (ref Nfft4GPPrecondFsaiInvLT, fsai.c:703-729)."""
        return ell_triu_solve(self.idx, self.val, b)

    def dvp(self, z):
        """(3, n) px_j with E[z' px_j] = trace_j (ref fsai.c:125-216)."""
        u = self.solve_Gt(z)                     # G^{-T} z
        m = self.solve_G(u)                      # M z = G^{-1} G^{-T} z

        def one(dv):
            s = self.solve_Gt(self._rmat(dv, u))             # G^{-T} dG' G^{-T} z
            t = s + ell_matvec(self.idx, dv, m)              # + dG M z
            return self._rmat(self.val, t)                   # G' (...)

        return jax.vmap(one)(self.dval)

    def trace_gram(self):
        """Cheap pair: 2 <G, dG_j>_F — consistent with dvp_gram."""
        return 2.0 * jnp.einsum("nl,knl->k", self.val, self.dval)

    def dvp_gram(self, z):
        """Triangular-solve-free consistent pair: G'(dG z) + dG'(G z)."""
        gz = ell_matvec(self.idx, self.val, z)

        def one(dv):
            a = self._rmat(self.val, ell_matvec(self.idx, dv, z))
            b = self._rmat(dv, gz)
            return a + b

        return jax.vmap(one)(self.dval)


from jax import custom_batching


@custom_batching.custom_vmap
def _fsai_solve(idx, val, t_rows, t_slot, t_mask, r):
    if t_rows is not None:
        return ell_rmatvec_t(t_rows, t_slot, t_mask, val,
                             ell_matvec(idx, val, r))
    return ell_rmatvec(idx, val, ell_matvec(idx, val, r))


@_fsai_solve.def_vmap
def _fsai_solve_vmap(axis_size, in_batched, idx, val, t_rows, t_slot, t_mask, Rb):
    # only the RHS axis batches in the solver paths; a batched pattern/values
    # (unused today) falls back to a sequential map
    if any(in_batched[:5]):
        raise NotImplementedError("batched FSAI pattern under vmap")
    out = ell_rmatvec_batch(idx, val, ell_matvec_batch(idx, val, Rb))
    return out, True


def _identity_splice(B, mask):
    """Replace invalid rows/cols of the (lfil, lfil) block with identity."""
    m2 = mask[:, None] & mask[None, :]
    eye = jnp.eye(B.shape[0], dtype=B.dtype)
    return jnp.where(m2, B, eye)


def fsai_rows_from_blocks(blocks, dblocks, mask):
    """Batched FSAI row solves with breakdown repair.

    blocks: (n, lfil, lfil) kernel sub-blocks (invalid entries arbitrary)
    dblocks: (n, 3, lfil, lfil) gradients or None
    mask: (n, lfil)
    Returns (val, dval, breakdown) — breakdown is a scalar bool, True if any
    row's small cholesky failed (non-SPD block).  Failed rows are REPAIRED to
    the diagonal row g = e / sqrt(B_ii) (an SPD, NaN-free preconditioner row),
    the traceable analog of the reference's breakdown -> fallback switch
    (afn_setup.m:93-98); no NaN can escape this function.
    """

    def one(B, dB, m):
        B = _identity_splice(B, m)
        lfil = B.shape[0]
        e = jnp.zeros((lfil,), B.dtype).at[-1].set(1.0)
        Lb = jnp.linalg.cholesky(B)
        u = jax.scipy.linalg.cho_solve((Lb, True), e)
        dd = 1.0 / jnp.sqrt(u[-1])
        g = u * dd
        g = jnp.where(m, g, 0.0)
        # breakdown detection + diagonal repair
        ok = jnp.all(jnp.isfinite(g)) & (u[-1] > 0)
        tiny = jnp.asarray(jnp.finfo(B.dtype).tiny, B.dtype)
        Bll = jnp.maximum(jnp.abs(B[-1, -1]), tiny)
        dd_r = 1.0 / jnp.sqrt(Bll)
        g_r = e * dd_r
        g = jnp.where(ok, g, g_r)
        dd = jnp.where(ok, dd, dd_r)
        if dB is None:
            return g, None, ~ok
        dB = jnp.where(m[None, :, None] & m[None, None, :], dB, 0.0)

        def grad_one(dBj):
            da = jax.scipy.linalg.cho_solve((Lb, True), -(dBj @ g))
            da = da - 0.5 * da[-1] * dd * g
            da = jnp.where(m, da, 0.0)
            # repaired row: g = B_ll^{-1/2} e -> dg = -1/2 B_ll^{-3/2} dB_ll e
            da_r = (-0.5 * dBj[-1, -1] * dd_r * dd_r * dd_r) * e
            return jnp.where(ok, da, da_r)

        dg = jax.vmap(grad_one)(dB)
        return g, dg, ~ok

    if dblocks is None:
        val, bad = jax.vmap(lambda B, m: one(B, None, m)[::2])(blocks, mask)
        return val, None, jnp.any(bad)
    val, dval, bad = jax.vmap(one)(blocks, dblocks, mask)
    return val, jnp.moveaxis(dval, 0, 1), jnp.any(bad)  # dval -> (3, n, lfil)


def fsai_setup(
    kind: str,
    params: KernelParams,
    X,
    lfil: int,
    *,
    require_grad: bool = False,
    windows=None,
    pattern=None,
    block_fn: Optional[Callable] = None,
) -> FsaiPrecond:
    """FSAI on the lfil-nearest-preceding-neighbor pattern.

    block_fn(J) -> (B, dB): optional custom kernel-block evaluator (used by
    AFN's implicit Schur-complement kernel, ref kernels.c:3496+); default
    evaluates the (additive) kernel on the gathered sub-data.
    """
    n = X.shape[0]
    if pattern is None:
        idx, mask = knn_pattern(X, lfil)
    else:
        idx, mask = pattern

    if block_fn is None:

        def block_fn(J):
            XJ = X[J]
            if windows is None:
                if require_grad:
                    return kernel_matrix_with_grad(kind, params, XJ)
                return kernel_matrix(kind, params, XJ), None
            if require_grad:
                return additive_kernel_matrix_with_grad(kind, params, XJ, windows)
            return additive_kernel_matrix(kind, params, XJ, windows), None

    def eval_row(J):
        B, dB = block_fn(J)
        return B, dB

    if require_grad:
        blocks, dblocks = jax.vmap(eval_row)(idx)
    else:
        blocks = jax.vmap(lambda J: eval_row(J)[0])(idx)
        dblocks = None

    val, dval, breakdown = fsai_rows_from_blocks(blocks, dblocks, mask)
    return FsaiPrecond(idx=idx, mask=mask, val=val, dval=dval, breakdown=breakdown)
