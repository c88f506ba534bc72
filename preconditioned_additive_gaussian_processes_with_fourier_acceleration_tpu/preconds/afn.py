"""AFN preconditioner: Nyström on FPS landmarks + FSAI on the implicit
Schur-complement kernel.

Rebuild of the MATLAB reference (the only complete AFN — SURVEY.md §2.9):
afn_setup.m:30-109, afn_solve.m, afn_logdet.m, afn_trace.m, afn_dvp.m, with
the control-flow intent corroborated by SRC/preconds/afn.c:161-485.

Structure (k landmarks, n2 = n - k Schur points, permuted order):
      | K11   K12 |                  U = | L11'   L11^{-1} K12 |
  K = | K12'  K22 |,   M = U' U,         | 0      G^{-T}       |
with L11 = chol(K11) (noise included — same-set kernel evaluation) and G the
FSAI factor of the implicit Schur kernel
  S(i,j) = K22(i,j) - (G K12)_i' (G K12)_j      (schurCombinedKernelMat.m)
evaluated only on the FSAI pattern blocks — S is never materialized.

- solve (afn_solve.m:39-69):   zl = xl - K12'(K11^{-1} xu); yl = G'G zl;
                               yu = K11^{-1}(xu - K12 yl)
- logdet (afn_logdet.m:24-27): 2(sum log diag L11 + sum log 1/diag G)
- trace (afn_trace.m:26-48):   2 sum diag(dU)/diag(U)  — exact tr(M^{-1}dM)
                               because U is triangular
- dvp (afn_dvp.m): px = M^{-1}(dU'U + U'dU) z, using dL11 = L phi(L^{-1}
  dK11 L^{-T}) (the cholesky differential) and the FSAI dG rows

Setup control flow (afn_setup.m:58-98): rank estimation; FPS landmarks; if
estimated rank < maxrank the preconditioner IS plain Nyström on those points
(the "RAN" fallback); otherwise the AFN factorization above.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass
from ..utils.datasets import expand_perm
from ..ops.matops import (
    stable_chol,
    chol_solve,
    tril_solve,
    triu_solve,
    ell_matvec,
    ell_rmatvec,
)
from ..ops.fps import fps
from ..ops.knn import knn_pattern
from ..ops.rankest import estimate_rank, RankestConfig
from ..ops.kernels import (
    KernelParams,
    kernel_matrix,
    kernel_matrix_with_grad,
    additive_kernel_matrix,
    additive_kernel_matrix_with_grad,
)
from .fsai import FsaiPrecond, fsai_rows_from_blocks
from .nystrom import NystromPrecond, nystrom_setup


def _phi(A):
    """Cholesky-differential half operator: tril(A,-1) + diag(A)/2."""
    return jnp.tril(A, -1) + 0.5 * jnp.diag(jnp.diag(A))


@pytree_dataclass
class AfnPrecond:
    perm: jnp.ndarray              # (n,) FPS-expanded permutation
    L11: jnp.ndarray               # (k, k)
    K12: jnp.ndarray               # (k, n2)
    GK12: Optional[jnp.ndarray]    # (k, n2) = L11^{-1} K12 (setup-only;
                                   # dropped at large n to save HBM)
    gs: FsaiPrecond                # FSAI of the implicit Schur kernel (size n2)
    # gradient extras
    dL11: Optional[jnp.ndarray]    # (3, k, k)
    dK12: Optional[jnp.ndarray]    # (3, k, n2)
    # inverse permutation: the un-permute runs as a GATHER y[inv_perm]
    # (0.77 ms at n=1e5 via the broadcast-row path) instead of a scatter
    # .at[perm].set (2.4 ms, .r5_stencil_probe.log) — the scatter was the
    # dominant AFN apply cost once the FSAI went stencil
    inv_perm: Optional[jnp.ndarray] = None

    def _unpermute(self, y):
        from ..ops.matops import _gather_vec

        if self.inv_perm is not None:
            return _gather_vec(y, self.inv_perm)
        return jnp.zeros_like(y).at[self.perm].set(y)

    def _unpermute_cols(self, Y):
        if self.inv_perm is not None:
            return Y[self.inv_perm]
        return jnp.zeros_like(Y).at[self.perm].set(Y)

    @property
    def k(self):
        return self.L11.shape[0]

    @property
    def n(self):
        return self.perm.shape[0]

    @property
    def breakdown(self):
        """True if the Schur FSAI factorization broke down (rows repaired).

        Traceable analog of the reference's breakdown check; host callers
        (afn_setup) use it for the wholesale RAN fallback of
        afn_setup.m:93-98."""
        return self.gs.breakdown

    def _chol_solve(self, b):
        return chol_solve(self.L11, b)

    def solve(self, r):
        """M^{-1} r; vmapped callers (SLQ probes) dispatch to solve_batch —
        one permutation row-gather/scatter + batched ELL products for ALL
        probes instead of per-probe irregular memory ops."""
        return _afn_solve(self, r)

    def _solve_impl(self, r):
        from ..ops.matops import _gather_vec

        hm = lambda a, b: jnp.matmul(a, b, precision="highest")
        x = _gather_vec(r, self.perm)
        k = self.k
        xu, xl = x[:k], x[k:]
        zl = xl - hm(self.K12.T, self._chol_solve(xu))
        yl = self.gs.solve(zl)
        yu = self._chol_solve(xu - hm(self.K12, yl))
        y = jnp.concatenate([yu, yl])
        return self._unpermute(y)

    def solve_batch(self, Rb):
        """(nv, n) batched solves sharing the irregular ops."""
        hm = lambda a, b: jnp.matmul(a, b, precision="highest")
        k = self.k
        X2 = Rb.T[self.perm]                       # ONE row-gather (n, nv)
        xu, xl = X2[:k], X2[k:]
        zl = xl - hm(self.K12.T, self._chol_solve(xu))
        yl = self.gs.solve_batch(zl.T).T           # batched ELL products
        yu = self._chol_solve(xu - hm(self.K12, yl))
        y = jnp.concatenate([yu, yl])              # (n, nv)
        return self._unpermute_cols(y).T           # ONE row-gather

    def logdet(self):
        return 2.0 * (
            jnp.sum(jnp.log(jnp.diag(self.L11))) - jnp.sum(jnp.log(self.gs.val[:, -1]))
        )

    def trace(self):
        dldiag = jnp.diagonal(self.dL11, axis1=1, axis2=2)  # (3, k)
        ldiag = jnp.diag(self.L11)
        gdiag = self.gs.val[:, -1]
        dgdiag = self.gs.dval[:, :, -1]                     # (3, n2)
        return 2.0 * (
            jnp.sum(dldiag / ldiag[None, :], axis=1)
            - jnp.sum(dgdiag / gdiag[None, :], axis=1)
        )

    def _dM_apply(self, z):
        """(3, n) stacked dM_j z in permuted order (afn_dvp.m)."""
        k = self.k
        xu, xl = z[:k], z[k:]
        L = self.L11
        K12 = self.K12

        # U z
        K12xl = tril_solve(L, K12 @ xl)                # L^{-1} K12 xl
        z1u = L.T @ xu + K12xl
        z1l = self.gs.solve_Gt(xl)                     # G^{-T} xl
        t = triu_solve(L, z1u)                         # L^{-T} z1u
        Giz1l = self.gs.solve_G(z1l)                   # G^{-1} z1l

        def one(dL, dK12j, dvj):
            # y1 = dU' (U z)
            y1u = dL @ z1u
            y1l = (
                dK12j.T @ t
                - K12.T @ triu_solve(L, dL.T @ t)
                - self.gs.solve_G(ell_matvec(self.gs.idx, dvj, Giz1l))
            )
            # y2 = U' (dU z)
            z2l = -self.gs.solve_Gt(
                ell_rmatvec(self.gs.idx, dvj, z1l)     # dG' (G^{-T} xl)
            )
            y2u_i = dK12j @ xl - dL @ K12xl
            z2u = dL.T @ xu + tril_solve(L, y2u_i)
            y2u = L @ z2u
            y2l = K12.T @ triu_solve(L, z2u) + self.gs.solve_G(z2l)
            return jnp.concatenate([y1u + y2u, y1l + y2l])

        return jax.vmap(one)(self.dL11, self.dK12, self.gs.dval)

    def dvp(self, z):
        """(3, n) px_j = M^{-1} dM_j z — E[z' px_j] = trace()[j]."""
        zp = z[self.perm]
        dMz = self._dM_apply(zp)

        def solve_permuted(x):
            hm = lambda a, b: jnp.matmul(a, b, precision="highest")
            k = self.k
            xu, xl = x[:k], x[k:]
            zl = xl - hm(self.K12.T, self._chol_solve(xu))
            yl = self.gs.solve(zl)
            yu = self._chol_solve(xu - hm(self.K12, yl))
            return jnp.concatenate([yu, yl])

        px = jax.vmap(solve_permuted)(dMz)
        return jax.vmap(self._unpermute)(px)


from jax import custom_batching


@custom_batching.custom_vmap
def _afn_solve(pre, r):
    return pre._solve_impl(r)


@_afn_solve.def_vmap
def _afn_solve_vmap(axis_size, in_batched, pre, Rb):
    return pre.solve_batch(Rb), True


class AfnPlan(NamedTuple):
    """Static structure decided once per dataset (host side)."""

    perm: np.ndarray        # (n,) FPS-expanded permutation
    k: int                  # landmark count
    use_ran: bool           # True -> plain Nyström fallback
    pattern: tuple          # (idx, mask) KNN pattern on the Schur points
    # (t_rows, t_slot, t_mask) transpose of the pattern — gather-only G'
    # products in the apply (ops/matops.ell_transpose_pattern); None = use
    # the scatter-add fallback
    pattern_t: Optional[tuple] = None
    # CELL-STENCIL layout of the Schur FSAI (ops/cellgrid.py): the Schur
    # tail of `perm` is cell-sorted (2-D PCA projection when d > 3 — a
    # projection KNN pattern preconditions as well as the full-d one,
    # .r5_pattern_probe_*.log) so the G/G' applies are gather-free stencil
    # contractions.  None = padded-ELL applies.
    sdev: Optional[object] = None    # cellgrid.CellGridDev
    semb: Optional[object] = None    # cellgrid.StencilEmbed


def afn_plan(
    kind: str,
    params: KernelParams,
    X,
    *,
    maxrank: int = 200,
    lfil: int = 20,
    key=None,
    rank: Optional[int] = None,
    rankest_cfg: RankestConfig = RankestConfig(),
    force_afn: bool = False,
) -> AfnPlan:
    """Rank estimation + FPS + pattern construction (afn_setup.m:58-78)."""
    from ..ops.rankest import rankest_default

    n = X.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    fps_prefix = None
    if rank is None:
        # two-stage estimate (ref afn.c:182-243): scaled Nyström-error first;
        # if it says "not low rank" use maxrank (AFN path), otherwise refine
        # with the full eigen-curve + fill-distance-knee estimator, whose
        # full-set FPS-with-learned-tolerance stage (rankest.c:133-179) also
        # produces the landmark ordering we reuse below
        k1 = estimate_rank(kind, params, X, key, rankest_cfg)
        if k1 >= maxrank:
            rank = maxrank
        else:
            rank, fps_prefix = rankest_default(
                kind, params, X, key, rankest_cfg, maxrank=maxrank
            )
            rank = min(max(k1, rank), maxrank)
    k = min(rank, maxrank, n)
    use_ran = (k < maxrank) and not force_afn
    k = max(k, 1)

    # single jits with X as an argument: eager ops here are per-op compile
    # round-trips on the remote-compile TPU backend, and closure-captured
    # arrays would inline as MLIR constants
    if fps_prefix is not None:
        perm = np.asarray(
            jax.jit(lambda pv: expand_perm(pv[:k], n))(jnp.asarray(fps_prefix))
        )
    else:
        # host FPS: plan-time landmark selection is O(nk) numpy — next to
        # nothing vs a tunneled compile + k-step device dispatch
        from ..ops.fps import fps_host

        pk, _ = fps_host(np.asarray(X), k)
        rest = np.setdiff1d(np.arange(n, dtype=np.int64), pk,
                            assume_unique=False)
        perm = np.concatenate([pk, rest])
    if use_ran:
        pattern = (np.zeros((0, lfil), np.int32), np.zeros((0, lfil), bool))
        return AfnPlan(perm=perm, k=k, use_ran=use_ran, pattern=pattern)

    # cell-sort the Schur tail so the FSAI pattern is stencil-local and the
    # G/G' applies run gather-free (ops/cellgrid.py; 0.71 vs 11.3 ms at
    # (1e5, 16) on v5e).  d > 3 sorts/patterns in the 2-PC PCA projection —
    # measured equal preconditioning quality (.r5_pattern_probe_*.log).
    from ..ops import cellgrid as cg

    X2np = np.asarray(X)[perm[k:]]
    d_amb = X2np.shape[1]
    if d_amb <= 3:
        Xproj = X2np
    else:
        Xc = X2np - X2np.mean(0)
        sub = Xc[:: max(1, len(Xc) // 20000)]
        _, _, Vt = np.linalg.svd(sub, full_matrices=False)
        Xproj = Xc @ Vt[:2].T
    sdev = semb = None
    # quantile (equal-mass) binning: PCA projections of high-d data and
    # real datasets are far from uniform density; uniform pitch overflows
    # its capacity guard ~8x there (.r5 d=10 probe)
    # occupancy >= 1.5*lfil so a row's lfil nearest (preceding) neighbors
    # fit one cell hop — occ=0.75*lfil left 21k out-of-stencil edges at 3e4
    grid = cg.build_cell_grid(Xproj, target_occupancy=max(8.0, 1.5 * lfil),
                              binning="quantile")
    if grid is not None:
        order = grid.perm.astype(np.int64)
        perm = np.concatenate([perm[:k], np.asarray(perm[k:])[order]])
        Xproj = Xproj[order]
        grid = grid._replace(
            perm=np.arange(grid.n, dtype=np.int32),
            inv_perm=np.arange(grid.n, dtype=np.int32),
        )
    # pattern space: full-d coordinates when d <= 3, the projection above it
    Xpat = np.asarray(X)[perm[k:]] if d_amb <= 3 else Xproj
    # host KDTree: milliseconds where the jitted blocked-GEMM KNN costs
    # minutes on CPU (170 s at 3e4) or a device round-trip (ops/knn.py)
    from ..ops.knn import knn_pattern_host

    pattern = knn_pattern_host(Xpat, lfil)
    if grid is not None:
        # exception budget: the COO side term costs ~nothing per apply
        # (element ops on a few thousand entries); early cell-rows of the
        # preceding-KNN pattern legitimately produce O(n/row) of them
        # budget ~3% of pattern entries: the COO term costs element ops on
        # ne entries (~0.1 ms at 1e4) — far below one ELL gather; a pattern
        # that is GROSSLY nonlocal (>>3%) falls back instead
        semb_ = cg.ell_stencil_embed_plan(
            grid, pattern[0], pattern[1], sorted_idx=True,
            max_exceptions=max(4096, Xpat.shape[0] * lfil // 32),
        )
        if semb_ is not None:
            sdev, semb = cg.to_device(grid), semb_
    return AfnPlan(perm=perm, k=k, use_ran=use_ran, pattern=pattern,
                   sdev=sdev, semb=semb)


def afn_setup_from_plan(
    kind: str,
    params: KernelParams,
    X,
    plan: AfnPlan,
    *,
    require_grad: bool = False,
    windows=None,
):
    """Numeric factorization for a fixed plan — jittable, re-run per params."""
    with jax.default_matmul_precision("highest"):
        return _afn_setup_impl(kind, params, X, plan, require_grad, windows)


def _afn_setup_impl(kind, params, X, plan, require_grad, windows):
    if plan.use_ran:
        return nystrom_setup(
            kind, params, X, jnp.asarray(plan.perm), plan.k,
            require_grad=require_grad, windows=windows,
        )

    k = plan.k
    perm = jnp.asarray(plan.perm)
    Xp = X[perm]
    X1, X2 = Xp[:k], Xp[k:]

    if windows is None:
        mat = lambda p, A, B=None: kernel_matrix(kind, p, A, B)
        mat_g = lambda p, A, B=None: kernel_matrix_with_grad(kind, p, A, B)
    else:
        mat = lambda p, A, B=None: additive_kernel_matrix(kind, p, A, windows, B)
        mat_g = lambda p, A, B=None: additive_kernel_matrix_with_grad(kind, p, A, windows, B)

    # the (k, n2) cross block builds in COLUMN chunks at scale: the additive
    # kernel's per-window distance intermediates are each (k, n2) — at
    # n2=1e6, 5 windows of unchunked build transients OOM the 16 GB chip
    col_chunk = 131072

    def _chunked_cols(build_fn, X2v, with_grad):
        n2v = X2v.shape[0]
        if n2v <= col_chunk:
            return build_fn(X2v)
        nc = -(-n2v // col_chunk)
        X2p = jnp.zeros((nc * col_chunk, X2v.shape[1]), X2v.dtype).at[:n2v].set(X2v)
        parts = jax.lax.map(build_fn, X2p.reshape(nc, col_chunk, X2v.shape[1]))
        if with_grad:
            Kp, dKp = parts
            K = jnp.moveaxis(Kp, 0, 1).reshape(k, nc * col_chunk)[:, :n2v]
            dK = jnp.moveaxis(dKp, 0, 2).reshape(3, k, nc * col_chunk)[:, :, :n2v]
            return K, dK
        return jnp.moveaxis(parts, 0, 1).reshape(k, nc * col_chunk)[:, :n2v]

    if require_grad:
        K11, dK11 = mat_g(params, X1)
        K12, dK12 = _chunked_cols(lambda Xc: mat_g(params, X1, Xc), X2, True)
    else:
        K11 = mat(params, X1)
        K12 = _chunked_cols(lambda Xc: mat(params, X1, Xc), X2, False)
        dK11 = dK12 = None

    L11, _ = stable_chol(K11)
    GK12 = tril_solve(L11, K12)  # triangular solves are full precision

    if require_grad:
        # dL11 = L phi(L^{-1} dK11 L^{-T})
        GdKG = jax.vmap(
            lambda dk: tril_solve(L11, tril_solve(L11, dk).T).T
        )(dK11)
        dL11 = jax.vmap(lambda A: L11 @ _phi(A))(GdKG)
        GdK12 = jax.vmap(lambda dk: tril_solve(L11, dk))(dK12)
        GdK11GK12 = jnp.einsum("jkl,lm->jkm", GdKG, GK12)
    else:
        dL11 = GdK12 = GdK11GK12 = None

    idx = jnp.asarray(plan.pattern[0])
    mask = jnp.asarray(plan.pattern[1])

    def block_fn(J):
        XJ = X2[J]
        gk = GK12[:, J]                       # (k, lfil)
        if require_grad:
            B22, dB22 = mat_g(params, XJ)
            B = B22 - gk.T @ gk

            def grad_one(dB22j, gdk, gdkg):
                gdkJ = gdk[:, J]
                cross = gk.T @ gdkJ
                return dB22j - cross - cross.T + gk.T @ gdkg[:, J]

            dB = jax.vmap(grad_one)(dB22, GdK12, GdK11GK12)
            return B, dB
        B22 = mat(params, XJ)
        return B22 - gk.T @ gk, None

    # chunk the whole FSAI row pipeline (block evaluation + row cholesky
    # solves): a flat vmap materializes the (n2, k, lfil) GK12 gather AND
    # the (n2, lfil, lfil) block/factor arrays — several GB of concurrent
    # transients that OOM the 16 GB chip at n=1e6.  lax.map over row chunks
    # keeps peak memory at the chunk size while every chunk is still a full
    # batched GEMM/cholesky; only the (n2, lfil) rows ever materialize.
    n2 = idx.shape[0]
    lfil = idx.shape[1]
    chunk = 32768

    def rows_chunk(args):
        idx_c, mask_c = args
        if require_grad:
            B, dB = jax.vmap(block_fn)(idx_c)
        else:
            B = jax.vmap(lambda J: block_fn(J)[0])(idx_c)
            dB = None
        return fsai_rows_from_blocks(B, dB, mask_c)

    if n2 <= chunk:
        val, dval, breakdown = rows_chunk((idx, mask))
    else:
        nc = -(-n2 // chunk)
        idx_p = jnp.zeros((nc * chunk, lfil), idx.dtype).at[:n2].set(idx)
        mask_p = jnp.zeros((nc * chunk, lfil), bool).at[:n2].set(mask)
        val, dval, bad = jax.lax.map(
            rows_chunk,
            (idx_p.reshape(nc, chunk, lfil), mask_p.reshape(nc, chunk, lfil)),
        )
        val = val.reshape(nc * chunk, lfil)[:n2]
        if require_grad:
            dval = jnp.moveaxis(dval, 0, 1).reshape(3, nc * chunk, lfil)[:, :n2]
        else:
            dval = None
        breakdown = jnp.any(bad)
    tkw = {}
    if getattr(plan, "pattern_t", None) is not None:
        tr, ts, tm = plan.pattern_t
        tkw = dict(t_rows=jnp.asarray(tr), t_slot=jnp.asarray(ts),
                   t_mask=jnp.asarray(tm))
    if getattr(plan, "sdev", None) is not None:
        # embed G into the cell-stencil layout: gather-free G/G' applies
        # (ops/cellgrid.py); out-of-stencil pattern edges ride the tiny
        # directed COO exception term.  At large n the stencil pair is the
        # dominant factorization footprint (~5.4 GB f32 at n=1e6 rank 600,
        # which OOM'd the 16 GB chip) — store it bf16 there: the G apply is
        # a preconditioner apply, where ~1e-2 relative value error costs a
        # few Krylov iterations, not correctness (exceptions/diag stay f32)
        from ..ops import cellgrid as cg

        sdt = (jnp.bfloat16
               if (val.dtype == jnp.float32 and idx.shape[0] > 400_000)
               else None)
        emb = plan.semb
        sA = cg.stencil_embed(plan.sdev, emb, val, out_dtype=sdt)
        sAT = cg.stencil_transpose(plan.sdev, sA)
        flat = emb.exc_rows * emb.lfil + emb.exc_slot
        exc_v = jnp.where(emb.exc_valid, val.reshape(-1)[flat], 0.0)
        tkw.update(sdev=plan.sdev, sA=sA, sAT=sAT,
                   exc_rows=emb.exc_rows, exc_cols=emb.exc_cols, exc_v=exc_v)
    gs = FsaiPrecond(idx=idx, mask=mask, val=val, dval=dval,
                     breakdown=breakdown, **tkw)

    # GK12 is a setup-only intermediate (Schur blocks); the apply needs
    # only K12 + L11.  Keeping the (k, n2) copy costs 2.4 GB at n=1e6
    # rank 600 — drop it at scale (small-n/debug paths keep it: tests
    # reconstruct the dense U factor from it)
    keep_gk = require_grad or idx.shape[0] <= 400_000
    return AfnPrecond(
        perm=perm, L11=L11, K12=K12, GK12=GK12 if keep_gk else None,
        gs=gs, dL11=dL11, dK12=dK12,
        inv_perm=jnp.argsort(perm).astype(jnp.int32),
    )


def afn_setup(
    kind: str,
    params: KernelParams,
    X,
    *,
    maxrank: int = 200,
    lfil: int = 20,
    key=None,
    rank: Optional[int] = None,
    require_grad: bool = False,
    windows=None,
    force_afn: bool = False,
):
    """One-call AFN setup: plan (host) + factorization (device).

    If the Schur FSAI factorization breaks down (non-SPD blocks) the
    preconditioner falls back WHOLESALE to plain Nyström on the same FPS
    landmarks — ref afn_setup.m:93-98.  (Inside jitted refactorizations the
    per-row diagonal repair of fsai_rows_from_blocks applies instead, which
    keeps the operator SPD and NaN-free without a structure switch.)
    """
    plan = afn_plan(
        kind, params, X, maxrank=maxrank, lfil=lfil, key=key, rank=rank,
        force_afn=force_afn,
    )
    precond = afn_setup_from_plan(
        kind, params, X, plan, require_grad=require_grad, windows=windows
    )
    if not plan.use_ran and bool(np.asarray(precond.breakdown)):
        plan = plan._replace(use_ran=True)
        precond = afn_setup_from_plan(
            kind, params, X, plan, require_grad=require_grad, windows=windows
        )
    return precond, plan
