"""Dense/structured matrix helpers.

TPU equivalents of SRC/linearalg/matops.c: LAPACK calls become
jax.scipy.linalg (cholesky / solve_triangular / svd), CSR sparse triangular
factors become padded-ELL (n x lfil dense index/value arrays) so every row
has static shape and the apply is gather + batched dot (SURVEY.md §2.16).
"""

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def stable_chol(K, extra_shift: float = 0.0):
    """Cholesky with the reference's stabilization shift + escalation.

    nu = sqrt(n) * ulp(||K||_F) added to the diagonal before factorization
    (ref: chol.c:448-464; MATLAB ran_setup.m:22-83 uses eps(norm)).  Smooth
    kernel blocks have eigenvalues decaying below single-precision eps, so if
    the factorization produces NaNs the shift escalates (x1e2, x1e4, x1e6)
    and the first finite factor wins — the stabilized-Nyström math absorbs
    the shift (ran_setup.m's  S <- max(sigma^2 - nu, 0)).
    Returns (L, nu).

    NOTE: the escalation runs in a lax.while_loop, which is not
    reverse-mode differentiable — in-repo gradients are analytic (the GP
    loss estimator), so nothing differentiates through setup; external
    callers wanting jax.grad through a Cholesky-based setup should
    differentiate the factor's consumer, not this function (advisor r4).
    """
    n = K.shape[0]
    fro = jnp.linalg.norm(K)
    base = jnp.sqrt(jnp.asarray(float(n), K.dtype)) * jnp.spacing(fro) + extra_shift
    eye = jnp.eye(n, dtype=K.dtype)

    # escalate only while the factor is non-finite: the common case pays ONE
    # factorization (a while_loop, not four unconditional cholesky calls)
    def cond(carry):
        L, nu, tries = carry
        return jnp.logical_and(jnp.isnan(L).any(), tries < 4)

    def body(carry):
        L, nu, tries = carry
        shift = base * 10.0 ** (2.0 * tries)
        return jnp.linalg.cholesky(K + shift * eye), shift, tries + 1

    L0 = jnp.linalg.cholesky(K + base * eye)
    L, nu, _ = jax.lax.while_loop(cond, body, (L0, base, jnp.asarray(1.0, K.dtype)))
    return L, nu


def chol_solve(L, b):
    """Solve (L L^T) x = b via two triangular solves (ref: chol.c:111-137).

    b may be (n,) or (n, m).
    """
    y = solve_triangular(L, b, lower=True)
    return solve_triangular(L.T, y, lower=False)


def tril_solve(L, b):
    return solve_triangular(L, b, lower=True)


def triu_solve(L, b):
    """Solve L^T x = b for lower-triangular L."""
    return solve_triangular(L.T, b, lower=False)


# --- padded-ELL sparse lower-triangular format -----------------------------
# Rows of a lower-triangular sparse matrix G stored as
#   idx: (n, lfil) int32 column indices, padded entries point at the row's
#        own diagonal position but carry value 0
#   val: (n, lfil) values
# The diagonal entry of row i is always the LAST valid slot (matching the
# reference's CSR convention where A_j[row end - 1] == i, fsai.c:385-397).


def _gather_vec(x, idx):
    """x[idx] for a 1-D x and arbitrary-shape idx, TPU-tuned.

    On the TPU backend a 1-D element gather executes on the scalar path at
    ~7 cycles/element (measured 11.9 ms for (1e5, 16) — 1000x off the copy
    bound); gathering ROWS of a broadcast (n, 8) view takes the sublane
    DynamicGather path at ~3 cycles/row (measured 4.8 ms, 2.5x faster)
    despite reading 8x the bytes.  CPU keeps the plain element gather.
    """
    if jax.default_backend() == "tpu":
        n = x.shape[0]
        x2 = jnp.broadcast_to(x[:, None], (n, 8))
        return x2[idx.reshape(-1)][:, 0].reshape(idx.shape)
    return x[idx]


def ell_matvec(idx, val, x):
    """y = G x for padded-ELL G: gather + row-wise dot."""
    return jnp.sum(val * _gather_vec(x, idx), axis=1)


def ell_matvec_batch(idx, val, Xb):
    """y[r] = G x_r for a BATCH of right-hand sides Xb (nv, n).

    ONE row-gather of the (n, nv) transposed batch serves every RHS — the
    gather cost is per-row (not per element), so nv RHS cost ~the same as
    one (the multi-RHS analog of the packed-NDFT table sharing).
    """
    X2 = Xb.T                                   # (n, nv)
    G = X2[idx.reshape(-1)].reshape(*idx.shape, Xb.shape[0])
    return jnp.einsum("is,isv->vi", val, G)


def ell_rmatvec(idx, val, x, n=None):
    """y = G^T x for padded-ELL G: scatter-add."""
    n = n if n is not None else x.shape[0]
    contrib = val * x[:, None]
    return jnp.zeros((n,), x.dtype).at[idx.reshape(-1)].add(contrib.reshape(-1))


def ell_rmatvec_batch(idx, val, Xb, n=None):
    """y[r] = G' x_r for a batch Xb (nv, n): ONE row-wise scatter-add of the
    (n*lfil, nv) contribution block serves every RHS (the scatter cost is
    per-row, like the gather in ell_matvec_batch)."""
    nv = Xb.shape[0]
    n = n if n is not None else Xb.shape[1]
    contrib = val[:, :, None] * Xb.T[:, None, :]          # (rows, lfil, nv)
    out = jnp.zeros((n, nv), Xb.dtype).at[idx.reshape(-1)].add(
        contrib.reshape(-1, nv)
    )
    return out.T


def ell_diag(idx, val, diag_slot):
    """Diagonal of G when the diagonal sits at a known slot per row."""
    return val[jnp.arange(val.shape[0]), diag_slot]


def _ell_block_dense(idx, val, lo, B, n):
    """Densify the (B, B) diagonal block [lo:lo+B, lo:lo+B] of ELL G."""
    rows = lo + jnp.arange(B)
    bidx = idx[rows]                       # (B, lfil) global cols
    bval = val[rows]
    local = bidx - lo
    inblk = (local >= 0) & (local < B) & (rows[:, None] < n)
    local = jnp.clip(local, 0, B - 1)
    r = jnp.broadcast_to(jnp.arange(B)[:, None], bidx.shape)
    dense = jnp.zeros((B, B), val.dtype).at[r.reshape(-1), local.reshape(-1)].add(
        jnp.where(inblk, bval, 0.0).reshape(-1)
    )
    # pad out-of-range rows with identity so the block solve is well-posed
    pad = rows >= n
    dense = dense + jnp.diag(pad.astype(val.dtype))
    return dense, rows


def ell_tril_solve(idx, val, b, *, block: int = 256):
    """Solve G y = b for lower-triangular padded-ELL G.

    Blocked forward substitution: n/block sequential steps, each a dense
    (block x block) triangular solve (XLA TriangularSolve) plus an ELL
    gather-dot for the already-solved prefix.  This replaces the reference's
    inherently sequential CSR substitution (fsai.c:675-729) with a
    TPU-viable O(n/block)-depth schedule.
    """
    n = b.shape[0]
    nb = -(-n // block)
    npad = nb * block
    y = jnp.zeros((npad,), b.dtype)
    bpad = jnp.zeros((npad,), b.dtype).at[:n].set(b)

    def body(k, y):
        lo = k * block
        dense, rows = _ell_block_dense(idx, val, lo, block, n)
        # contribution of already-solved entries (cols < lo)
        bidx = idx[rows]
        bval = val[rows]
        prev = jnp.where(bidx < lo, bval, 0.0)
        ypad_g = y[jnp.clip(bidx, 0, npad - 1)]
        rhs = bpad[lo + jnp.arange(block)] - jnp.sum(prev * ypad_g, axis=1)
        sol = jax.scipy.linalg.solve_triangular(dense, rhs, lower=True)
        return jax.lax.dynamic_update_slice(y, sol, (lo,))

    y = jax.lax.fori_loop(0, nb, body, y)
    return y[:n]


def ell_triu_solve(idx, val, b, *, block: int = 256):
    """Solve G^T y = b for lower-triangular padded-ELL G (backward)."""
    n = b.shape[0]
    nb = -(-n // block)
    npad = nb * block
    y = jnp.zeros((npad,), b.dtype)
    # residual r tracks b minus contributions of already-solved tail rows
    rpad = jnp.zeros((npad,), b.dtype).at[:n].set(b)

    def body(kk, carry):
        y, r = carry
        k = nb - 1 - kk
        lo = k * block
        dense, rows = _ell_block_dense(idx, val, lo, block, n)
        rhs = jax.lax.dynamic_slice(r, (lo,), (block,))
        sol = jax.scipy.linalg.solve_triangular(dense.T, rhs, lower=False)
        y = jax.lax.dynamic_update_slice(y, sol, (lo,))
        # subtract G[block_rows, cols < lo]^T sol from r (scatter)
        bidx = idx[rows]
        bval = jnp.where(bidx < lo, val[rows], 0.0)
        contrib = bval * sol[:, None]
        r = r.at[jnp.clip(bidx, 0, npad - 1).reshape(-1)].add(-contrib.reshape(-1))
        return (y, r)

    y, _ = jax.lax.fori_loop(0, nb, body, (y, rpad))
    return y[:n]


def ell_transpose_pattern(idx, mask, lfil_t=None):
    """HOST-side transpose pattern of a padded-ELL lower-triangular matrix.

    Returns numpy (t_rows, t_slot, t_mask) of shape (n, lfil_t) such that
    row c of G' collects the entries val[t_rows[c, s], t_slot[c, s]] — i.e.
    the transpose product becomes a GATHER-only contraction
    (ell_rmatvec_t below).  The scatter-add form (ell_rmatvec) lowers to a
    serialized scatter on the tunneled TPU backend (~15 ms at (1e5, 16),
    the dominant cost of the AFN/FSAI apply — .r4 profiling); the pattern
    is params-independent, so training loops build it once per dataset.

    lfil_t defaults to the exact maximum column in-degree.
    """
    import numpy as np

    idx = np.asarray(idx)
    mask = np.asarray(mask)
    n, lfil = idx.shape
    rows, slots = np.nonzero(mask)
    cols = idx[rows, slots]
    order = np.argsort(cols, kind="stable")
    cols_s, rows_s, slots_s = cols[order], rows[order], slots[order]
    starts = np.searchsorted(cols_s, np.arange(n))
    ends = np.searchsorted(cols_s, np.arange(n) + 1)
    counts = ends - starts
    need = int(counts.max()) if counts.size else 1
    lfil_t = need if lfil_t is None else max(int(lfil_t), need)
    t_rows = np.zeros((n, lfil_t), np.int32)
    t_slot = np.zeros((n, lfil_t), np.int32)
    t_mask = np.zeros((n, lfil_t), bool)
    rank = np.arange(cols_s.size) - starts[cols_s]
    t_rows[cols_s, rank] = rows_s
    t_slot[cols_s, rank] = slots_s
    t_mask[cols_s, rank] = True
    return t_rows, t_slot, t_mask


def ell_rmatvec_t(t_rows, t_slot, t_mask, val, x):
    """y = G' x via the precomputed transpose pattern — gathers only.

    val: the (n, lfil) ELL values of G (any value array on G's pattern, e.g.
    dG rows); x: (n,).  Equivalent to ell_rmatvec(idx, val, x) but with no
    scatter in the apply (see ell_transpose_pattern).  The value gather uses
    FLAT indices (one index array, same lowering as the ell_matvec row
    gather) — two-array advanced indexing lowers to a 2-D-start-indices
    Gather that faulted the tunneled TPU backend.
    """
    lfil = val.shape[1]
    flat = (t_rows * lfil + t_slot).reshape(-1)
    contrib = val.reshape(-1)[flat].reshape(t_rows.shape) * x[t_rows]
    return jnp.sum(jnp.where(t_mask, contrib, 0.0), axis=1)
