"""KNN sparsity pattern for FSAI.

TPU-native rebuild of Nfft4GPDistanceEuclidKnn (ref: SRC/linearalg/kernels.c:
121-403): for each point i, the lfil-1 nearest *preceding* points (j < i) —
a lower-triangular CSR pattern — with i itself as the last entry of the row.

Instead of per-row quickselect on the host, rows AND columns are processed in
fixed-size blocks: each (row_block, col_block) distance tile is one GEMM,
masked to j < i and reduced with lax.top_k; a running top-k merge across
column blocks keeps peak memory at O(row_block * col_block) — at n = 1e6 the
row-blocked-only variant needed 4 GB/tile, the 2-D blocking ~128 MB.

Output is padded-ELL: idx (n, lfil) int32 (padded entries = i, the row's own
index), mask (n, lfil) bool.  Slot lfil-1 always holds the diagonal i.
"""

import jax
import jax.numpy as jnp
from jax import lax


def knn_pattern(X, lfil: int, *, block: int = 1024, col_block: int = 32768):
    """Lower-triangular KNN pattern.

    Returns (idx, mask): (n, lfil) arrays; row i holds up to lfil-1 nearest
    j < i in slots 0..lfil-2 (sorted by index ascending like the reference's
    CSR rows) and i in slot lfil-1.
    """
    n, d = X.shape
    k = lfil - 1
    nb = -(-n // block)
    npad = nb * block
    Xpad = jnp.zeros((npad, d), X.dtype).at[:n].set(X)

    cb = min(col_block, n)
    ncb = -(-n // cb)
    ncpad = ncb * cb
    Xcpad = jnp.zeros((ncpad, d), X.dtype).at[:n].set(X)
    cxx = jnp.sum(Xcpad * Xcpad, axis=1)

    def one_block(b):
        rows = b * block + jnp.arange(block)
        Xb = Xpad[rows]
        bxx = jnp.sum(Xb * Xb, axis=1)[:, None]

        if k == 0:
            return (
                jnp.zeros((block, 0), jnp.int32),
                jnp.zeros((block, 0), bool),
            )

        def col_step(c, carry):
            best_d, best_i = carry
            cols = c * cb + jnp.arange(cb)
            Xc = Xcpad[cols]
            d2 = bxx + cxx[cols][None, :] - 2.0 * jnp.matmul(
                Xb, Xc.T, precision="highest"
            )  # (block, cb); highest: bf16-default distances misrank
            # neighbors on TPU (measured 44k nonlocal pattern edges at n=2e4)
            valid = cols[None, :] < jnp.minimum(rows[:, None], n)
            d2 = jnp.where(valid, d2, jnp.inf)
            # merge this tile's top-k with the running top-k
            cat_d = jnp.concatenate([best_d, d2], axis=1)
            cat_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(cols[None, :].astype(jnp.int32), d2.shape)],
                axis=1,
            )
            neg, sel = lax.top_k(-cat_d, k)
            return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

        init = (
            jnp.full((block, k), jnp.inf, X.dtype),
            jnp.zeros((block, k), jnp.int32),
        )
        best_d, best_i = lax.fori_loop(0, ncb, col_step, init)
        kmask = jnp.isfinite(best_d)
        # sort selected indices ascending (reference rows are index-sorted)
        sort_key = jnp.where(kmask, best_i, n + 1)
        order = jnp.argsort(sort_key, axis=1)
        idx = jnp.take_along_axis(best_i, order, axis=1)
        kmask = jnp.take_along_axis(kmask, order, axis=1)
        return idx, kmask

    idxs, masks = lax.map(one_block, jnp.arange(nb))
    idx = idxs.reshape(npad, -1)[:n]
    mask = masks.reshape(npad, -1)[:n]

    self_col = jnp.arange(n)[:, None]
    idx = jnp.where(mask, idx, self_col)
    idx = jnp.concatenate([idx, self_col], axis=1)
    mask = jnp.concatenate([mask, jnp.ones((n, 1), bool)], axis=1)
    return idx.astype(jnp.int32), mask


def knn_pattern_hostloop(X, lfil: int, *, row_chunk: int = 8192,
                         col_block: int = 32768):
    """knn_pattern as a HOST loop of per-chunk jitted calls.

    The single-jit form's 1000-step lax.map crashed the tunneled TPU worker
    at n=1e6 (r4); dispatching row chunks as separate (shape-stable, cached)
    jit calls bounds each device program and shows progress.  Returns the
    same (idx, mask) numpy arrays.
    """
    import numpy as np
    from functools import partial

    n, d = X.shape
    k = lfil - 1
    cb = min(col_block, n)
    ncb = -(-n // cb)
    ncpad = ncb * cb
    Xcpad = jnp.zeros((ncpad, d), X.dtype).at[:n].set(X)
    cxx = jnp.sum(Xcpad * Xcpad, axis=1)

    @partial(jax.jit, static_argnames=())
    def one_chunk(Xcpad, cxx, Xb, rows):
        # Xcpad/cxx are ARGUMENTS (closure capture inlines them as MLIR
        # constants — 40 MB at n=1e6 — and trips the tunnel request cap)
        bxx = jnp.sum(Xb * Xb, axis=1)[:, None]

        def col_step(c, carry):
            best_d, best_i = carry
            cols = c * cb + jnp.arange(cb)
            Xc = Xcpad[cols]
            d2 = bxx + cxx[cols][None, :] - 2.0 * jnp.matmul(
                Xb, Xc.T, precision="highest")
            valid = cols[None, :] < jnp.minimum(rows[:, None], n)
            d2 = jnp.where(valid, d2, jnp.inf)
            cat_d = jnp.concatenate([best_d, d2], axis=1)
            cat_i = jnp.concatenate(
                [best_i,
                 jnp.broadcast_to(cols[None, :].astype(jnp.int32), d2.shape)],
                axis=1,
            )
            neg, sel = lax.top_k(-cat_d, k)
            return -neg, jnp.take_along_axis(cat_i, sel, axis=1)

        init = (
            jnp.full((Xb.shape[0], k), jnp.inf, X.dtype),
            jnp.zeros((Xb.shape[0], k), jnp.int32),
        )
        best_d, best_i = lax.fori_loop(0, ncb, col_step, init)
        kmask = jnp.isfinite(best_d)
        sort_key = jnp.where(kmask, best_i, n + 1)
        order = jnp.argsort(sort_key, axis=1)
        return (
            jnp.take_along_axis(best_i, order, axis=1),
            jnp.take_along_axis(kmask, order, axis=1),
        )

    nrc = -(-n // row_chunk)
    npad = nrc * row_chunk
    Xpad = jnp.zeros((npad, d), X.dtype).at[:n].set(X)
    idx_parts, mask_parts = [], []
    for c in range(nrc):
        rows = jnp.arange(c * row_chunk, (c + 1) * row_chunk)
        i_c, m_c = one_chunk(Xcpad, cxx,
                             Xpad[c * row_chunk : (c + 1) * row_chunk], rows)
        idx_parts.append(np.asarray(i_c))
        mask_parts.append(np.asarray(m_c))
    idx = np.concatenate(idx_parts)[:n]
    mask = np.concatenate(mask_parts)[:n]

    self_col = np.arange(n, dtype=np.int64)[:, None]
    idx = np.where(mask, idx, self_col)
    idx = np.concatenate([idx, self_col], axis=1)
    mask = np.concatenate([mask, np.ones((n, 1), bool)], axis=1)
    return idx.astype(np.int32), mask


def knn_pattern_host(X, lfil: int):
    """HOST k-d tree variant of knn_pattern (scipy.spatial.cKDTree).

    Plan-time pattern construction does not need the device: a KDTree query
    costs milliseconds at n=3e4 where the jitted blocked-GEMM path costs
    minutes on CPU backends (measured 170 s, .r5 plan profile) and a
    compile + dispatch round-trip on the tunneled TPU.  Same output
    contract as knn_pattern: lfil-1 nearest PRECEDING points per row
    (index-ascending) + self in the last slot.  Preceding neighbors are
    taken from a widening overall-KNN query (k doubles until every row has
    enough preceding candidates or the whole prefix is used).
    """
    import numpy as np
    from scipy.spatial import cKDTree

    X = np.asarray(X)
    n, d = X.shape
    k = lfil - 1
    idx = np.full((n, k), 0, np.int64)
    mask = np.zeros((n, k), bool)
    if k > 0 and n > 1:
        tree = cKDTree(X)
        todo = np.arange(1, n)
        kq = min(max(4 * lfil, 64), n)
        while todo.size:
            _, nb = tree.query(X[todo], k=kq)
            nb = np.atleast_2d(nb)
            prec = nb < todo[:, None]
            cnt = prec.sum(axis=1)
            enough = (cnt >= np.minimum(k, todo)) | (kq >= n)
            rows = todo[enough]
            nb_e = nb[enough]
            prec_e = prec[enough]
            # first k preceding per row, in query (distance) order
            order = np.argsort(~prec_e, axis=1, kind="stable")
            nb_sel = np.take_along_axis(nb_e, order[:, :k], axis=1)
            ok = np.take_along_axis(prec_e, order[:, :k], axis=1)
            nb_sel = np.where(ok, nb_sel, n + 1)
            # reference rows are index-sorted
            nb_sel.sort(axis=1)
            got = nb_sel <= n
            idx[rows] = np.where(got, nb_sel, 0)
            mask[rows] = got
            todo = todo[~enough]
            kq = min(kq * 2, n)
    self_col = np.arange(n, dtype=np.int64)[:, None]
    idx = np.where(mask, idx, self_col)
    idx = np.concatenate([idx, self_col], axis=1)
    mask = np.concatenate([mask, np.ones((n, 1), bool)], axis=1)
    return idx.astype(np.int32), mask
