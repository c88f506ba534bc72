"""KNN sparsity pattern for FSAI.

TPU-native rebuild of Nfft4GPDistanceEuclidKnn (ref: SRC/linearalg/kernels.c:
121-403): for each point i, the lfil-1 nearest *preceding* points (j < i) —
a lower-triangular CSR pattern — with i itself as the last entry of the row.

Instead of per-row quickselect on the host, rows are processed in fixed-size
blocks: a (block, n) distance tile (one GEMM) is masked to j < i and reduced
with lax.top_k — O(n^2/block) tiles, each MXU + VPU friendly.

Output is padded-ELL: idx (n, lfil) int32 (padded entries = i, the row's own
index), mask (n, lfil) bool.  Slot lfil-1 always holds the diagonal i.
"""

import jax
import jax.numpy as jnp
from jax import lax

from .distances import sq_distance


def knn_pattern(X, lfil: int, *, block: int = 1024):
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
    row_ids = jnp.arange(npad)

    xx = jnp.sum(X * X, axis=1)

    def one_block(b):
        rows = b * block + jnp.arange(block)
        Xb = Xpad[rows]
        d2 = (
            jnp.sum(Xb * Xb, axis=1)[:, None]
            + xx[None, :]
            - 2.0 * (Xb @ X.T)
        )  # (block, n)
        col = jnp.arange(n)[None, :]
        valid = col < jnp.minimum(rows[:, None], n)
        d2 = jnp.where(valid, d2, jnp.inf)
        if k > 0:
            neg, idx = lax.top_k(-d2, k)
            kmask = jnp.isfinite(-neg)
        else:
            idx = jnp.zeros((block, 0), jnp.int32)
            kmask = jnp.zeros((block, 0), bool)
        # sort selected indices ascending (reference rows are index-sorted)
        sort_key = jnp.where(kmask, idx, n + 1)
        order = jnp.argsort(sort_key, axis=1)
        idx = jnp.take_along_axis(idx, order, axis=1)
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
