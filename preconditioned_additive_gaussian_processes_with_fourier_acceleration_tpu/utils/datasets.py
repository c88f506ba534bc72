"""Synthetic dataset generators and permutation helpers.

TPU-native equivalents of the reference's host-side helpers
(ref: SRC/utils/utils.h:82-167 — Nfft4GPRandPerm, Nfft4GPExpandPerm,
dataset generators for regular 2-D grids and uniform random points).
Randomness uses jax.random keys; parity with C rand() streams is by
tolerance, not bitwise (see SURVEY.md §7).
"""

import jax
import jax.numpy as jnp


def generate_uniform(key, n: int, d: int, low: float = 0.0, high: float = 1.0, dtype=None):
    """n uniform random points in [low, high]^d, shape (n, d).

    Ref: Nfft4GPDatasetUniformRandom (SRC/utils/utils.c).
    """
    dtype = dtype or jnp.result_type(float)
    return jax.random.uniform(key, (n, d), minval=low, maxval=high, dtype=dtype)


def generate_grid2d(nx: int, ny: int, dtype=None):
    """Regular 2-D grid of nx*ny points in [0,1]^2, shape (nx*ny, 2).

    Ref: Nfft4GPDatasetRegular2D (SRC/utils/utils.c).
    """
    dtype = dtype or jnp.result_type(float)
    xs = jnp.linspace(0.0, 1.0, nx, dtype=dtype)
    ys = jnp.linspace(0.0, 1.0, ny, dtype=dtype)
    xx, yy = jnp.meshgrid(xs, ys, indexing="ij")
    return jnp.stack([xx.ravel(), yy.ravel()], axis=1)


def rand_perm(key, n: int, k: int | None = None):
    """Random permutation of n, optionally truncated to the first k entries.

    Ref: Nfft4GPRandPerm (SRC/utils/utils.h:82).
    """
    perm = jax.random.permutation(key, n)
    if k is not None:
        perm = perm[:k]
    return perm


def expand_perm(perm_prefix, n: int):
    """Complete a k-prefix permutation to a full n-permutation.

    The remaining indices are appended in ascending order.
    Ref: Nfft4GPExpandPerm (SRC/utils/utils.h:141-149).
    """
    perm_prefix = jnp.asarray(perm_prefix)
    mask = jnp.ones((n,), dtype=bool).at[perm_prefix].set(False)
    rest = jnp.nonzero(mask, size=n - perm_prefix.shape[0])[0]
    return jnp.concatenate([perm_prefix, rest])
