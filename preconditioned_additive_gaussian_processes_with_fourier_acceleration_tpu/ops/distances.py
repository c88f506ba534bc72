"""Pairwise distances on the MXU.

The reference computes Euclidean distances with the XX + YY - 2XY GEMM trick
(ref: SRC/linearalg/kernels.c:17-120 — Nfft4GPDistanceEuclidXY / SumXX /
MatrixAssemble).  Here the same trick runs as one dot_general so XLA tiles it
onto the systolic array; the clamp guards tiny negative values from rounding.
"""

import jax.numpy as jnp


def sq_distance(X, Y=None):
    """Pairwise squared Euclidean distances.

    X: (n, d); Y: (m, d) or None (Y = X). Returns (n, m).

    The cross GEMM runs at highest matmul precision: the TPU default
    (bfloat16 passes) makes d2 indefinite enough to break the Cholesky of
    kernel blocks built from it.
    """
    if Y is None:
        Y = X
    xx = jnp.sum(X * X, axis=1)[:, None]
    yy = jnp.sum(Y * Y, axis=1)[None, :]
    cross = jnp.matmul(X, Y.T, precision="highest")
    d2 = xx + yy - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def distance(X, Y=None):
    """Pairwise Euclidean distances (n, m)."""
    return jnp.sqrt(sq_distance(X, Y))
