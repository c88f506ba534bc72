"""Farthest point sampling (FPS) ordering.

TPU-native rebuild of the reference's *parallel* FPS variant
(ref: SRC/linearalg/ordering.c:422-712 — Nfft4GPSortFpsPar1): keep a running
min-distance-to-landmarks vector, each round pick its argmax and relax all
distances — O(nk) distance relaxations, each a fused VPU pass, with the
argmax a full reduction (a psum-like collective when sharded).

The sequential heap variant (ordering.c:36-421) is host-irregular and not
needed: both produce valid FPS orderings (SURVEY.md §7 "hard parts").

Starting point: the point nearest the data mean (ordering.c:110-143).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class FpsResult(NamedTuple):
    perm: jnp.ndarray    # (k,) selected indices in selection order
    dists: jnp.ndarray   # (k,) cover radius at each selection (dists[0]=inf)


def fps(X, k: int) -> FpsResult:
    """Select k farthest-point-sampled landmarks from X (n, d)."""
    n = X.shape[0]
    mean = jnp.mean(X, axis=0)
    d2mean = jnp.sum((X - mean[None, :]) ** 2, axis=1)
    start = jnp.argmin(d2mean)

    xx = jnp.sum(X * X, axis=1)

    def dist2_to(i):
        # highest: bf16-default products misrank distances on TPU (see
        # ops/distances.sq_distance)
        cross = jnp.matmul(X, X[i], precision="highest")
        return jnp.maximum(xx + xx[i] - 2.0 * cross, 0.0)

    dist0 = dist2_to(start)
    perm0 = jnp.zeros((k,), jnp.int32).at[0].set(start.astype(jnp.int32))
    dists0 = jnp.full((k,), jnp.inf, X.dtype)

    def body(i, carry):
        dist, perm, dists = carry
        nxt = jnp.argmax(dist)
        dists = dists.at[i].set(jnp.sqrt(dist[nxt]))
        perm = perm.at[i].set(nxt.astype(jnp.int32))
        dist = jnp.minimum(dist, dist2_to(nxt))
        return (dist, perm, dists)

    dist, perm, dists = lax.fori_loop(1, k, body, (dist0, perm0, dists0))
    return FpsResult(perm=perm, dists=dists)


def fps_full_perm(X, k: int):
    """FPS prefix expanded to a full n-permutation (remaining ascending)."""
    from ..utils.datasets import expand_perm

    res = fps(X, k)
    return expand_perm(res.perm, X.shape[0]), res


def fps_host(X, k: int):
    """HOST numpy farthest-point sampling (parallel-algorithm-1 semantics).

    Plan-time landmark selection does not need the device: the O(nk)
    relaxation is ~4e7 flops at n=1e5/k=200 — microseconds of numpy next
    to a tunneled compile + k-step dispatch (measured ~10 s of the AFN
    plan).  Same start rule as fps(): the point nearest the data mean.
    Returns (perm (k,), dists (k,)) as numpy int64/float64.
    """
    import numpy as np

    X = np.asarray(X)
    n = X.shape[0]
    k = min(k, n)
    mean = X.mean(axis=0)
    start = int(np.argmin(((X - mean) ** 2).sum(axis=1)))
    perm = np.empty(k, np.int64)
    dists = np.empty(k, np.float64)
    perm[0] = start
    dists[0] = np.inf
    cur = ((X - X[start]) ** 2).sum(axis=1)
    for j in range(1, k):
        nxt = int(np.argmax(cur))
        perm[j] = nxt
        dists[j] = float(np.sqrt(cur[nxt]))
        d2 = ((X - X[nxt]) ** 2).sum(axis=1)
        np.minimum(cur, d2, out=cur)
    return perm, dists
