"""Compensated (float-float) reductions for f32 Krylov solves at scale.

The reference library runs float64 throughout (SRC/utils/utils.h:28-32), so
its dot products at N=1e6 carry ~1e-16 accumulation noise.  TPU f32 lane
reductions accumulate ~n/1024 sequential adds per lane, an ~1e-4 relative
noise floor at N=1e6 — enough to stall PCG/FGMRES well above 1e-5 relres
(measured: FGMRES stall at 2.1e-3, PLAN.md round-1 scale demo).

These helpers restore near-f64 *accumulation* semantics in pure f32:

- products are rounded once to f32 (unavoidable, eps-level, does not grow
  with n);
- chunk partial sums use the backend's tree reduction over small chunks
  (error ~ (chunk/1024) * eps, i.e. a few eps);
- chunks are combined with an error-free TwoSum scan into a (hi, lo)
  float-float accumulator — exact under round-to-nearest addition,
  independent of FMA contraction (unlike Dekker two-product splitting,
  which --xla_allow_excess_precision could break).

Total error ~ few * eps, independent of n — the f64 parity that the
reference's solver semantics assume (ref SRC/solvers/pcg.c:3-206 dots).
"""

import jax.numpy as jnp
from jax import lax

_CHUNK = 8192


def _two_sum(a, b):
    """Error-free a + b = s + e (Knuth TwoSum, 6 flops, no branch)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def comp_sum(x, chunk: int = _CHUNK):
    """Compensated sum of a 1-D array via chunked TwoSum accumulation."""
    n = x.shape[0]
    if n <= chunk:
        return jnp.sum(x)
    nb = -(-n // chunk)
    xp = jnp.zeros((nb * chunk,), x.dtype).at[:n].set(x)
    partials = jnp.sum(xp.reshape(nb, chunk), axis=1)

    def step(carry, p):
        hi, lo = carry
        hi, e = _two_sum(hi, p)
        return (hi, lo + e), None

    (hi, lo), _ = lax.scan(step, (jnp.zeros((), x.dtype),) * 2, partials)
    return hi + lo


def comp_dot(a, b, chunk: int = _CHUNK):
    """Compensated real dot product <a, b> (accumulation error ~ eps)."""
    return comp_sum((a * b).reshape(-1), chunk)


def comp_norm(a, chunk: int = _CHUNK):
    """Compensated 2-norm; rescaled by the max to avoid overflow at scale."""
    m = jnp.max(jnp.abs(a))
    safe_m = jnp.where(m == 0, 1.0, m)
    s = comp_sum(((a / safe_m) ** 2).reshape(-1), chunk)
    return safe_m * jnp.sqrt(jnp.maximum(s, 0.0))


def comp_gemv(V, w, chunk: int = _CHUNK):
    """Compensated V @ w for (m, n) V: per-chunk GEMV partials combined with
    a TwoSum scan.  Same FLOPs as the plain GEMV plus an O(n/chunk * m)
    scan; restores n-independent accumulation error in the CGS2
    orthogonalization passes (ref matops.c:274-346 runs in f64)."""
    m, n = V.shape
    if n <= chunk:
        return jnp.matmul(V, w, precision="highest")
    nb = n // chunk
    n0 = nb * chunk
    partials = jnp.einsum(
        "mbc,bc->bm",
        V[:, :n0].reshape(m, nb, chunk),
        w[:n0].reshape(nb, chunk),
        precision="highest",
    )
    if n0 < n:
        tail = jnp.matmul(V[:, n0:], w[n0:], precision="highest")
        partials = jnp.concatenate([partials, tail[None, :]], axis=0)

    def step(carry, p):
        hi, lo = carry
        hi, e = _two_sum(hi, p)
        return (hi, lo + e), None

    z = jnp.zeros((m,), V.dtype)
    (hi, lo), _ = lax.scan(step, (z, z), partials)
    return hi + lo


def make_reducers(compensated: bool):
    """(dot, norm) pair for a solver: plain jnp or compensated."""
    if compensated:
        return comp_dot, comp_norm
    return (lambda a, b: jnp.vdot(a, b)), jnp.linalg.norm
