"""Row-sharded building blocks (explicit shard_map variants).

Most of the framework scales by annotating inputs with NamedShardings and
letting XLA insert collectives (parallel/mesh.py).  These explicit shard_map
wrappers document the communication pattern of the hot paths and serve as
the reference implementation for the scaling tests:

- dense kernel matvec: K row-sharded (n/P, n), x replicated -> local GEMV,
  output row-sharded; no communication in the matvec itself
- dot products: local partial + psum over the points axis (the PCG/Lanczos
  critical path, SURVEY.md §3.5)
- NDFT adjoint: per-shard phase GEMM then psum of the small mode tensor
  (the "all-reduce the Fourier grid" design, SURVEY.md §2.15)
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import POINTS_AXIS, points_sharding


def shard_points(mesh: Mesh, *arrays, axis: int = 0):
    """Device-put arrays with their points dimension sharded over the mesh."""
    out = []
    for a in arrays:
        sh = points_sharding(mesh, a.ndim, axis)
        out.append(jax.device_put(a, sh))
    return out if len(out) > 1 else out[0]


def sharded_dot(mesh: Mesh, axis_name: str = POINTS_AXIS):
    """dot(a, b) with both row-sharded: local partial then psum."""

    @jax.jit
    def dot(a, b):
        def local(a, b):
            return jax.lax.psum(jnp.vdot(a, b), axis_name)

        return shard_map(
            local, mesh=mesh, in_specs=(P(axis_name), P(axis_name)), out_specs=P()
        )(a, b)

    return dot


def sharded_matvec_dense(mesh: Mesh, K_sharded, axis_name: str = POINTS_AXIS):
    """matvec closure for a row-sharded dense kernel matrix.

    x arrives row-sharded; an all-gather materializes the full vector per
    shard (n floats — tiny next to the n^2/P matrix block), the local GEMV
    runs on the MXU, and the output stays row-sharded.
    """

    def mv(x):
        def local(Kb, xb):
            xf = jax.lax.all_gather(xb, axis_name, tiled=True)
            return Kb @ xf

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name)),
            out_specs=P(axis_name),
        )(K_sharded, x)

    return mv
