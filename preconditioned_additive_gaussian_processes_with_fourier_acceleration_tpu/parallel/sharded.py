"""Row-sharded building blocks (explicit shard_map variants).

Most of the framework scales by annotating inputs with NamedShardings and
letting XLA insert collectives (parallel/mesh.py).  These explicit shard_map
wrappers document the communication pattern of the hot paths and serve as
the reference implementation for the scaling tests:

- dense kernel matvec: K row-sharded (n/P, n), x replicated -> local GEMV,
  output row-sharded; no communication in the matvec itself
- dot products: local partial + psum over the points axis (the PCG/Lanczos
  critical path, SURVEY.md §3.5)
- NDFT adjoint (sharded_ndft_adjoint / sharded_fastsum_matvec): per-shard
  phase GEMM then psum of the small mode tensor (the "all-reduce the
  Fourier grid" design, SURVEY.md §2.15); the forward pass is shard-local
- FSAI setup (sharded_fsai_setup): row-sharded block evaluation + batched
  choleskys (the reference's OpenMP setup loop, fsai.c:340-403)
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


def sharded_ndft_adjoint(mesh: Mesh, axis_name: str = POINTS_AXIS):
    """Folded NDFT adjoint under explicit shard_map.

    Tcs (d, n, 2P) and alpha (n,) arrive row-sharded on the points axis;
    each shard runs its local phase GEMM (ops/fastsum._folded_adjoint) and
    the small (2P,)^d mode tensor is psum'd — the "all-reduce the Fourier
    grid" design (SURVEY.md §2.15): communication volume is O(N^d),
    independent of n.  Reference analog: the threaded fastsum adjoint,
    nfft_interface.c:406-424.
    """
    from ..ops.fastsum import _folded_adjoint

    def adjoint(Tcs, alpha):
        def local(Tb, ab):
            return jax.lax.psum(_folded_adjoint(Tb, ab), axis_name)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(None, axis_name, None), P(axis_name)),
            out_specs=P(),
        )(Tcs, alpha)

    return adjoint


def sharded_fastsum_matvec(mesh: Mesh, plan, axis_name: str = POINTS_AXIS):
    """Full folded fastsum matvec (single plan) under explicit shard_map.

    adjoint: local phase GEMM + psum of the mode tensor (O(N^d) bytes);
    combine: replicated (tiny); forward: local rows, NO communication.
    x arrives row-sharded; output stays row-sharded.  The sparse near-field
    correction is cross-shard (KNN rows) and is not part of this reference
    impl — build the plan with nearfield_lfil=0.
    """
    from ..ops.fastsum import _folded_adjoint, _folded_combine, _folded_forward

    if plan.nf_val is not None:
        raise ValueError(
            "sharded_fastsum_matvec: build the plan with nearfield_lfil=0 "
            "(the sparse near-field correction is cross-shard)"
        )
    d = plan.d
    params = plan.params

    def mv(x):
        def local(Tb, xb, w):
            A = jax.lax.psum(_folded_adjoint(Tb, xb), axis_name)
            return _folded_forward(Tb, _folded_combine(w, A, d))

        y = shard_map(
            local, mesh=mesh,
            in_specs=(P(None, axis_name, None), P(axis_name), P()),
            out_specs=P(axis_name),
        )(plan.geom.Tcs, x, plan.w)
        f2 = params.f * params.f
        return f2 * (y + params.mu * x)

    return mv


def sharded_fsai_setup(mesh: Mesh, kind: str, params, X, pattern,
                       *, require_grad: bool = False, windows=None,
                       axis_name: str = POINTS_AXIS):
    """Row-sharded FSAI setup: block evaluation + batched row choleskys run
    shard-locally (rows are independent — the OpenMP-parallel setup loop of
    the reference, fsai.c:340-403, becomes a shard_map over row blocks).

    X is replicated (the pattern gathers arbitrary global rows); idx/mask
    arrive row-sharded; outputs (val, dval) stay row-sharded and the
    breakdown flag is OR-reduced across shards.  Returns an FsaiPrecond.
    """
    from ..preconds.fsai import FsaiPrecond, fsai_rows_from_blocks
    from ..ops.kernels import (
        kernel_matrix,
        kernel_matrix_with_grad,
        additive_kernel_matrix,
        additive_kernel_matrix_with_grad,
    )

    idx, mask = pattern

    def block_fn(Xf, J):
        XJ = Xf[J]
        if windows is None:
            if require_grad:
                return kernel_matrix_with_grad(kind, params, XJ)
            return kernel_matrix(kind, params, XJ), None
        if require_grad:
            return additive_kernel_matrix_with_grad(kind, params, XJ, windows)
        return additive_kernel_matrix(kind, params, XJ, windows), None

    if require_grad:

        def local(idx_b, mask_b, Xf):
            blocks, dblocks = jax.vmap(lambda J: block_fn(Xf, J))(idx_b)
            val, dval, bad = fsai_rows_from_blocks(blocks, dblocks, mask_b)
            return val, dval, jax.lax.pmax(bad.astype(jnp.int32), axis_name)

        val, dval, bad = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P()),
            out_specs=(P(axis_name), P(None, axis_name), P()),
        )(idx, mask, X)
    else:

        def local(idx_b, mask_b, Xf):
            blocks = jax.vmap(lambda J: block_fn(Xf, J)[0])(idx_b)
            val, _, bad = fsai_rows_from_blocks(blocks, None, mask_b)
            return val, jax.lax.pmax(bad.astype(jnp.int32), axis_name)

        val, bad = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P()),
            out_specs=(P(axis_name), P()),
        )(idx, mask, X)
        dval = None

    return FsaiPrecond(idx=idx, mask=mask, val=val, dval=dval,
                       breakdown=bad.astype(bool))
