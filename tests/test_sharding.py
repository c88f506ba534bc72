"""Multi-device sharding: solvers and matvecs over an 8-device CPU mesh.

Equivalent of multi-node tests the reference lacks (SURVEY.md §4): real XLA
collectives via --xla_force_host_platform_device_count=8.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nfft4gp_tpu.ops.kernels import KernelParams, kernel_matrix
from nfft4gp_tpu.ops.fastsum import fastsum_build, fastsum_matvec
from nfft4gp_tpu.parallel.mesh import make_mesh, points_sharding
from nfft4gp_tpu.parallel.sharded import (
    shard_points,
    sharded_matvec_dense,
    sharded_dot,
)
from nfft4gp_tpu.solvers.pcg import pcg


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "host platform device count not applied"
    return make_mesh(8)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(61)
    n = 256
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.0, 0.3, 0.1)
    K = kernel_matrix("gaussian", p, X)
    b = jnp.asarray(rng.normal(size=(n,)))
    return X, p, K, b


def test_sharded_dot(mesh, problem):
    X, p, K, b = problem
    a = b * 2.0
    a_s, b_s = shard_points(mesh, a, b)
    dot = sharded_dot(mesh)
    np.testing.assert_allclose(float(dot(a_s, b_s)), float(jnp.vdot(a, b)), rtol=1e-12)


def test_sharded_dense_matvec(mesh, problem):
    X, p, K, b = problem
    K_s = shard_points(mesh, K)
    b_s = shard_points(mesh, b)
    mv = sharded_matvec_dense(mesh, K_s)
    y = jax.jit(mv)(b_s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(K @ b), rtol=1e-10)
    # output stays row-sharded
    assert y.sharding.spec == P("points")


def test_pcg_on_sharded_inputs(mesh, problem):
    """The generic PCG runs unchanged on sharded inputs: XLA inserts the
    psums for every dot product (design goal: solvers stay backend-agnostic)."""
    X, p, K, b = problem
    K_s = shard_points(mesh, K)
    b_s = shard_points(mesh, b)

    res = jax.jit(
        lambda Km, bv: pcg(lambda x: Km @ x, bv, tol=1e-10, maxits=300).x
    )(K_s, b_s)
    np.testing.assert_allclose(
        np.asarray(res), np.asarray(jnp.linalg.solve(K, b)), rtol=1e-6, atol=1e-8
    )


def test_fastsum_on_sharded_points(mesh, problem):
    """NDFT phase tables row-sharded: the adjoint contraction all-reduces
    the small mode tensor, the forward stays local — SURVEY.md §2.15."""
    import dataclasses

    X, p, K, b = problem
    plan = fastsum_build("gaussian", p, X, N=32)
    sh_E = NamedSharding(mesh, P(None, "points", None))
    geom_s = dataclasses.replace(
        plan.geom,
        Tcs=jax.device_put(plan.geom.Tcs, sh_E),
        x=shard_points(mesh, plan.geom.x),
    )
    plan_s = dataclasses.replace(plan, geom=geom_s)
    b_s = shard_points(mesh, b)
    y = jax.jit(fastsum_matvec)(plan_s, b_s)
    y_ref = fastsum_matvec(plan, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-9)


def test_sharded_train_step(mesh):
    """Full sharded training step: loss finite and decreasing over 3 steps."""
    from nfft4gp_tpu.ops.kernels import make_windows
    from nfft4gp_tpu.parallel.training import train_sharded

    rng = np.random.default_rng(77)
    n = 8 * 24
    X = jnp.asarray(rng.uniform(size=(n, 4)))
    y = jnp.asarray(np.sin(5 * np.asarray(X[:, 0])) + 0.1 * rng.normal(size=n))
    windows = make_windows([[0], [1, 2], [3]])
    state, losses = train_sharded(
        X, y, windows=windows, n_devices=8, adam_maxits=3,
        nys_rank=16, slq_its=4, nvecs=4, fastsum_N=16, adam_alpha=0.05,
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_ndft_adjoint_matches_local(mesh, problem):
    """Explicit shard_map adjoint == single-device folded adjoint."""
    from nfft4gp_tpu.ops.fastsum import _folded_adjoint
    from nfft4gp_tpu.parallel.sharded import sharded_ndft_adjoint

    X, p, K, b = problem
    plan = fastsum_build("gaussian", p, X, N=16)
    Tcs = jax.device_put(plan.geom.Tcs, NamedSharding(mesh, P(None, "points", None)))
    b_s = shard_points(mesh, b)
    A = sharded_ndft_adjoint(mesh)(Tcs, b_s)
    A_ref = _folded_adjoint(plan.geom.Tcs, b)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref), rtol=1e-10)


def test_sharded_fastsum_matvec_matches_local(mesh, problem):
    """shard_map fastsum matvec (adjoint psum + local forward) == plain."""
    import dataclasses

    from nfft4gp_tpu.parallel.sharded import sharded_fastsum_matvec

    X, p, K, b = problem
    plan = fastsum_build("gaussian", p, X, N=16)
    sh_E = NamedSharding(mesh, P(None, "points", None))
    geom_s = dataclasses.replace(
        plan.geom,
        Tcs=jax.device_put(plan.geom.Tcs, sh_E),
        x=shard_points(mesh, plan.geom.x),
    )
    plan_s = dataclasses.replace(plan, geom=geom_s)
    b_s = shard_points(mesh, b)
    mv = sharded_fastsum_matvec(mesh, plan_s)
    y = jax.jit(mv)(b_s)
    y_ref = fastsum_matvec(plan, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-9)
    # output stays row-sharded over the points axis
    assert y.sharding.spec == P("points")


def test_sharded_fsai_setup_matches_local(mesh, problem):
    """Row-sharded FSAI setup == single-device setup (values and grads)."""
    from nfft4gp_tpu.ops.knn import knn_pattern
    from nfft4gp_tpu.preconds.fsai import fsai_setup
    from nfft4gp_tpu.parallel.sharded import sharded_fsai_setup

    X, p, K, b = problem
    lfil = 8
    idx, mask = knn_pattern(X, lfil)
    ref = fsai_setup("gaussian", p, X, lfil, require_grad=True,
                     pattern=(idx, mask))
    idx_s = shard_points(mesh, idx)
    mask_s = shard_points(mesh, mask)
    pre = sharded_fsai_setup(
        mesh, "gaussian", p, X, (idx_s, mask_s), require_grad=True
    )
    np.testing.assert_allclose(np.asarray(pre.val), np.asarray(ref.val), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(pre.dval), np.asarray(ref.dval), rtol=1e-9)
    assert bool(pre.breakdown) == bool(ref.breakdown)
    # the sharded precond must solve identically
    np.testing.assert_allclose(
        np.asarray(pre.solve(b)), np.asarray(ref.solve(b)), rtol=1e-10
    )
