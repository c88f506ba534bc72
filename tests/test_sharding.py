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
