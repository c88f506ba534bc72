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


def test_sharded_nearfield_matvec(mesh):
    """Cross-shard ELL apply == local (S + S' - diag) x."""
    from nfft4gp_tpu.ops.knn import knn_pattern
    from nfft4gp_tpu.ops.fastsum import nearfield_matvec
    from nfft4gp_tpu.parallel.sharded import sharded_nearfield_matvec

    rng = np.random.default_rng(3)
    n, lfil = 128, 6
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    idx, mask = knn_pattern(X, lfil)
    val = jnp.where(mask, jnp.asarray(rng.normal(size=(n, lfil))), 0.0)
    x = jnp.asarray(rng.normal(size=(n,)))
    y_ref = nearfield_matvec(idx, val, x)
    idx_s, val_s, x_s = shard_points(mesh, idx, val, x)
    y = jax.jit(sharded_nearfield_matvec(mesh, idx_s, val_s))(x_s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-10)
    assert y.sharding.spec == P("points")


def test_sharded_fastsum_matvec_with_nearfield(mesh):
    """Sharded matern12 matvec (near-field ON) == single-chip (weak #3 fix:
    the sharded path no longer forfeits the non-smooth-kernel correction)."""
    import dataclasses
    from nfft4gp_tpu.ops.fastsum import fastsum_build, fastsum_matvec
    from nfft4gp_tpu.parallel.sharded import sharded_fastsum_matvec

    rng = np.random.default_rng(5)
    n = 256
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.0, 0.3, 0.1)
    b = jnp.asarray(rng.normal(size=(n,)))
    plan = fastsum_build("matern12", p, X, N=16, nearfield_lfil=8)
    assert plan.nf_val is not None
    y_ref = fastsum_matvec(plan, b)
    sh_E = NamedSharding(mesh, P(None, "points", None))
    geom_s = dataclasses.replace(
        plan.geom,
        Tcs=jax.device_put(plan.geom.Tcs, sh_E),
        x=shard_points(mesh, plan.geom.x),
    )
    plan_s = dataclasses.replace(
        plan, geom=geom_s,
        nf_idx=shard_points(mesh, plan.nf_idx),
        nf_val=shard_points(mesh, plan.nf_val),
        nf_dval=shard_points(mesh, plan.nf_dval),
    )
    b_s = shard_points(mesh, b)
    y = jax.jit(sharded_fastsum_matvec(mesh, plan_s))(b_s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-9)
    assert y.sharding.spec == P("points")


@pytest.fixture(scope="module")
def stream_problem():
    from nfft4gp_tpu.ops.kernels import make_windows
    from nfft4gp_tpu.ops import fastsum as fs

    rng = np.random.default_rng(9)
    n, d = 256, 4
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    windows = make_windows([[0, 1], [2, 3], [1]])
    p = KernelParams.make(1.0, 0.5, 0.1, dtype=jnp.float32)
    plan = fs.additive_fastsum_build("matern12", p, X, windows)
    return X, p, v, windows, plan


def test_sharded_stream_ops_match_single_chip(mesh, stream_problem):
    """shard_map'd streamed packed-NDFT == single-chip packed kernels
    (same edge-trimmed modes, so the parity is roundoff-tight)."""
    from jax.sharding import NamedSharding
    from nfft4gp_tpu.ops import fastsum as fs
    from nfft4gp_tpu.parallel.sharded import sharded_stream_ops, _plan_specs

    X, p, v, windows, plan = stream_problem
    pn = fs.packed_ndft_plan(plan)
    y_ref = fs.packed_ndft_matvec(pn, v, interpret=True, upcast=True)
    dy_ref = fs.packed_ndft_grad_matvec(pn, v, interpret=True, upcast=True)

    specs = _plan_specs(plan, "points")
    plan_s = jax.tree_util.tree_map(
        lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
        plan, specs,
    )
    v_s = shard_points(mesh, v)
    mv, dmv = sharded_stream_ops(mesh, plan_s)
    y = jax.jit(mv)(v_s)
    dy = jax.jit(dmv)(v_s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref),
                               rtol=2e-5, atol=2e-5)
    assert y.sharding.spec == P("points")
    # vmapped probes dispatch to the native multi-RHS batch path
    Vb = jnp.stack([v, 2.0 * v, -v])
    Yb = jax.jit(lambda vv: jax.vmap(mv)(vv))(Vb)
    np.testing.assert_allclose(np.asarray(Yb[1]), 2.0 * np.asarray(y_ref),
                               rtol=2e-5, atol=5e-5)


def test_sharded_nystrom_setup_matches_local(mesh, stream_problem):
    """Gram-eigh distributed Nyström == tall-SVD single-chip setup."""
    from nfft4gp_tpu.preconds.nystrom import nystrom_setup
    from nfft4gp_tpu.parallel.sharded import sharded_nystrom_setup

    X, p, v, windows, _plan = stream_problem
    rng = np.random.default_rng(11)
    k = 32
    perm = jnp.asarray(rng.permutation(X.shape[0])[:k])
    ref = nystrom_setup("gaussian", p, X, perm, k, windows=windows)
    Xk = X[perm]
    X_s = shard_points(mesh, X)
    pre = jax.jit(
        lambda Xv, Xkv: sharded_nystrom_setup(
            mesh, "gaussian", p, Xv, Xkv, windows=windows)
    )(X_s, Xk)
    r_ref = ref.solve(v)
    r = pre.solve(shard_points(mesh, v))
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref),
                               rtol=2e-4, atol=2e-4 * float(jnp.max(jnp.abs(r_ref))))
    np.testing.assert_allclose(float(pre.logdet()), float(ref.logdet()), rtol=1e-5)


def test_sharded_train_step_afn_matern12(mesh):
    """Training factory: AFN precond + matern12 (near-field ON) sharded step
    matches the single-device step (the dryrun acceptance criterion)."""
    from nfft4gp_tpu.ops.kernels import make_windows
    from nfft4gp_tpu.models.adam import adam_init
    from nfft4gp_tpu.preconds.afn import afn_plan
    from nfft4gp_tpu.parallel.training import (
        make_sharded_train_step,
        shard_training_data,
    )
    from nfft4gp_tpu.solvers.lanczos import rademacher_probes

    rng = np.random.default_rng(21)
    n, d = 256, 4
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    windows = make_windows([[0, 1], [2, 3]])
    probes = rademacher_probes(jax.random.PRNGKey(1), 4, n, dtype=jnp.float32)
    p0 = KernelParams.make(1.0, 1.0, 0.1, dtype=jnp.float32)
    aplan = afn_plan("matern12", p0, X, maxrank=24, lfil=6,
                     key=jax.random.PRNGKey(2), force_afn=True, rank=24)
    step = make_sharded_train_step(
        windows, kernel="matern12", precond="afn", afn_plan=aplan,
        slq_its=4, nvecs=4, fastsum_N=16, engine="table",
    )
    raw0 = jnp.asarray([0.5, -0.5, -2.0], jnp.float32)
    _, loss_ref, grad_ref = step(adam_init(raw0), X, y, probes)
    X_s, y_s, probes_s = shard_training_data(mesh, X, y, probes)
    _, loss, grad = step(adam_init(raw0), X_s, y_s, probes_s)
    assert bool(jnp.isfinite(loss))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ref),
                               rtol=1e-3, atol=1e-5)
