"""AFN preconditioner: solve/logdet/trace/dvp vs dense reconstructions.

Oracle: the block factorization M = U'U with
U = [[L11', L11^{-1}K12], [0, G^{-T}]] (MATLAB afn_* reference, SURVEY §3.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.ops.kernels import KernelParams, kernel_matrix, kernel_matrix_with_grad
from nfft4gp_tpu.preconds.afn import afn_setup, afn_plan, afn_setup_from_plan, AfnPrecond
from nfft4gp_tpu.preconds.nystrom import NystromPrecond
from nfft4gp_tpu.solvers.pcg import pcg


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    n = 160
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.0, 0.15, 0.1)
    K, dK = kernel_matrix_with_grad("gaussian", p, X)
    b = jnp.asarray(rng.normal(size=(n,)))
    return X, p, K, dK, b


@pytest.fixture(scope="module")
def afn(problem):
    X, p, K, dK, b = problem
    pre, plan = afn_setup(
        "gaussian", p, X, maxrank=30, lfil=10, rank=60, require_grad=True,
        force_afn=True,
    )
    assert isinstance(pre, AfnPrecond)
    return pre, plan


def _dense_U(pre):
    n = pre.n
    k = pre.k
    L11 = np.asarray(pre.L11)
    GK12 = np.asarray(pre.GK12)
    idxg = np.asarray(pre.gs.idx)
    valg = np.asarray(pre.gs.val)
    n2 = n - k
    G = np.zeros((n2, n2))
    for i in range(n2):
        for s in range(idxg.shape[1]):
            G[i, idxg[i, s]] += valg[i, s]
    U = np.zeros((n, n))
    U[:k, :k] = L11.T
    U[:k, k:] = GK12
    U[k:, k:] = np.linalg.inv(G).T
    return U, G


def test_afn_solve_matches_dense(afn, problem):
    X, p, K, dK, b = problem
    pre, plan = afn
    U, G = _dense_U(pre)
    M = U.T @ U
    P = np.asarray(pre.perm)
    bp = np.asarray(b)[P]
    x_ref = np.linalg.solve(M, bp)
    x = np.asarray(pre.solve(b))[P]
    np.testing.assert_allclose(x, x_ref, rtol=1e-7, atol=1e-9)


def test_afn_logdet(afn):
    pre, plan = afn
    U, G = _dense_U(pre)
    M = U.T @ U
    _, ld = np.linalg.slogdet(M)
    np.testing.assert_allclose(float(pre.logdet()), ld, rtol=1e-8)


def test_afn_trace_and_dvp_consistent(afn, problem):
    """trace == tr(M^{-1}dM) with dM = dU'U + U'dU built densely from the
    stored dL11 / dK12 / dG blocks; dvp == M^{-1} dM z."""
    X, p, K, dK, b = problem
    pre, plan = afn
    n, k = pre.n, pre.k
    U, G = _dense_U(pre)
    M = U.T @ U
    Minv = np.linalg.inv(M)
    L11 = np.asarray(pre.L11)
    iL11 = np.linalg.inv(L11)
    GK12 = np.asarray(pre.GK12)
    n2 = n - k
    idxg = np.asarray(pre.gs.idx)
    dvalg = np.asarray(pre.gs.dval)
    iG = np.linalg.inv(G)

    tr = np.asarray(pre.trace())
    px_all = np.asarray(pre.dvp(b))
    P = np.asarray(pre.perm)
    z = np.asarray(b)[P]

    for j in range(3):
        dL = np.asarray(pre.dL11[j])
        dK12 = np.asarray(pre.dK12[j])
        dG = np.zeros((n2, n2))
        for i in range(n2):
            for s in range(idxg.shape[1]):
                dG[i, idxg[i, s]] += dvalg[j, i, s]
        # dU from the factor definitions:
        # d(L11') = dL'; d(L11^{-1}K12) = -L^{-1} dL L^{-1} K12 + L^{-1} dK12
        # d(G^{-T}) = -G^{-T} dG' G^{-T}
        dU = np.zeros((n, n))
        dU[:k, :k] = dL.T
        dU[:k, k:] = -iL11 @ dL @ iL11 @ np.asarray(pre.K12) + iL11 @ dK12
        dU[k:, k:] = -(iG.T @ dG.T @ iG.T)
        dM = dU.T @ U + U.T @ dU
        expect_tr = np.trace(Minv @ dM)
        np.testing.assert_allclose(tr[j], expect_tr, rtol=1e-6, atol=1e-8)
        expect_px = Minv @ dM @ z
        np.testing.assert_allclose(px_all[j][P], expect_px, rtol=1e-6, atol=1e-8)


def test_afn_accelerates_pcg(afn, problem):
    X, p, K, dK, b = problem
    pre, plan = afn
    plain = pcg(lambda x: K @ x, b, tol=1e-8, maxits=400)
    fast = pcg(lambda x: K @ x, b, precond=pre.solve, tol=1e-8, maxits=400)
    assert int(fast.niter) < int(plain.niter)
    np.testing.assert_allclose(
        np.asarray(fast.x), np.asarray(jnp.linalg.solve(K, b)), rtol=1e-6, atol=1e-7
    )


def test_afn_ran_fallback(problem):
    """Estimated rank below maxrank -> plain Nyström on FPS landmarks."""
    X, p, K, dK, b = problem
    pre, plan = afn_setup("gaussian", p, X, maxrank=100, lfil=10, rank=20)
    assert plan.use_ran
    assert isinstance(pre, NystromPrecond)
    fast = pcg(lambda x: K @ x, b, precond=pre.solve, tol=1e-8, maxits=400)
    np.testing.assert_allclose(
        np.asarray(fast.x), np.asarray(jnp.linalg.solve(K, b)), rtol=1e-6, atol=1e-7
    )


def test_fsai_breakdown_repair():
    """A non-SPD block must yield finite repaired rows + breakdown flag
    (ref afn_setup.m:93-98 breakdown detection)."""
    from nfft4gp_tpu.preconds.fsai import fsai_rows_from_blocks

    rng = np.random.default_rng(3)
    n, lfil = 12, 5
    A = rng.normal(size=(n, lfil, lfil))
    blocks = jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + 0.5 * np.eye(lfil))
    # make row 4 exactly singular (rank-1) and row 7 indefinite
    blocks = blocks.at[4].set(jnp.ones((lfil, lfil)))
    blocks = blocks.at[7].set(-jnp.eye(lfil))
    mask = jnp.ones((n, lfil), bool)
    dblocks = jnp.asarray(rng.normal(size=(n, 3, lfil, lfil)))
    dblocks = 0.5 * (dblocks + jnp.swapaxes(dblocks, 2, 3))

    val, dval, breakdown = fsai_rows_from_blocks(blocks, dblocks, mask)
    assert bool(breakdown)
    assert np.all(np.isfinite(np.asarray(val)))
    assert np.all(np.isfinite(np.asarray(dval)))
    # repaired rows are diagonal: g = e / sqrt(|B_ll|)
    np.testing.assert_allclose(np.asarray(val[4, :-1]), 0.0)
    np.testing.assert_allclose(float(val[4, -1]), 1.0, rtol=1e-12)
    np.testing.assert_allclose(float(val[7, -1]), 1.0, rtol=1e-12)
    # healthy rows unchanged vs a healthy-only batch
    val2, _, b2 = fsai_rows_from_blocks(
        blocks[:4], dblocks[:4], mask[:4]
    )
    assert not bool(b2)
    np.testing.assert_allclose(np.asarray(val[:4]), np.asarray(val2))


def test_afn_breakdown_falls_back_to_ran(problem):
    """Degenerate Schur blocks (duplicate points, mu=0) -> wholesale RAN
    fallback, matching afn_setup.m:93-98; PCG still converges."""
    rng = np.random.default_rng(5)
    n = 96
    base = rng.uniform(size=(n // 2, 2))
    X = jnp.asarray(np.concatenate([base, base], axis=0))  # exact duplicates
    p0 = KernelParams.make(1.0, 0.3, 0.0)  # zero noise -> singular blocks
    pre, plan = afn_setup(
        "gaussian", p0, X, maxrank=16, lfil=6, rank=16, force_afn=True
    )
    assert plan.use_ran
    assert isinstance(pre, NystromPrecond)
    # refactorize the fallen-back plan at a positive-noise parameter point
    # (the training flow: structure from the plan, numerics per params) and
    # solve an SPD system with it
    p1 = KernelParams.make(1.0, 0.3, 0.05)
    pre = afn_setup_from_plan("gaussian", p1, X, plan)
    K = kernel_matrix("gaussian", p1, X)
    b = jnp.asarray(rng.normal(size=(n,)))
    fast = pcg(lambda x: K @ x, b, precond=pre.solve, tol=1e-8, maxits=300)
    np.testing.assert_allclose(
        np.asarray(fast.x), np.asarray(jnp.linalg.solve(K, b)), rtol=1e-5, atol=1e-6
    )
    assert np.all(np.isfinite(np.asarray(fast.x)))


def test_afn_jitted_repair_no_nan(problem):
    """Inside jit (no structure switch possible) degenerate Schur blocks are
    row-repaired: the AFN solve stays finite and SPD."""
    rng = np.random.default_rng(7)
    n = 96
    base = rng.uniform(size=(n // 2, 2))
    X = jnp.asarray(np.concatenate([base, base], axis=0))
    p0 = KernelParams.make(1.0, 0.3, 0.0)
    plan = afn_plan("gaussian", p0, X, maxrank=16, lfil=6, rank=16, force_afn=True)
    assert not plan.use_ran
    pre = jax.jit(
        lambda Xv: afn_setup_from_plan("gaussian", p0, Xv, plan, require_grad=True)
    )(X)
    assert bool(pre.breakdown)
    r = jnp.asarray(rng.normal(size=(n,)))
    y = pre.solve(r)
    assert np.all(np.isfinite(np.asarray(y)))
    assert float(r @ y) > 0.0  # SPD
    assert np.isfinite(float(pre.logdet()))
    assert np.all(np.isfinite(np.asarray(pre.trace())))


def test_afn_stencil_active_and_matches_ell(problem):
    """The cell-stencil FSAI apply must be ACTIVE on continuous 2-D data and
    reproduce the padded-ELL solve exactly (same G values, new layout)."""
    import dataclasses

    X, p, K, dK, b = problem
    pre, plan = afn_setup(
        "gaussian", p, X, maxrank=30, lfil=10, rank=60, force_afn=True,
    )
    assert plan.sdev is not None
    assert pre.gs.sdev is not None
    gs_ell = dataclasses.replace(
        pre.gs, sdev=None, sA=None, sAT=None,
        exc_rows=None, exc_cols=None, exc_v=None,
    )
    r = jnp.asarray(np.random.default_rng(3).normal(size=(pre.gs.idx.shape[0],)))
    np.testing.assert_allclose(
        np.asarray(pre.gs.solve(r)), np.asarray(gs_ell.solve(r)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pre.gs.apply_G(r)), np.asarray(gs_ell.apply_G(r)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pre.gs.apply_Gt(r)), np.asarray(gs_ell.apply_Gt(r)),
        rtol=1e-5, atol=1e-6,
    )


def test_afn_highdim_projection_stencil(problem):
    """d > 3: the Schur pattern/order come from the 2-PC PCA projection
    (measured equal preconditioning quality, .r5_pattern_probe_*.log) and
    the stencil path still matches the ELL apply."""
    import dataclasses

    rng = np.random.default_rng(5)
    n, d = 400, 6
    X = jnp.asarray(rng.uniform(size=(n, d)))
    p = KernelParams.make(1.0, 0.5, 0.05)
    pre, plan = afn_setup("gaussian", p, X, maxrank=30, lfil=8, rank=60,
                          force_afn=True)
    assert plan.sdev is not None
    r = jnp.asarray(rng.normal(size=(n - pre.k,)))
    gs_ell = dataclasses.replace(
        pre.gs, sdev=None, sA=None, sAT=None,
        exc_rows=None, exc_cols=None, exc_v=None,
    )
    np.testing.assert_allclose(
        np.asarray(pre.gs.solve(r)), np.asarray(gs_ell.solve(r)),
        rtol=1e-5, atol=1e-6,
    )
    # and the preconditioner still accelerates PCG on the dense operator
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.pcg import pcg
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import kernel_matrix

    K6 = kernel_matrix("gaussian", p, X)
    b6 = jnp.asarray(rng.normal(size=(n,)))
    res_pre = pcg(lambda v: K6 @ v, b6, precond=pre.solve, tol=1e-8, maxits=150)
    res_nop = pcg(lambda v: K6 @ v, b6, tol=1e-8, maxits=150)
    assert int(res_pre.niter) < int(res_nop.niter)
