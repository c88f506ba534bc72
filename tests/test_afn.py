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
