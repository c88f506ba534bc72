"""Preconditioner correctness: Chol, Nyström, FSAI (+ padded-ELL tri solves).

Oracles: explicit dense reconstructions of each preconditioner's M and the
reference formulas (SURVEY.md §2.8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nfft4gp_tpu as ng
from nfft4gp_tpu.ops.kernels import KernelParams, kernel_matrix, kernel_matrix_with_grad
from nfft4gp_tpu.ops.matops import (
    ell_matvec,
    ell_rmatvec,
    ell_tril_solve,
    ell_triu_solve,
)
from nfft4gp_tpu.ops.knn import knn_pattern
from nfft4gp_tpu.preconds.chol import chol_setup
from nfft4gp_tpu.preconds.nystrom import nystrom_setup
from nfft4gp_tpu.preconds.fsai import fsai_setup
from nfft4gp_tpu.solvers.pcg import pcg
from nfft4gp_tpu.utils.datasets import rand_perm, expand_perm


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    n = 150
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.1, 0.25, 0.2)
    K, dK = kernel_matrix_with_grad("gaussian", p, X)
    b = jnp.asarray(rng.normal(size=(n,)))
    return X, p, K, dK, b


# --- Cholesky ---------------------------------------------------------------

def test_chol_solve_logdet_trace_dvp(problem):
    X, p, K, dK, b = problem
    pre = chol_setup(K, dK=dK, require_grad=True)
    x = pre.solve(b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(jnp.linalg.solve(K, b)),
                               rtol=1e-8, atol=1e-10)
    _, ld = jnp.linalg.slogdet(K)
    np.testing.assert_allclose(float(pre.logdet()), float(ld), rtol=1e-10)
    iK = jnp.linalg.inv(K)
    tr = pre.trace()
    for j in range(3):
        np.testing.assert_allclose(float(tr[j]), float(jnp.trace(iK @ dK[j])),
                                   rtol=1e-8)
    pv = pre.dvp(b)
    for j in range(3):
        np.testing.assert_allclose(np.asarray(pv[j]), np.asarray(iK @ (dK[j] @ b)),
                                   rtol=1e-7, atol=1e-9)


# --- padded-ELL triangular solves ------------------------------------------

def test_ell_triangular_solves():
    rng = np.random.default_rng(3)
    n, lfil = 137, 6
    # random lower-tri ELL with diag at last slot
    idx = np.zeros((n, lfil), np.int32)
    val = np.zeros((n, lfil))
    for i in range(n):
        nnb = min(i, lfil - 1)
        cols = rng.choice(i, size=nnb, replace=False) if nnb > 0 else []
        cols = sorted(cols)
        for s, c in enumerate(cols):
            idx[i, s] = c
            val[i, s] = rng.normal() * 0.3
        idx[i, nnb:] = i
        val[i, lfil - 1] = 1.0 + rng.uniform()
    G = np.zeros((n, n))
    for i in range(n):
        for s in range(lfil):
            G[i, idx[i, s]] += val[i, s]
    b = rng.normal(size=n)
    y1 = ell_tril_solve(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(b), block=32)
    np.testing.assert_allclose(np.asarray(y1), np.linalg.solve(G, b), rtol=1e-9, atol=1e-10)
    y2 = ell_triu_solve(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(b), block=32)
    np.testing.assert_allclose(np.asarray(y2), np.linalg.solve(G.T, b), rtol=1e-9, atol=1e-10)
    # matvec / rmatvec
    np.testing.assert_allclose(
        np.asarray(ell_matvec(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(b))),
        G @ b, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(ell_rmatvec(jnp.asarray(idx), jnp.asarray(val), jnp.asarray(b))),
        G.T @ b, rtol=1e-12)


# --- Nyström ----------------------------------------------------------------

def test_nystrom_solve_and_logdet(problem):
    X, p, K, dK, b = problem
    n = K.shape[0]
    k = 40
    perm = expand_perm(rand_perm(jax.random.PRNGKey(5), n, k), n)
    pre = nystrom_setup("gaussian", p, X, perm, k, require_grad=True)

    # M = Uf Uf' + eta I — factors stored in ORIGINAL row order (the
    # permuted layout is a reference C-code convenience; see nystrom.py)
    Uf = np.asarray(pre.Uf)
    eta = float(pre.eta)
    M = Uf @ Uf.T + eta * np.eye(n)
    x_ref = np.linalg.solve(M, np.asarray(b))
    x = np.asarray(pre.solve(b))
    np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-8)

    _, ld = np.linalg.slogdet(M)
    np.testing.assert_allclose(float(pre.logdet()), ld, rtol=1e-8)


def test_nystrom_dvp_trace_consistent(problem):
    """trace_j must equal tr(M^{-1} dM_j) for the dvp's dM (built densely)."""
    X, p, K, dK, b = problem
    n = K.shape[0]
    k = 40
    perm = expand_perm(rand_perm(jax.random.PRNGKey(5), n, k), n)
    pre = nystrom_setup("gaussian", p, X, perm, k, require_grad=True)

    Uf = np.asarray(pre.Uf)
    eta = float(pre.eta)
    M = Uf @ Uf.T + eta * np.eye(n)
    Minv = np.linalg.inv(M)
    K1 = np.asarray(pre.K1)
    K11 = K1[:k]
    iK11 = np.linalg.inv(K11 + float(0) * np.eye(k))
    # use the same stabilized K11 the precond used: L11 L11'
    L11 = np.asarray(pre.L11)
    iK11 = np.linalg.inv(L11 @ L11.T)

    tr = np.asarray(pre.trace())
    for j in range(2):
        dK1 = np.asarray(pre.dK1[j])
        dK11 = np.asarray(pre.dK11[j])
        dM = dK1 @ iK11 @ K1.T + K1 @ iK11 @ dK1.T - K1 @ iK11 @ dK11 @ iK11 @ K1.T
        expect = np.trace(Minv @ dM)
        np.testing.assert_allclose(tr[j], expect, rtol=1e-6)
        # dvp = M^{-1} dM z (original row order)
        z = np.asarray(b)
        px = np.asarray(pre.dvp(b)[j])
        np.testing.assert_allclose(px, Minv @ dM @ z, rtol=1e-6, atol=1e-8)
    # third param: dM = f^2 I pair
    f2 = float(pre.f2)
    np.testing.assert_allclose(tr[2], f2 * np.trace(Minv), rtol=1e-6)


def test_nystrom_accelerates_pcg(problem):
    X, p, K, dK, b = problem
    n = K.shape[0]
    perm = expand_perm(rand_perm(jax.random.PRNGKey(5), n, 40), n)
    pre = nystrom_setup("gaussian", p, X, perm, 40)
    plain = pcg(lambda x: K @ x, b, tol=1e-8, maxits=400)
    fast = pcg(lambda x: K @ x, b, precond=pre.solve, tol=1e-8, maxits=400)
    assert int(fast.niter) < int(plain.niter)
    np.testing.assert_allclose(np.asarray(fast.x), np.asarray(jnp.linalg.solve(K, b)),
                               rtol=1e-6, atol=1e-7)


# --- FSAI -------------------------------------------------------------------

def _dense_G(pre, n):
    G = np.zeros((n, n))
    idx = np.asarray(pre.idx)
    val = np.asarray(pre.val)
    for i in range(n):
        for s in range(idx.shape[1]):
            G[i, idx[i, s]] += val[i, s]
    return G


def test_fsai_rows_and_solve(problem):
    X, p, K, dK, b = problem
    n = K.shape[0]
    pre = fsai_setup("gaussian", p, X, lfil=10, require_grad=True)
    G = _dense_G(pre, n)
    # G is lower triangular with positive diagonal
    assert np.allclose(G, np.tril(G))
    assert (np.diag(G) > 0).all()

    # each row satisfies the FSAI normal equations on its pattern:
    # K(J,J) g_J proportional to e_i with g_i = 1/sqrt(e' K^{-1} e)
    Kn = np.asarray(K)
    idx = np.asarray(pre.idx)
    mask = np.asarray(pre.mask)
    for i in [5, 50, 100]:
        J = idx[i][mask[i]]
        KJ = Kn[np.ix_(J, J)]
        u = np.linalg.solve(KJ, np.eye(len(J))[:, -1])
        g = u / np.sqrt(u[-1])
        np.testing.assert_allclose(G[i, J], g, rtol=1e-8, atol=1e-10)

    # solve = G' G r
    r = np.asarray(b)
    np.testing.assert_allclose(np.asarray(pre.solve(b)), G.T @ (G @ r), rtol=1e-9, atol=1e-10)

    # logdet(M) with M = (G'G)^{-1}
    _, ldGtG = np.linalg.slogdet(G.T @ G)
    np.testing.assert_allclose(float(pre.logdet()), -ldGtG, rtol=1e-9)


def test_fsai_gradient_rows_finite_difference(problem):
    X, p, K, dK, b = problem
    n = K.shape[0]
    pre = fsai_setup("gaussian", p, X, lfil=8, require_grad=True)
    eps = 1e-6
    vals = [1.1, 0.25, 0.2]
    pattern = (pre.idx, pre.mask)
    for j in range(3):
        hi = list(vals); lo = list(vals)
        hi[j] += eps; lo[j] -= eps
        ph = KernelParams.make(*hi)
        pl = KernelParams.make(*lo)
        vh = np.asarray(fsai_setup("gaussian", ph, X, lfil=8, pattern=pattern).val)
        vl = np.asarray(fsai_setup("gaussian", pl, X, lfil=8, pattern=pattern).val)
        fd = (vh - vl) / (2 * eps)
        np.testing.assert_allclose(np.asarray(pre.dval[j]), fd, rtol=5e-5, atol=1e-7)


def test_fsai_dvp_matches_dense_reference(problem):
    """dvp == the reference operator sequence computed densely (fsai.c:158-216)."""
    X, p, K, dK, b = problem
    n = K.shape[0]
    pre = fsai_setup("gaussian", p, X, lfil=8, require_grad=True)
    G = _dense_G(pre, n)
    dG = np.zeros((3, n, n))
    idx = np.asarray(pre.idx)
    dval = np.asarray(pre.dval)
    for i in range(n):
        for s in range(idx.shape[1]):
            dG[:, i, idx[i, s]] += dval[:, i, s]
    z = np.asarray(b)
    px = np.asarray(pre.dvp(b))
    iG = np.linalg.inv(G)
    M = iG @ iG.T
    for j in range(3):
        ref = G.T @ iG.T @ dG[j].T @ iG.T @ z + G.T @ dG[j] @ (M @ z)
        np.testing.assert_allclose(px[j], ref, rtol=1e-7, atol=1e-9)
    # trace formula
    tr = np.asarray(pre.trace())
    expect = 2 * (np.diagonal(dG, axis1=1, axis2=2) / np.diag(G)[None, :]).sum(axis=1)
    np.testing.assert_allclose(tr, expect, rtol=1e-10)


def test_fsai_accelerates_pcg(problem):
    X, p, K, dK, b = problem
    pre = fsai_setup("gaussian", p, X, lfil=12)
    plain = pcg(lambda x: K @ x, b, tol=1e-8, maxits=400)
    fast = pcg(lambda x: K @ x, b, precond=pre.solve, tol=1e-8, maxits=400)
    assert int(fast.niter) < int(plain.niter)
    np.testing.assert_allclose(np.asarray(fast.x), np.asarray(jnp.linalg.solve(K, b)),
                               rtol=1e-6, atol=1e-7)
