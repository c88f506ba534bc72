"""Krylov solver correctness: PCG, FGMRES, Lanczos, SLQ.

Oracles: dense jnp.linalg solves / slogdet, and the exact-preconditioner
identity (with M = K the SLQ quadrature is exact up to probe variance in
the first step — ref SURVEY.md §4 solver behavior anchors).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nfft4gp_tpu as ng
from nfft4gp_tpu.ops.kernels import KernelParams, kernel_matrix, kernel_matrix_with_grad
from nfft4gp_tpu.solvers.pcg import pcg
from nfft4gp_tpu.solvers.fgmres import fgmres
from nfft4gp_tpu.solvers.lanczos import lanczos, slq_logdet, rademacher_probes
from nfft4gp_tpu.preconds.chol import chol_setup


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(1)
    n = 120
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.0, 0.3, 0.1)
    K, dK = kernel_matrix_with_grad("gaussian", p, X)
    b = jnp.asarray(rng.normal(size=(n,)))
    return X, p, K, dK, b


def test_pcg_solves(problem):
    X, p, K, dK, b = problem
    res = pcg(lambda x: K @ x, b, tol=1e-10, maxits=500)
    x_ref = jnp.linalg.solve(K, b)
    assert float(res.relres) < 1e-9
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), rtol=1e-6, atol=1e-8)
    assert bool(res.converged)


def test_pcg_preconditioned_fewer_iters(problem):
    X, p, K, dK, b = problem
    plain = pcg(lambda x: K @ x, b, tol=1e-8, maxits=500)
    pre = chol_setup(K)
    precond = pcg(lambda x: K @ x, b, precond=pre.solve, tol=1e-8, maxits=500)
    assert int(precond.niter) <= 3
    assert int(precond.niter) < int(plain.niter)
    x_ref = jnp.linalg.solve(K, b)
    np.testing.assert_allclose(np.asarray(precond.x), np.asarray(x_ref), rtol=1e-6, atol=1e-8)


def test_fgmres_solves(problem):
    X, p, K, dK, b = problem
    res = fgmres(lambda x: K @ x, b, kdim=120, maxits=120, tol=1e-10)
    x_ref = jnp.linalg.solve(K, b)
    assert float(res.relres) < 1e-9
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), rtol=1e-6, atol=1e-8)


def test_fgmres_restarted(problem):
    X, p, K, dK, b = problem
    res = fgmres(lambda x: K @ x, b, kdim=20, maxits=200, tol=1e-8)
    x_ref = jnp.linalg.solve(K, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), rtol=1e-5, atol=1e-7)


def test_fgmres_preconditioned(problem):
    X, p, K, dK, b = problem
    pre = chol_setup(K)
    res = fgmres(lambda x: K @ x, b, precond=pre.solve, kdim=20, maxits=20, tol=1e-10)
    assert int(res.niter) <= 3
    x_ref = jnp.linalg.solve(K, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), rtol=1e-6, atol=1e-8)


def test_lanczos_solve(problem):
    X, p, K, dK, b = problem
    res = lanczos(lambda x: K @ x, b, maxits=100, tol=0.0)
    x_ref = jnp.linalg.solve(K, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref), rtol=1e-5, atol=1e-6)


def test_lanczos_tridiagonal_eigs_spectrum(problem):
    """With full reorth and maxits=n the Ritz values match K's spectrum."""
    X, p, K, dK, b = problem
    n = b.shape[0]
    res = lanczos(lambda x: K @ x, b, maxits=n, tol=0.0)
    T = jnp.diag(res.alpha) + jnp.diag(res.beta, 1) + jnp.diag(res.beta, -1)
    ritz = jnp.sort(jnp.linalg.eigvalsh(T))
    eigs = jnp.sort(jnp.linalg.eigvalsh(K))
    # extreme eigenvalues converge first
    np.testing.assert_allclose(float(ritz[-1]), float(eigs[-1]), rtol=1e-8)


def test_slq_logdet_unpreconditioned(problem):
    X, p, K, dK, b = problem
    n = K.shape[0]
    probes = rademacher_probes(jax.random.PRNGKey(3), 30, n)
    res = slq_logdet(
        lambda x: K @ x,
        lambda x: jnp.einsum("knm,m->kn", dK, x),
        probes,
        maxits=30,
    )
    _, logdet_exact = jnp.linalg.slogdet(K)
    assert abs(float(res.logdet) - float(logdet_exact) / n) < 0.05
    # trace terms tr(K^{-1} dK_j)/n
    iK = jnp.linalg.inv(K)
    for j in range(3):
        exact = float(jnp.trace(iK @ dK[j])) / n
        assert abs(float(res.dlogdet[j]) - exact) < 0.08 * max(1.0, abs(exact))


def test_slq_logdet_chol_preconditioned_exact(problem):
    """With M = K the preconditioned operator is I: SLQ becomes exact."""
    X, p, K, dK, b = problem
    n = K.shape[0]
    pre = chol_setup(K, dK=dK, require_grad=True)
    probes = rademacher_probes(jax.random.PRNGKey(4), 6, n)
    res = slq_logdet(
        lambda x: K @ x,
        lambda x: jnp.einsum("knm,m->kn", dK, x),
        probes,
        maxits=8,
        precond=pre,
    )
    _, logdet_exact = jnp.linalg.slogdet(K)
    np.testing.assert_allclose(float(res.logdet), float(logdet_exact) / n, rtol=1e-8)
    iK = jnp.linalg.inv(K)
    for j in range(3):
        exact = float(jnp.trace(iK @ dK[j])) / n
        np.testing.assert_allclose(float(res.dlogdet[j]), exact, rtol=1e-6, atol=1e-8)


def test_pcg_residual_history(problem):
    X, p, K, dK, b = problem
    res = pcg(lambda x: K @ x, b, tol=1e-8, maxits=300)
    h = np.asarray(res.res_history)
    it = int(res.niter)
    assert np.isfinite(h[: it + 1]).all()
    assert h[0] == pytest.approx(1.0)
    assert h[it] < 1e-8 * 10


def test_slq_nan_trim(problem):
    """A blow-up matvec must still give a finite SLQ estimate.

    Ref lanczos.c:526-548: the reference trims the tridiagonal to its
    leading finite block before quadrature when the recursion produces
    NaN/inf; the trimmed estimate degrades gracefully instead of
    poisoning the loss.
    """
    X, p, K, dK, b = problem
    n = K.shape[0]

    def blowup_matvec(x):
        # overflow to +-inf; the Gram-Schmidt inf*0 sums then produce NaN
        return (K @ x) * jnp.inf

    # guard: the raw recursion really does blow up (otherwise this test
    # would pass vacuously through the existing breakdown guards)
    raw = lanczos(blowup_matvec, b, maxits=12, tol=0.0)
    assert not bool(jnp.isfinite(raw.alpha).all())

    probes = rademacher_probes(jax.random.PRNGKey(7), 4, n)
    res = slq_logdet(
        blowup_matvec,
        lambda x: jnp.einsum("knm,m->kn", dK, x),
        probes,
        maxits=12,
    )
    assert np.isfinite(float(res.logdet))
    assert np.isfinite(np.asarray(res.dlogdet)).all()


def test_compensated_reductions_f32():
    """TwoSum float-float accumulation recovers what single-f32 loses.

    Cross-chunk cancellation at the 2^24 f32 integer limit: a plain f32
    accumulator absorbs the small chunk sums into the big ones; the
    compensated scan keeps them exactly (ref: the C library's f64 dot
    semantics, SRC/utils/utils.h:28-32).
    """
    from nfft4gp_tpu.solvers.reductions import comp_dot, comp_norm, comp_sum

    chunk = 128
    big = np.float32(2.0**24)
    blocks = [np.zeros(chunk, np.float32) for _ in range(10)]
    blocks[0][0] = big
    for blk in blocks[1:-1]:
        blk[0] = 1.0
    blocks[-1][0] = -big
    x = jnp.asarray(np.concatenate(blocks))

    s = float(comp_sum(x, chunk=chunk))
    assert s == 8.0  # exactly: eight interior chunks of 1.0

    # sanity on random data vs f64 oracle
    rng = np.random.default_rng(3)
    a64 = rng.normal(size=100_000) + 0.3
    b64 = rng.normal(size=100_000) + 0.1
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    ref = float(np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64)))
    got = float(comp_dot(a, b))
    assert abs(got - ref) / abs(ref) < 5e-6
    refn = float(np.linalg.norm(np.asarray(a, np.float64)))
    assert abs(float(comp_norm(a)) - refn) / refn < 5e-6


def test_solvers_compensated_path(problem):
    """compensated=True must converge identically on a benign problem."""
    X, p, K, dK, b = problem
    res = pcg(lambda x: K @ x, b, tol=1e-10, maxits=300, compensated=True)
    assert float(res.relres) < 1e-9
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(jnp.linalg.solve(K, b)), rtol=1e-6
    )
    resf = fgmres(lambda x: K @ x, b, kdim=60, maxits=120, tol=1e-10,
                  compensated=True)
    assert float(resf.relres) < 1e-9


def test_fused_pcg_dense_interpret(problem):
    """Single-kernel fused PCG == jnp.linalg.solve (interpret mode)."""
    from nfft4gp_tpu.solvers.pallas_pcg import fused_pcg_dense

    X, p, K, dK, b = problem
    K32 = jnp.asarray(np.asarray(K), jnp.float32)
    b32 = jnp.asarray(np.asarray(b), jnp.float32)
    x, relres, niter = fused_pcg_dense(K32, b32, maxits=300, tol=1e-5,
                                       blk=64, interpret=True)
    assert float(relres) < 1e-5
    x_ref = np.linalg.solve(np.asarray(K), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-3, atol=2e-4)
    # iteration count agrees with the reference-semantics XLA PCG
    res = pcg(lambda v: K32 @ v, b32, tol=1e-5, maxits=300)
    assert abs(int(niter) - int(res.niter)) <= 3
