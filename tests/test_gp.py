"""GP loss + gradient + prediction + Adam training.

Oracles: the exact dense NLL 0.5(y'K^{-1}y/n + logdet/n + log 2pi) and its
finite differences; with the Cholesky preconditioner (M = K) the SLQ terms
are exact, so loss/grad must match tightly (SURVEY.md §4/test strategy).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.models.gp import GPConfig, gp_loss, gp_predict, make_dense_ops
from nfft4gp_tpu.models.transforms import transform_forward, transform_inverse
from nfft4gp_tpu.models.adam import adam_run
from nfft4gp_tpu.ops.kernels import KernelParams, kernel_matrix
from nfft4gp_tpu.preconds.chol import chol_setup
from nfft4gp_tpu.preconds.nystrom import nystrom_setup
from nfft4gp_tpu.solvers.lanczos import rademacher_probes
from nfft4gp_tpu.utils.datasets import rand_perm, expand_perm


def exact_nll(raw, X, y, kind="gaussian", transform="softplus"):
    tv, _ = transform_forward(transform, raw)
    p = KernelParams(f=tv[0], l=tv[1], mu=tv[2])
    K = kernel_matrix(kind, p, X)
    n = y.shape[0]
    iKy = jnp.linalg.solve(K, y)
    _, ld = jnp.linalg.slogdet(K)
    return 0.5 * (jnp.vdot(y, iKy) / n + ld / n + math.log(2 * math.pi))


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(17)
    n = 100
    X = jnp.asarray(rng.uniform(size=(n, 1)))
    p_true = KernelParams.make(1.0, 0.3, 0.05)
    K = kernel_matrix("gaussian", p_true, X)
    L = jnp.linalg.cholesky(K)
    y = L @ jnp.asarray(rng.normal(size=(n,)))
    return X, y


def test_gp_loss_matches_exact_with_chol_precond(problem):
    X, y = problem
    n = y.shape[0]
    raw = jnp.asarray([0.5, -0.5, -2.0])
    cfg = GPConfig(kind="gaussian", maxits=30, nvecs=6, tol=1e-12)
    build = make_dense_ops("gaussian", X)

    def precond_setup(params):
        from nfft4gp_tpu.ops.kernels import kernel_matrix_with_grad

        K, dK = kernel_matrix_with_grad("gaussian", params, X)
        return chol_setup(K, dK=dK, require_grad=True)

    probes = rademacher_probes(jax.random.PRNGKey(0), 6, n)
    res = gp_loss(raw, y, build, probes, cfg, precond_setup)
    expect = float(exact_nll(raw, X, y))
    np.testing.assert_allclose(float(res.loss), expect, rtol=1e-8)

    # gradient vs finite differences of the exact NLL
    eps = 1e-5
    for j in range(3):
        hp = raw.at[j].add(eps)
        hm = raw.at[j].add(-eps)
        fd = (float(exact_nll(hp, X, y)) - float(exact_nll(hm, X, y))) / (2 * eps)
        np.testing.assert_allclose(float(res.grad[j]), fd, rtol=1e-4, atol=1e-7)


def test_gp_loss_nystrom_estimator_reasonable(problem):
    """With a low-rank preconditioner the SLQ estimate is stochastic; check
    it lands near the exact NLL (same ballpark as the reference's nvecs=10
    estimates)."""
    X, y = problem
    n = y.shape[0]
    raw = jnp.asarray([0.5, -0.5, -2.0])
    cfg = GPConfig(kind="gaussian", maxits=20, nvecs=20, tol=1e-10)
    build = make_dense_ops("gaussian", X)
    perm = expand_perm(rand_perm(jax.random.PRNGKey(2), n, 30), n)

    def precond_setup(params):
        return nystrom_setup("gaussian", params, X, perm, 30, require_grad=True)

    probes = rademacher_probes(jax.random.PRNGKey(1), 20, n)
    res = gp_loss(raw, y, build, probes, cfg, precond_setup)
    expect = float(exact_nll(raw, X, y))
    assert abs(float(res.loss) - expect) < 0.05 * max(1.0, abs(expect))


def test_gp_loss_jits(problem):
    X, y = problem
    n = y.shape[0]
    cfg = GPConfig(kind="gaussian", maxits=10, nvecs=4, tol=1e-10)
    build = make_dense_ops("gaussian", X)
    probes = rademacher_probes(jax.random.PRNGKey(0), 4, n)

    @jax.jit
    def loss_fn(raw):
        r = gp_loss(raw, y, build, probes, cfg, None)
        return r.loss, r.grad

    l1, g1 = loss_fn(jnp.asarray([0.5, -0.5, -2.0]))
    l2, g2 = loss_fn(jnp.asarray([0.4, -0.4, -1.9]))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert not np.allclose(float(l1), float(l2))


def test_adam_training_decreases_loss(problem):
    X, y = problem
    n = y.shape[0]
    cfg = GPConfig(kind="gaussian", maxits=20, nvecs=10, tol=1e-10)
    build = make_dense_ops("gaussian", X)

    def precond_setup(params):
        from nfft4gp_tpu.ops.kernels import kernel_matrix_with_grad

        K, dK = kernel_matrix_with_grad("gaussian", params, X)
        return chol_setup(K, dK=dK, require_grad=True)

    probes = rademacher_probes(jax.random.PRNGKey(3), 10, n)

    @jax.jit
    def loss_fn_jit(raw):
        r = gp_loss(raw, y, build, probes, cfg, precond_setup)
        return r.loss, r.grad

    x0 = transform_inverse("softplus", jnp.asarray([0.7, 0.6, 0.2]))
    state, losses, xs, grads = adam_run(
        lambda x: loss_fn_jit(x), x0, maxits=30, alpha=0.02
    )
    assert float(losses[-1]) < float(losses[0])
    # exact NLL also decreased
    assert float(exact_nll(xs[-1], X, y)) < float(exact_nll(x0, X, y))


def test_gp_predict_matches_exact(problem):
    X, y = problem
    rng = np.random.default_rng(23)
    Xt = jnp.asarray(rng.uniform(size=(30, 1)))
    raw = transform_inverse("softplus", jnp.asarray([1.0, 0.3, 0.05]))
    cfg = GPConfig(kind="gaussian", maxits=100, nvecs=4, tol=1e-12)
    res = gp_predict(raw, X, y, Xt, cfg, with_std=True)

    p = KernelParams.make(1.0, 0.3, 0.05)
    K11 = kernel_matrix("gaussian", p, X)
    K12 = kernel_matrix("gaussian", p, X, Xt)
    iKy = jnp.linalg.solve(K11, y)
    mean_ref = K12.T @ iKy
    np.testing.assert_allclose(np.asarray(res.mean), np.asarray(mean_ref),
                               rtol=1e-6, atol=1e-8)
    # std: K22 diag (with noise) minus quadratic form
    f2 = 1.0
    K22d = f2 * (1.0 + 0.05) * np.ones(30)
    quad = np.asarray(jnp.sum(K12 * jnp.linalg.solve(K11, K12), axis=0))
    std_ref = np.sqrt(np.abs(K22d - quad))
    np.testing.assert_allclose(np.asarray(res.std), std_ref, rtol=1e-5, atol=1e-7)


def test_transforms_roundtrip():
    for kind in ["softplus", "exp", "identity", "sigmoid"]:
        v = jnp.asarray([0.5, 1.5, 0.01] if kind != "sigmoid" else [0.3, 0.6, 0.9])
        raw = transform_inverse(kind, v)
        fwd, dfwd = transform_forward(kind, raw)
        np.testing.assert_allclose(np.asarray(fwd), np.asarray(v), rtol=1e-9)
        # derivative by finite difference
        eps = 1e-6
        fd = (transform_forward(kind, raw + eps)[0] - transform_forward(kind, raw - eps)[0]) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dfwd), np.asarray(fd), rtol=1e-5)
