"""TEST2/TEST3-style end-to-end cross-validation: exact dense vs Fourier path.

The reference commits golden files from its exact-vs-NFFT GP training runs
(TESTS/TEST2: n=800/d=1 synthetic, Gaussian; SURVEY.md §4).  C rand() streams
are not reproducible here, so the parity check is the one the goldens encode:
the exact and Fourier-accelerated paths, trained identically, agree on loss
trajectories and predictions to the fastsum accuracy level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.models.gp import GPConfig, gp_loss, gp_predict, make_dense_ops
from nfft4gp_tpu.models.transforms import transform_inverse, transform_forward
from nfft4gp_tpu.models.adam import adam_run
from nfft4gp_tpu.ops.kernels import KernelParams, kernel_matrix, make_windows
from nfft4gp_tpu.ops.fastsum import (
    additive_fastsum_geometry,
    additive_fastsum_coeffs,
    additive_fastsum_matvec,
    additive_fastsum_grad_matvec,
)
from nfft4gp_tpu.preconds.nystrom import nystrom_setup
from nfft4gp_tpu.solvers.lanczos import rademacher_probes
from nfft4gp_tpu.utils.datasets import expand_perm, rand_perm


@pytest.fixture(scope="module")
def synth():
    """TEST2-like 1-D synthetic: y = f(x) + noise."""
    rng = np.random.default_rng(906)
    n, n_test = 80, 20
    X = jnp.asarray(np.sort(rng.uniform(size=(n, 1)), axis=0))
    Xt = jnp.asarray(rng.uniform(size=(n_test, 1)))
    f = lambda x: np.sin(8 * x[:, 0]) + 0.5 * x[:, 0]
    y = jnp.asarray(f(np.asarray(X)) + 0.05 * rng.normal(size=n))
    yt = jnp.asarray(f(np.asarray(Xt)))
    return X, y, Xt, yt


def _make_fastsum_ops(X, windows):
    geom = additive_fastsum_geometry(X, windows, N=64)

    def build(params):
        plan = additive_fastsum_coeffs("gaussian", params, geom)
        return (
            lambda v: additive_fastsum_matvec(plan, v),
            lambda v: additive_fastsum_grad_matvec(plan, v),
        )

    return build


def test_exact_vs_fastsum_training_parity(synth):
    X, y, Xt, yt = synth
    n = X.shape[0]
    windows = make_windows([[0]])
    cfg = GPConfig(kind="gaussian", maxits=25, nvecs=10, tol=1e-10)
    probes = rademacher_probes(jax.random.PRNGKey(222), 10, n)
    perm = expand_perm(rand_perm(jax.random.PRNGKey(807), n, 30), n)

    build_exact = make_dense_ops("gaussian", X, windows=windows)
    build_fast = _make_fastsum_ops(X, windows)

    def precond_setup(params):
        return nystrom_setup(
            "gaussian", params, X, perm, 30, require_grad=True, windows=windows
        )

    def loss_exact(raw):
        r = gp_loss(raw, y, build_exact, probes, cfg, precond_setup)
        return r.loss, r.grad

    def loss_fast(raw):
        r = gp_loss(raw, y, build_fast, probes, cfg, precond_setup)
        return r.loss, r.grad

    x0 = transform_inverse("softplus", jnp.asarray([1.0, 0.3, 0.1]))

    # same probes, same start: per-iteration losses must track to fastsum
    # accuracy (the TEST2 "loss history" golden)
    _, losses_e, xs_e, _ = adam_run(jax.jit(loss_exact), x0, maxits=20, alpha=0.05)
    _, losses_f, xs_f, _ = adam_run(jax.jit(loss_fast), x0, maxits=20, alpha=0.05)
    le = np.asarray([float(v) for v in losses_e])
    lf = np.asarray([float(v) for v in losses_f])
    np.testing.assert_allclose(lf, le, rtol=2e-3, atol=2e-3)
    # training decreased the loss
    assert le[-1] < le[0]

    # predictions from the two trained models agree (the TEST2 prediction
    # golden) and actually fit the test function
    cfgp = GPConfig(kind="gaussian", maxits=100, nvecs=10, tol=1e-10)
    pred_e = gp_predict(xs_e[-1], X, y, Xt, cfgp, windows=windows)
    pred_f = gp_predict(xs_f[-1], X, y, Xt, cfgp, windows=windows)
    np.testing.assert_allclose(
        np.asarray(pred_f.mean), np.asarray(pred_e.mean), rtol=5e-3, atol=5e-3
    )
    rmse = float(jnp.sqrt(jnp.mean((pred_e.mean - yt) ** 2)))
    assert rmse < 0.2, f"RMSE too high: {rmse}"


def test_additive_three_way_consistency(synth):
    """TEST3 analog: exact full kernel vs exact additive vs fastsum additive
    on a d=2 problem where the window covers all features."""
    rng = np.random.default_rng(3)
    n = 60
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.0, 0.3, 0.05)
    y = jnp.asarray(rng.normal(size=(n,)))

    windows = make_windows([[0, 1]])
    K_full = kernel_matrix("gaussian", p, X)
    from nfft4gp_tpu.ops.kernels import additive_kernel_matrix

    K_add = additive_kernel_matrix("gaussian", p, X, windows)
    # single window spanning all features == full kernel
    np.testing.assert_allclose(np.asarray(K_add), np.asarray(K_full), rtol=1e-12)

    geom = additive_fastsum_geometry(X, windows, N=64)
    plan = additive_fastsum_coeffs("gaussian", p, geom)
    y1 = additive_fastsum_matvec(plan, y)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(K_full @ y), rtol=1e-5, atol=1e-5)
