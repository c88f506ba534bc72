"""Kernel-matrix correctness: formulas, analytic gradients, additive windows.

Oracle: direct numpy evaluation of the documented formulas
(ref SRC/linearalg/kernels.c, SURVEY.md §2.4) + finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nfft4gp_tpu as ng
from nfft4gp_tpu.ops.kernels import (
    kernel_matrix,
    kernel_matrix_with_grad,
    additive_kernel_matrix,
    additive_kernel_matrix_with_grad,
    make_windows,
    KernelParams,
)

KINDS = ["gaussian", "matern32", "matern12"]


def _np_kernel(kind, f, l, mu, X, Y=None):
    same = Y is None
    Y = X if Y is None else Y
    d2 = ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    r = np.sqrt(d2)
    if kind == "gaussian":
        k = np.exp(-d2 / (2 * l * l))
    elif kind == "matern32":
        k = (1 + np.sqrt(3) * r / l) * np.exp(-np.sqrt(3) * r / l)
    else:
        k = np.exp(-r / l)
    K = f * f * k
    if same:
        K = K + f * f * mu * np.eye(X.shape[0])
    return K


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(40, 3))
    Y = rng.uniform(size=(25, 3))
    return X, Y


@pytest.mark.parametrize("kind", KINDS)
def test_kernel_matrix_matches_formula(kind, data):
    X, Y = data
    f, l, mu = 1.3, 0.6, 0.07
    p = KernelParams.make(f, l, mu)
    # GEMM-trick distances lose ~sqrt(eps) near r=0, so Matérn kernels
    # (functions of r, not r^2) see amplified roundoff there
    tol = dict(rtol=1e-7, atol=1e-7)
    K = kernel_matrix(kind, p, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(K), _np_kernel(kind, f, l, mu, X), **tol)
    # cross block: no noise
    K12 = kernel_matrix(kind, p, jnp.asarray(X), jnp.asarray(Y))
    np.testing.assert_allclose(
        np.asarray(K12), _np_kernel(kind, f, l, mu, X, Y), **tol
    )


@pytest.mark.parametrize("kind", KINDS)
def test_kernel_gradients_finite_difference(kind, data):
    X, _ = data
    f, l, mu = 1.3, 0.6, 0.07
    p = KernelParams.make(f, l, mu)
    K, dK = kernel_matrix_with_grad(kind, p, jnp.asarray(X))
    np.testing.assert_allclose(
        np.asarray(K), _np_kernel(kind, f, l, mu, X), rtol=1e-7, atol=1e-7
    )

    eps = 1e-6
    for j, (df, dl, dmu) in enumerate([(eps, 0, 0), (0, eps, 0), (0, 0, eps)]):
        Kp = _np_kernel(kind, f + df, l + dl, mu + dmu, X)
        Km = _np_kernel(kind, f - df, l - dl, mu - dmu, X)
        fd = (Kp - Km) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dK[j]), fd, rtol=2e-5, atol=2e-7)


def test_additive_kernel(data):
    X, _ = data
    f, l, mu = 1.1, 0.8, 0.03
    p = KernelParams.make(f, l, mu)
    windows = make_windows([[0], [1, 2]])
    K = additive_kernel_matrix("gaussian", p, jnp.asarray(X), windows)
    K0 = _np_kernel("gaussian", f, l, 0.0, X[:, [0]])
    K1 = _np_kernel("gaussian", f, l, 0.0, X[:, [1, 2]])
    expect = 0.5 * (K0 + K1) + f * f * mu * np.eye(X.shape[0])
    np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-12)


def test_additive_kernel_gradients(data):
    X, _ = data
    p = KernelParams.make(1.1, 0.8, 0.03)
    windows = make_windows([[0], [1, 2]])
    K, dK = additive_kernel_matrix_with_grad("matern12", p, jnp.asarray(X), windows)

    eps = 1e-6

    def build(f, l, mu):
        pp = KernelParams.make(f, l, mu)
        return np.asarray(additive_kernel_matrix("matern12", pp, jnp.asarray(X), windows))

    vals = [1.1, 0.8, 0.03]
    for j in range(3):
        hi = list(vals)
        lo = list(vals)
        hi[j] += eps
        lo[j] -= eps
        fd = (build(*hi) - build(*lo)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dK[j]), fd, rtol=2e-5, atol=1e-8)


def test_padded_window_matches_unpadded(data):
    X, _ = data
    p = KernelParams.make(1.0, 0.5, 0.01)
    w_padded = make_windows([[0, 1], [2]])        # second window padded to 2
    assert w_padded.shape == (2, 2)
    K = additive_kernel_matrix("gaussian", p, jnp.asarray(X), w_padded)
    K0 = _np_kernel("gaussian", 1.0, 0.5, 0.0, X[:, [0, 1]])
    K1 = _np_kernel("gaussian", 1.0, 0.5, 0.0, X[:, [2]])
    expect = 0.5 * (K0 + K1) + 0.01 * np.eye(X.shape[0])
    np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-12)
