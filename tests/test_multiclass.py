"""Exact multi-class GP: loss/grad finite differences + classification."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.models.multiclass import (
    exact_class_gp_loss,
    exact_class_gp_predict,
    fixed_noise_kernel,
)
from nfft4gp_tpu.models.adam import adam_run
from nfft4gp_tpu.models.transforms import transform_inverse


@pytest.fixture(scope="module")
def clsdata():
    rng = np.random.default_rng(91)
    n, C = 60, 3
    centers = np.asarray([[0.0, 0.0], [1.5, 0.0], [0.0, 1.5]])
    labels = rng.integers(0, C, size=n)
    X = jnp.asarray(centers[labels] + 0.3 * rng.normal(size=(n, 2)))
    Ys = jnp.asarray(np.eye(C)[labels] * 2.0 - 1.0)  # +-1 one-vs-all targets
    mu2 = jnp.asarray(0.01 * np.ones((n, C)))
    return X, Ys, mu2, labels


def test_fixed_noise_kernel_formula(clsdata):
    X, Ys, mu2, labels = clsdata
    f, l, mu = 1.2, 0.7, 0.05
    K = fixed_noise_kernel("gaussian", f, l, mu, mu2[:, 0], X)
    d2 = np.asarray(
        ((np.asarray(X)[:, None, :] - np.asarray(X)[None, :, :]) ** 2).sum(-1)
    )
    expect = f * f * np.exp(-d2 / (2 * l * l)) + mu * np.eye(X.shape[0]) + np.diag(
        np.asarray(mu2[:, 0])
    )
    np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-10, atol=1e-12)


def test_class_loss_gradient_finite_difference(clsdata):
    X, Ys, mu2, labels = clsdata
    C = Ys.shape[1]
    raw = jnp.asarray(np.linspace(0.2, 0.8, 3 * C))
    res = exact_class_gp_loss(raw, X, Ys, mu2)
    eps = 1e-6
    for j in [0, 2, 4, 7]:
        hp = raw.at[j].add(eps)
        hm = raw.at[j].add(-eps)
        fd = (
            float(exact_class_gp_loss(hp, X, Ys, mu2).loss)
            - float(exact_class_gp_loss(hm, X, Ys, mu2).loss)
        ) / (2 * eps)
        np.testing.assert_allclose(float(res.grad[j]), fd, rtol=1e-4, atol=1e-8)


def test_classification_end_to_end(clsdata):
    X, Ys, mu2, labels = clsdata
    C = Ys.shape[1]
    x0 = transform_inverse("softplus", jnp.asarray([1.0] * C + [0.5] * C + [0.1] * C))

    @jax.jit
    def loss_fn(raw):
        r = exact_class_gp_loss(raw, X, Ys, mu2)
        return r.loss, r.grad

    state, losses, xs, _ = adam_run(loss_fn, x0, maxits=40, alpha=0.05)
    assert float(losses[-1]) < float(losses[0])

    pred = exact_class_gp_predict(state.x, X, Ys, mu2, X, with_std=True)
    acc = float(jnp.mean((pred.labels == jnp.asarray(labels)).astype(jnp.float32)))
    assert acc > 0.9, f"train accuracy {acc}"
    assert pred.std.shape == Ys.shape and bool(jnp.isfinite(pred.std).all())
