"""High-level GPProblem API + fastsum predict parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.models.problem import GPProblem
from nfft4gp_tpu.models.gp import GPConfig, gp_predict, gp_predict_fastsum
from nfft4gp_tpu.models.transforms import transform_inverse
from nfft4gp_tpu.ops.kernels import make_windows


@pytest.fixture(scope="module")
def synth():
    rng = np.random.default_rng(5)
    n = 80
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(X[:, 0])) + 0.1 * rng.normal(size=n))
    Xt = jnp.asarray(rng.uniform(size=(15, 2)))
    return X, y, Xt


@pytest.mark.parametrize("precond", ["none", "chol", "nystrom", "fsai", "afn"])
def test_problem_fit_predict_all_preconds(synth, precond):
    X, y, Xt = synth
    prob = GPProblem(
        kernel="gaussian", operator="dense", precond=precond, rank=20, lfil=6,
        maxits=10, nvecs=6,
    )
    prob.fit(X, y, adam_maxits=5, adam_alpha=0.05)
    assert prob.loss_history_[-1] <= prob.loss_history_[0] + 1e-6
    mean = prob.predict(X, y, Xt)
    assert mean.shape == (15,)
    assert bool(jnp.isfinite(mean).all())


def test_problem_additive_fastsum(synth):
    X, y, Xt = synth
    prob = GPProblem(
        kernel="gaussian", windows=[[0], [1]], operator="fastsum",
        precond="nystrom", rank=20, maxits=10, nvecs=6, fastsum_N=32,
    )
    prob.fit(X, y, adam_maxits=3, adam_alpha=0.05)
    mean, std = prob.predict(X, y, Xt, with_std=True)
    assert bool(jnp.isfinite(mean).all()) and bool(jnp.isfinite(std).all())
    assert (np.asarray(std) > 0).all()


def test_fastsum_predict_matches_dense(synth):
    X, y, Xt = synth
    raw = transform_inverse("softplus", jnp.asarray([1.0, 0.4, 0.1]))
    windows = make_windows([[0], [1]])
    cfg = GPConfig(kind="gaussian", maxits=40, tol=1e-10)
    dense = gp_predict(raw, X, y, Xt, cfg, windows=windows, with_std=True, maxits=80)
    fast = gp_predict_fastsum(
        raw, X, y, Xt, cfg, windows=windows, fastsum_N=64, with_std=True, maxits=80
    )
    np.testing.assert_allclose(
        np.asarray(fast.mean), np.asarray(dense.mean), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(fast.std), np.asarray(dense.std), rtol=2e-2, atol=2e-3
    )


def test_problem_stream_engine_matches_table():
    """fastsum_engine='stream' loss == 'table' loss (interpret-mode Pallas)."""
    rng = np.random.default_rng(23)
    n = 96
    X = jnp.asarray(rng.uniform(size=(n, 4)), jnp.float32)
    y = jnp.asarray(
        np.sin(3 * np.asarray(X[:, 0])) + 0.1 * rng.normal(size=n), jnp.float32
    )
    kw = dict(
        kernel="gaussian", windows=[[0, 1], [2, 3]], operator="fastsum",
        precond="nystrom", rank=16, maxits=6, nvecs=4, fastsum_N=16,
        fastsum_table_dtype=None, seed=3,
    )
    lt = GPProblem(fastsum_engine="table", **kw).make_loss(X, y)
    ls = GPProblem(fastsum_engine="stream", **kw).make_loss(X, y)
    raw = transform_inverse("softplus", jnp.asarray([1.0, 0.5, 0.1], jnp.float32))
    loss_t, grad_t = lt(raw)
    loss_s, grad_s = ls(raw)
    assert bool(jnp.isfinite(loss_s))
    # same probes; engines differ by the edge-trimmed Nyquist mode
    # (1 of 16 folded modes per dim at N=16 -> ~1e-2 relative)
    np.testing.assert_allclose(float(loss_s), float(loss_t), rtol=4e-2)
    np.testing.assert_allclose(
        np.asarray(grad_s), np.asarray(grad_t), rtol=2e-1, atol=2e-2
    )
