"""Round-4 primitives: batched ELL ops, compensated/true-residual solver
modes, host-loop KNN, and near-field pattern symmetrization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.ops.matops import (
    ell_matvec,
    ell_matvec_batch,
    ell_rmatvec,
    ell_rmatvec_batch,
    ell_transpose_pattern,
    ell_rmatvec_t,
)
from nfft4gp_tpu.ops.knn import knn_pattern, knn_pattern_hostloop
from nfft4gp_tpu.ops.kernels import KernelParams, kernel_matrix
from nfft4gp_tpu.solvers.pcg import pcg
from nfft4gp_tpu.solvers.fgmres import fgmres


@pytest.fixture(scope="module")
def ell():
    rng = np.random.default_rng(7)
    n, lfil = 300, 6
    idx = np.zeros((n, lfil), np.int32)
    mask = np.zeros((n, lfil), bool)
    for i in range(n):
        prev = np.sort(rng.choice(i, size=min(i, lfil - 1), replace=False)) if i else []
        idx[i, : len(prev)] = prev
        mask[i, : len(prev)] = True
        idx[i, -1] = i
        mask[i, -1] = True
    val = np.where(mask, rng.normal(size=(n, lfil)), 0.0)
    return jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(val)


def test_ell_batched_ops_match_loops(ell):
    idx, mask, val = ell
    rng = np.random.default_rng(1)
    Xb = jnp.asarray(rng.normal(size=(5, idx.shape[0])))
    fwd_loop = jnp.stack([ell_matvec(idx, val, x) for x in Xb])
    np.testing.assert_allclose(
        np.asarray(ell_matvec_batch(idx, val, Xb)), np.asarray(fwd_loop), rtol=1e-12
    )
    tr_loop = jnp.stack([ell_rmatvec(idx, val, x) for x in Xb])
    np.testing.assert_allclose(
        np.asarray(ell_rmatvec_batch(idx, val, Xb)), np.asarray(tr_loop), rtol=1e-12
    )


def test_ell_transpose_pattern_matches_scatter(ell):
    idx, mask, val = ell
    x = jnp.asarray(np.random.default_rng(2).normal(size=(idx.shape[0],)))
    tr, ts, tm = ell_transpose_pattern(idx, mask)
    np.testing.assert_allclose(
        np.asarray(ell_rmatvec_t(jnp.asarray(tr), jnp.asarray(ts), jnp.asarray(tm), val, x)),
        np.asarray(ell_rmatvec(idx, val, x)),
        rtol=1e-12,
    )


def test_knn_hostloop_matches_single_jit():
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.uniform(size=(700, 3)))
    i1, m1 = knn_pattern(X, 6)
    i2, m2 = knn_pattern_hostloop(X, 6, row_chunk=256)
    assert np.array_equal(np.asarray(i1), i2)
    assert np.array_equal(np.asarray(m1), m2)


@pytest.fixture(scope="module")
def spd_problem():
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.uniform(size=(200, 2)))
    p = KernelParams.make(1.0, 0.3, 0.05)
    K = kernel_matrix("gaussian", p, X)
    b = jnp.asarray(rng.normal(size=(200,)))
    return K, b


def test_fgmres_compensated_converges(spd_problem):
    K, b = spd_problem
    x_ref = jnp.linalg.solve(K, b)
    res = fgmres(lambda v: K @ v, b, kdim=60, maxits=120, tol=1e-10,
                 compensated=True)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-8)


def test_fgmres_true_residual_gate(spd_problem):
    """The restart loop's reported relres is a TRUE residual."""
    K, b = spd_problem
    res = fgmres(lambda v: K @ v, b, kdim=20, maxits=100, tol=1e-8)
    true_rel = float(jnp.linalg.norm(b - K @ res.x) / jnp.linalg.norm(b))
    assert abs(true_rel - float(res.relres)) < 1e-9 + 0.5 * true_rel


def test_pcg_residual_replacement(spd_problem):
    K, b = spd_problem
    res = pcg(lambda v: K @ v, b, tol=1e-9, maxits=300, replace_every=20)
    assert bool(res.converged)
    true_rel = float(jnp.linalg.norm(b - K @ res.x) / jnp.linalg.norm(b))
    assert true_rel < 5e-9


def test_symmetrized_nearfield_pattern_equivalence():
    from nfft4gp_tpu.ops import fastsum as fs

    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.uniform(size=(400, 2)))
    v = jnp.asarray(rng.normal(size=(400,)))
    p = KernelParams.make(1.0, 0.3, 0.1)
    g = fs.fastsum_geometry(X, N=16)
    pat = fs.nearfield_patterns("matern12", g, 8)
    pl1 = fs.fastsum_coeffs("matern12", p, g, nf_pattern=pat)
    pat_s = fs.nearfield_patterns("matern12", g, 8, sym=True)
    pl2 = fs.fastsum_coeffs("matern12", p, g, nf_pattern=pat_s)
    assert pl2.nf_sym
    np.testing.assert_allclose(
        np.asarray(fs.fastsum_matvec(pl1, v)),
        np.asarray(fs.fastsum_matvec(pl2, v)),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(fs.fastsum_grad_matvec(pl1, v)),
        np.asarray(fs.fastsum_grad_matvec(pl2, v)),
        rtol=1e-10, atol=1e-12,
    )
