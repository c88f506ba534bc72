"""Fused dense Krylov kernels (interpret mode) vs the XLA solvers."""

import jax
import jax.numpy as jnp
import numpy as np

from nfft4gp_tpu.ops.kernels import KernelParams, kernel_matrix
from nfft4gp_tpu.solvers.lanczos import lanczos, rademacher_probes
from nfft4gp_tpu.solvers.pallas_pcg import fused_pcg_dense, fused_lanczos_dense


def _problem(n=300, seed=11):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    p = KernelParams.make(1.0, 0.5, 0.1, dtype=jnp.float32)
    K = kernel_matrix("gaussian", p, X)
    return K


def test_fused_lanczos_matches_xla():
    K = _problem()
    n = K.shape[0]
    maxits = 8
    nv = 4
    Z = np.asarray(rademacher_probes(jax.random.PRNGKey(3), nv, n, jnp.float32))
    Z = jnp.asarray(Z)

    alpha, beta, V, beta0 = fused_lanczos_dense(K, Z, maxits=maxits,
                                                interpret=True)
    assert alpha.shape == (nv, maxits) and V.shape == (nv, maxits + 1, n)

    mv = lambda v: jnp.matmul(K, v, precision="highest")
    for r in range(nv):
        ref = lanczos(mv, Z[r], maxits=maxits, tol=0.0)
        np.testing.assert_allclose(np.asarray(alpha[r]), np.asarray(ref.alpha),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(beta[r]), np.asarray(ref.beta),
                                   rtol=2e-4, atol=2e-4)
        # quadrature nodes/weights agree => logdet estimates agree
        T = np.diag(np.asarray(alpha[r])) + np.diag(np.asarray(beta[r]), 1) \
            + np.diag(np.asarray(beta[r]), -1)
        Tr = np.diag(np.asarray(ref.alpha)) + np.diag(np.asarray(ref.beta), 1) \
            + np.diag(np.asarray(ref.beta), -1)
        tq, vq = np.linalg.eigh(T)
        tr_, vr = np.linalg.eigh(Tr)
        est = np.sum(vq[0] ** 2 * np.log(np.abs(tq)))
        est_ref = np.sum(vr[0] ** 2 * np.log(np.abs(tr_)))
        np.testing.assert_allclose(est, est_ref, rtol=1e-4, atol=1e-5)

    # Lanczos solve parity: x = V' y with T y = beta0 e1
    r = 0
    T = np.diag(np.asarray(alpha[r])) + np.diag(np.asarray(beta[r]), 1) \
        + np.diag(np.asarray(beta[r]), -1)
    e1 = np.zeros(maxits); e1[0] = float(beta0[r])
    y = np.linalg.solve(T, e1)
    x = np.asarray(V[r][:maxits]).T @ y
    ref = lanczos(mv, Z[r], maxits=maxits, tol=0.0)
    np.testing.assert_allclose(x, np.asarray(ref.x), rtol=1e-3, atol=1e-3)
