"""Stabilized Nyström low-rank preconditioner ("RAN" in the MATLAB prototype).

TPU-native rebuild of SRC/preconds/nys.c:
- setup (nys.c:518-660): with landmark permutation perm (first k entries are
  landmarks) build the noise-free column block K1 = K(:, perm[:k]) and its
  top block K11; stable cholesky L of K11; factor Uf = K1 L^{-T}; thin SVD
  Uf = U diag(sigma) V'; s_i = 1/(sigma_i^2 + eta), eta = mu f^2
- solve (nys.c:115-173): M^{-1} r = U S U' r + (r - U U' r)/eta

Unlike the reference, the factors are stored in ORIGINAL row order: the
C code permutes so the landmark block is contiguous (nys.c permute/
unpermute wrappers around every apply), but the preconditioner operator
itself is permutation-invariant, so building K1 = K(X, X_landmarks)
directly drops one gather + one scatter from EVERY solve/dvp call — the
applies become pure GEMMs (and gather lowering on the tunneled TPU
backend has pathological compile times, see kernels._window_slice).
Only the k-row landmark selection gathers, once, at setup.
- logdet (nys.c:489-516): (n-k) log eta + sum log(sigma_i^2 + eta)
- dvp (nys.c:175-331): y_j = M^{-1} dM_j x with
    dM_j = dK1_j K11^{-1} K1' + K1 K11^{-1} dK1_j' - K1 K11^{-1} dK11_j K11^{-1} K1'
  for j in {f, l} and dM_mu = f^2 I (the reference omits the d(eta)/df term,
  mirrored here for parity)
- trace (nys.c:332-488): tr(M^{-1} dM_j) via Woodbury:
    (tr(dM_j) - tr(Uf (eta I + Uf'Uf)^{-1} Uf' dM_j)) / eta

The SVD of the tall factor runs as QR -> small SVD friendly shapes via XLA;
all applications are (n x k) GEMMs on the MXU.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from ..ops.matops import stable_chol, chol_solve, tril_solve, triu_solve
from ..ops.kernels import kernel_matrix, kernel_matrix_with_grad, KernelParams


@pytree_dataclass
class NystromPrecond:
    perm: jnp.ndarray          # (k,) landmark indices (setup stores perm[:k])
    U: jnp.ndarray             # (n, k) left singular vectors of Uf (ORIGINAL row order)
    s: jnp.ndarray             # (k,) 1 / (sigma^2 + eta)
    sigma2: jnp.ndarray        # (k,) sigma^2
    eta: jnp.ndarray           # mu * f^2
    f2: jnp.ndarray            # f^2
    # gradient-mode extras (None without require_grad)
    Uf: Optional[jnp.ndarray]      # (n, k) pre-SVD factor K1 L^{-T}
    L11: Optional[jnp.ndarray]     # (k, k) chol of K11
    K1: Optional[jnp.ndarray]      # (n, k) noise-free column block
    dK1: Optional[jnp.ndarray]     # (2, n, k) df, dl blocks (noise-free)
    dK11: Optional[jnp.ndarray]    # (2, k, k)

    @property
    def k(self):
        return self.U.shape[1]

    @property
    def n(self):
        return self.U.shape[0]

    def solve(self, r):
        # fused form M^{-1} r = r/eta + U ((s - 1/eta) (U' r)): one fewer
        # U-product than the reference's sequence (nys.c:142-158), and at
        # highest matmul precision — the 1/eta factor amplifies projector
        # error, so bf16-precision GEMMs here destroy PCG convergence.
        # No permutation: U rows are in original order (module docstring).
        z = jnp.matmul(self.U.T, r, precision="highest")
        return r / self.eta + jnp.matmul(
            self.U, (self.s - 1.0 / self.eta) * z, precision="highest"
        )

    def logdet(self):
        return (self.n - self.k) * jnp.log(self.eta) + jnp.sum(
            jnp.log(self.sigma2 + self.eta)
        )

    def _dM_apply(self, j, x):
        """dM_j @ x, x (n,) or (n, m); j in {0, 1} (original row order)."""
        hm = lambda a, b: jnp.matmul(a, b, precision="highest")
        K1tx = hm(self.K1.T, x)
        w = chol_solve(self.L11, K1tx)          # K11^{-1} K1' x
        dK1tx = hm(self.dK1[j].T, x)
        wd = chol_solve(self.L11, dK1tx)        # K11^{-1} dK1' x
        inner = chol_solve(self.L11, hm(self.dK11[j], w))
        return hm(self.dK1[j], w) + hm(self.K1, wd) - hm(self.K1, inner)

    def dvp(self, z):
        """(3, n) stacked M^{-1} dM_j z — ref nys.c:175-331."""
        outs = [self.solve(self._dM_apply(j, z)) for j in range(2)]
        y2 = self.f2 * self.solve(z)
        return jnp.stack(outs + [y2])

    def trace(self):
        """(3,) tr(M^{-1} dM_j) via Woodbury — ref nys.c:332-488."""
        k = self.k
        UfU = jnp.matmul(self.Uf.T, self.Uf, precision="highest") + self.eta * jnp.eye(k, dtype=self.Uf.dtype)
        Lw = jnp.linalg.cholesky(UfU)
        W = chol_solve(Lw, self.Uf.T).T        # (n, k): Uf (eta I + Uf'Uf)^{-1}

        traces = []
        for j in range(2):
            # tr(dM_j) = 2 <dK1 L^{-T}, Uf> - <Uf GdKG_j, Uf>
            A1 = tril_solve(self.L11, self.dK1[j].T).T       # dK1 L^{-T}
            GdKG = tril_solve(self.L11, tril_solve(self.L11, self.dK11[j]).T).T
            t_raw = 2.0 * jnp.sum(A1 * self.Uf) - jnp.sum((self.Uf @ GdKG) * self.Uf)
            corr = jnp.sum(self._dM_apply(j, self.Uf) * W)
            traces.append((t_raw - corr) / self.eta)
        t2 = (self.n * self.f2 - self.f2 * jnp.sum(self.Uf * W)) / self.eta
        traces.append(t2)
        return jnp.stack(traces)


def nystrom_setup(
    kind: str,
    params: KernelParams,
    X,
    perm,
    k: int,
    *,
    require_grad: bool = False,
    windows=None,
) -> NystromPrecond:
    """Build the Nyström preconditioner from kernel + landmark indices.

    perm: landmark indices — any array with >= k entries whose FIRST k are
    the landmark rows (a bare (k,) index set, or a full (n,) permutation;
    only perm[:k] is read and stored).  Random in the library tests — ref
    TEST4/foo.cpp:263-266 — or FPS in AFN.
    """
    from ..ops.kernels import additive_kernel_matrix, additive_kernel_matrix_with_grad

    # setup runs entirely at highest matmul precision: the factors feed
    # 1/eta-amplified solves where bf16-precision products are fatal
    with jax.default_matmul_precision("highest"):
        return _nystrom_setup_impl(
            kind, params, X, perm, k, require_grad, windows,
            additive_kernel_matrix, additive_kernel_matrix_with_grad,
        )


def _nystrom_setup_impl(kind, params, X, perm, k, require_grad, windows,
                        additive_kernel_matrix, additive_kernel_matrix_with_grad):
    n = X.shape[0]
    perm = jnp.asarray(perm)
    # the ONLY gather: k landmark rows.  Everything downstream stays in
    # original row order (module docstring).
    Xk = X[perm[:k]]
    noise_free = KernelParams(f=params.f, l=params.l, mu=jnp.zeros_like(params.mu))

    if windows is None:
        build = lambda p, A, B: kernel_matrix(kind, p, A, B)
        build_g = lambda p, A, B: kernel_matrix_with_grad(kind, p, A, B)
    else:
        build = lambda p, A, B: additive_kernel_matrix(kind, p, A, windows, B)
        build_g = lambda p, A, B: additive_kernel_matrix_with_grad(kind, p, A, windows, B)

    if require_grad:
        K1, dK1_full = build_g(noise_free, X, Xk)    # rectangular: no noise
        dK1 = dK1_full[:2]
        K11t, dK11_full = build_g(noise_free, Xk, Xk)
        K11 = K11t
        dK11 = dK11_full[:2]
    else:
        K1 = build(noise_free, X, Xk)
        K11 = build(noise_free, Xk, Xk)
        dK1 = None
        dK11 = None

    L11, nu = stable_chol(K11)
    Uf = tril_solve(L11, K1.T).T                   # K1 L^{-T} = (L^{-1} K1')', (n, k)
    # thin SVD via the k x k Gram eigendecomposition is distributed-friendly,
    # but XLA's gesvd on (n, k) is fine at these ranks:
    U, sigma, _ = jnp.linalg.svd(Uf, full_matrices=False)
    sigma2 = sigma * sigma
    eta = params.mu * params.f * params.f
    s = 1.0 / (sigma2 + eta)

    return NystromPrecond(
        perm=perm[:k],
        U=U,
        s=s,
        sigma2=sigma2,
        eta=eta,
        f2=params.f * params.f,
        Uf=Uf if require_grad else None,
        L11=L11 if require_grad else None,
        K1=K1 if require_grad else None,
        dK1=dK1,
        dK11=dK11,
    )
