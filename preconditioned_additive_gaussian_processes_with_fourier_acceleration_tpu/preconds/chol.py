"""Dense Cholesky preconditioner / exact solver.

TPU-native rebuild of SRC/preconds/chol.c:
- setup: K (+ stacked dK), stabilization shift nu = sqrt(n)*ulp(||K||_F)
  (chol.c:448-464), cholesky; gradient mode precomputes GdKG = L^{-1} dK L^{-T}
  (chol.c:512-523)
- solve: two triangular solves (chol.c:111-137)
- logdet = 2 sum log diag L (chol.c:293-323)
- trace_j = tr(K^{-1} dK_j) = tr(GdKG_j)
- dvp: z -> M^{-1} dK_j z (chol.c:138-292)
"""

from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from ..ops.matops import stable_chol, chol_solve
from ..ops.kernels import kernel_matrix, kernel_matrix_with_grad, KernelParams


@pytree_dataclass
class CholPrecond:
    L: jnp.ndarray                 # (n, n) lower cholesky factor of K + nu I
    dK: Optional[jnp.ndarray]      # (3, n, n) or None
    nu: jnp.ndarray

    def solve(self, r):
        return chol_solve(self.L, r)

    def logdet(self):
        return 2.0 * jnp.sum(jnp.log(jnp.diag(self.L)))

    def trace(self):
        # tr(K^{-1} dK_j) = tr(GdKG_j), one batched cholesky solve over j
        iKdK = jax.vmap(lambda M: chol_solve(self.L, M))(self.dK)  # (3, n, n)
        return jnp.trace(iKdK, axis1=1, axis2=2)

    def dvp(self, z):
        dKz = jnp.einsum("knm,m->kn", self.dK, z)
        return chol_solve(self.L, dKz.T).T


def chol_setup(K=None, *, kind=None, params: KernelParams = None, X=None,
               require_grad: bool = False, dK=None) -> CholPrecond:
    """Build from an explicit K (+dK) or from (kind, params, X)."""
    if K is None:
        if require_grad:
            K, dK = kernel_matrix_with_grad(kind, params, X)
        else:
            K = kernel_matrix(kind, params, X)
    L, nu = stable_chol(K)
    return CholPrecond(L=L, dK=dK if require_grad or dK is not None else None, nu=nu)
