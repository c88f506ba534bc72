"""Does the AFN/FSAI pattern need full-d KNN, or does a 2-D-projection
pattern (stencil-compatible on TPU) precondition equally well?

f64 CPU, dense additive operator, forced AFN: compare PCG iteration counts
with (a) full-d KNN pattern, (b) KNN in the 2-PC PCA projection, (c) KNN in
the first window's 2-D coordinates.  If (b)/(c) match (a), the Schur FSAI
pattern can be chosen cell-local in a 2-D projection at ANY ambient d and
the apply becomes the gather-free stencil contraction (ops/cellgrid.py).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
    KernelParams, make_windows, additive_kernel_matrix,
)
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.knn import knn_pattern
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fps import fps
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.preconds.afn import (
    AfnPlan, afn_setup_from_plan,
)
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.pcg import pcg
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.utils.datasets import expand_perm

n, d, rank, lfil = 4000, 10, 200, 16
kernel = sys.argv[1] if len(sys.argv) > 1 else "gaussian"
l = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float64)
b = jnp.asarray(rng.normal(size=(n,)), jnp.float64)
params = KernelParams.make(1.0, l, 0.01, dtype=jnp.float64)
windows = make_windows([[i, i + 1] for i in range(0, d, 2)])

K = additive_kernel_matrix(kernel, params, X, windows)
mv = lambda v: jnp.matmul(K, v, precision="highest")

perm_k = fps(X, rank).perm
perm_a = np.asarray(expand_perm(perm_k, n))
X2 = np.asarray(X)[perm_a[rank:]]

def run(name, proj):
    Xp = X2 @ proj if proj is not None else X2
    idx, mask = knn_pattern(jnp.asarray(Xp), lfil)
    plan = AfnPlan(perm=jnp.asarray(perm_a), k=rank, use_ran=False,
                   pattern=(idx, mask))
    pre = afn_setup_from_plan(kernel, params, X, plan, windows=windows)
    res = pcg(mv, b, precond=pre.solve, tol=1e-6, maxits=300)
    hist = np.asarray(res.res_history)
    hit = np.where(hist <= 1e-6)[0]
    print(f"{name:22s} iters_to_1e-6 {hit[0] if hit.size else '>300':>5} "
          f"final {float(res.relres):.2e}", flush=True)

run("full-d KNN", None)

Xc = X2 - X2.mean(0)
_, _, Vt = np.linalg.svd(Xc, full_matrices=False)
run("PCA-2D KNN", jnp.asarray(Vt[:2].T))
run("window0-2D KNN", jnp.asarray(np.eye(d)[:, :2]))
run("PCA-3D KNN", jnp.asarray(Vt[:3].T))

# baseline: nystrom alone (use_ran path on same landmarks)
plan = AfnPlan(perm=jnp.asarray(perm_a), k=rank, use_ran=True,
               pattern=(jnp.zeros((0, lfil), jnp.int32), jnp.zeros((0, lfil), bool)))
pre = afn_setup_from_plan(kernel, params, X, plan, windows=windows)
res = pcg(mv, b, precond=pre.solve, tol=1e-6, maxits=300)
hist = np.asarray(res.res_history)
hit = np.where(hist <= 1e-6)[0]
print(f"{'nystrom (RAN)':22s} iters_to_1e-6 {hit[0] if hit.size else '>300':>5} "
      f"final {float(res.relres):.2e}", flush=True)
