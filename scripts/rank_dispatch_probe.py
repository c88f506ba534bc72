"""Rank-estimation dispatch artifact (VERDICT r4 #8).

Runs the UNFORCED afn_plan (rank=None: scaled Nystrom-error estimate ->
eigencurve refinement -> RAN-vs-AFN branch, ref afn.c:294-304 /
afn_setup.m:58-83) on one smooth and one non-smooth problem and records
which branch the estimator takes, plus PCG iteration counts of the
resulting preconditioner on the dense operator — the end-to-end evidence
that the dispatch picks the right factorization per regime.

Writes RANK_DISPATCH.json.
"""
import os, sys, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
    KernelParams, kernel_matrix,
)
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.preconds.afn import (
    afn_plan, afn_setup_from_plan,
)
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.pcg import pcg

n = 20000
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float64)
b = jnp.asarray(rng.normal(size=(n,)), jnp.float64)

out = {"n": n, "maxrank": 200, "lfil": 16, "cases": {}}
for kind, l, expect in (("gaussian", 0.5, "ran"), ("matern12", 0.05, "afn")):
    params = KernelParams.make(1.0, l, 0.01, dtype=jnp.float64)
    t0 = time.time()
    plan = afn_plan(kind, params, X, maxrank=200, lfil=16)
    t_plan = time.time() - t0
    branch = "ran" if plan.use_ran else "afn"
    pre = afn_setup_from_plan(kind, params, X, plan)
    K = kernel_matrix(kind, params, X)
    mv = lambda v: jnp.matmul(K, v, precision="highest")
    res = pcg(mv, b, precond=pre.solve, tol=1e-6, maxits=400)
    res0 = pcg(mv, b, tol=1e-6, maxits=400)
    rec = {
        "l": l, "branch": branch, "expected": expect, "k": int(plan.k),
        "plan_s": round(t_plan, 1),
        "pcg_iters": int(res.niter), "pcg_relres": float(res.relres),
        "pcg_iters_noprecond": int(res0.niter),
        "relres_noprecond": float(res0.relres),
    }
    out["cases"][f"{kind}_l{l}"] = rec
    print(f"{kind} l={l}: branch={branch} (expected {expect}) k={plan.k} "
          f"pcg {rec['pcg_iters']} its relres {rec['pcg_relres']:.2e} "
          f"(none: {rec['pcg_iters_noprecond']} its "
          f"{rec['relres_noprecond']:.2e})", flush=True)

with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "RANK_DISPATCH.json"), "w") as f:
    json.dump(out, f, indent=1)
print("wrote RANK_DISPATCH.json")
