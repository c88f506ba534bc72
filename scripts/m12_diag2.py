"""matern12 fastsum operator: n-scaling of lambda_min and mitigations.

The round-4 artifact AFN_PCG_3e4_matern12_f64cpu.json shows every solver
failing on the additive matern12 fastsum operator at n=3e4 even in f64.
Hypothesis: the near-field correction (exact kernel patched onto a 16-NN
pattern) is an INDEFINITE sparse perturbation whose magnitude grows as
nearest-neighbor distances shrink — psd_clip guards only the trigpoly part.

This probe measures lambda_min/lambda_max (scipy eigsh on the jitted
matvec) and relative error vs dense (sampled columns) across n and
near-field configurations, single 2-D window for clarity.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from scipy.sparse.linalg import LinearOperator, eigsh

from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
    KernelParams, kernel_matrix,
)
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs

kind = "matern12"
l = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
mu = 0.01


def taper_plan(plan, x):
    """Smoothly taper the near-field values to 0 at the pattern edge."""
    idx = plan.nf_idx
    D = x[:, None, :] - x[idx]
    r = jnp.sqrt(jnp.sum(D * D, axis=2))
    rmax = jnp.max(r, axis=1, keepdims=True) + 1e-30
    w = (1.0 - r / rmax) ** 2
    w = jnp.where(plan.nf_val != 0, w, 0.0)
    import dataclasses
    return dataclasses.replace(plan, nf_val=plan.nf_val * w,
                               nf_dval=plan.nf_dval * w)


for n in (4000, 8000, 16000, 32000):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float64)
    params = KernelParams.make(1.0, l, mu, dtype=jnp.float64)
    geom = fs.fastsum_geometry(X, 32)

    cols = rng.choice(n, size=512, replace=False)
    Ecols = jnp.zeros((512, n), jnp.float64).at[jnp.arange(512), jnp.asarray(cols)].set(1.0)
    Kd_cols = np.asarray(kernel_matrix(kind, params, X[jnp.asarray(cols)], X)).T  # (n, 512)

    configs = [
        ("clip+nf16", True, 16, False),
        ("clip+nf64", True, 64, False),
        ("clip+nf64tap", True, 64, True),
        ("clip+nf0", True, 0, False),
        ("noclip+nf16", False, 16, False),
    ]
    for name, clip, lfil, tap in configs:
        plan = fs.fastsum_coeffs(kind, params, geom, psd_clip=clip,
                                 nearfield_lfil=lfil)
        if tap:
            plan = taper_plan(plan, geom.x)
        mv = jax.jit(lambda p, v: fs.fastsum_matvec(p, v))
        mvb = jax.jit(lambda p, V: jax.vmap(lambda v: fs.fastsum_matvec(p, v))(V))
        Kf_cols = np.asarray(mvb(plan, Ecols)).T
        relerr = np.abs(Kf_cols - Kd_cols).max() / np.abs(Kd_cols).max()

        op = LinearOperator((n, n), matvec=lambda v: np.asarray(
            mv(plan, jnp.asarray(v, jnp.float64))), dtype=np.float64)
        try:
            lo = eigsh(op, k=1, which="SA", maxiter=3000, tol=1e-6,
                       return_eigenvectors=False)[0]
            hi = eigsh(op, k=1, which="LA", maxiter=3000, tol=1e-6,
                       return_eigenvectors=False)[0]
        except Exception as e:
            lo = hi = np.nan
        print(f"n={n:6d} l={l} {name:14s} lam_min {lo:+.4e} lam_max {hi:.4e} "
              f"relerr {relerr:.3e}", flush=True)
