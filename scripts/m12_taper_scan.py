"""Tapered near-field: lambda_min scaling scan (fast Lanczos estimator).

Confirms the taper keeps the matern12 fastsum operator PSD as n grows
(the untapered correction drove lambda_min to -0.066 by n=8e3).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import KernelParams
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs


def extreme_eigs(mv, n, its=300, seed=0):
    """Full-reorth Lanczos extreme Ritz values of a symmetric operator."""
    rng = np.random.default_rng(seed)
    V = np.zeros((its + 1, n))
    v = rng.normal(size=n)
    v /= np.linalg.norm(v)
    V[0] = v
    alphas, betas = [], []
    beta = 0.0
    for j in range(its):
        w = np.asarray(mv(jnp.asarray(V[j])))
        a = float(V[j] @ w)
        w = w - a * V[j] - (beta * V[j - 1] if j > 0 else 0.0)
        w -= V[: j + 1].T @ (V[: j + 1] @ w)      # full reorth
        beta = float(np.linalg.norm(w))
        alphas.append(a)
        if beta < 1e-12:
            break
        betas.append(beta)
        V[j + 1] = w / beta
    from scipy.linalg import eigh_tridiagonal
    t = eigh_tridiagonal(alphas, betas[: len(alphas) - 1],
                         eigvals_only=True)
    return float(t[0]), float(t[-1])


mu = 0.01
for l in (0.5, 0.1, 0.05):
    for n in (8000, 16000, 32000, 64000):
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float64)
        params = KernelParams.make(1.0, l, mu, dtype=jnp.float64)
        geom = fs.fastsum_geometry(X, 32)
        for lfil, taper in ((16, True), (32, True)):
            plan = fs.fastsum_coeffs("matern12", params, geom, psd_clip=True,
                                     nearfield_lfil=lfil)
            if not taper:
                pass  # fastsum_coeffs now tapers by default
            mv = jax.jit(lambda p, v: fs.fastsum_matvec(p, v))
            lo, hi = extreme_eigs(lambda v: mv(plan, v), n, its=250)
            print(f"l={l} n={n:6d} nf{lfil}tap lam_min {lo:+.4e} "
                  f"lam_max {hi:.3e}", flush=True)
