"""matern12 fastsum operator quality vs N at short lengthscales.

For the on-chip AFN artifact the Fourier operator must be close enough to
the true kernel that preconditioners built from exact kernel evals make
sense.  Measures maxrel/rms error and lambda_min across N in {32,64,128},
nf off/safe/full, l in {0.05, 0.1}, n=8000 2-D.
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
    KernelParams, kernel_matrix,
)
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs

mu = 0.01
n = 8000
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float64)
cols = rng.choice(n, size=256, replace=False)
Ecols = jnp.zeros((256, n), jnp.float64).at[jnp.arange(256), jnp.asarray(cols)].set(1.0)


def lanmin(mv, n, its=120, seed=0):
    r = np.random.default_rng(seed)
    V = np.zeros((its + 1, n)); v = r.normal(size=n); v /= np.linalg.norm(v)
    V[0] = v; al, be = [], []; b = 0.0
    for j in range(its):
        w = np.asarray(mv(jnp.asarray(V[j])))
        a = float(V[j] @ w); w = w - a * V[j] - (b * V[j - 1] if j else 0.0)
        w -= V[: j + 1].T @ (V[: j + 1] @ w)
        b = float(np.linalg.norm(w)); al.append(a)
        if b < 1e-12: break
        be.append(b); V[j + 1] = w / b
    from scipy.linalg import eigh_tridiagonal
    t = eigh_tridiagonal(al, be[: len(al) - 1], eigvals_only=True)
    return float(t[0])


for l in (0.05, 0.1):
    params = KernelParams.make(1.0, l, mu, dtype=jnp.float64)
    Kd = np.asarray(kernel_matrix("matern12", params, X[jnp.asarray(cols)], X)).T
    sK = np.abs(Kd).max()
    for N in (32, 64, 128):
        geom = fs.fastsum_geometry(X, N)
        for nf, tag in ((0, "nf0"), (32, "nf32tap")):
            plan = fs.fastsum_coeffs("matern12", params, geom, psd_clip=True,
                                     nearfield_lfil=nf)
            mv = jax.jit(lambda p, v: fs.fastsum_matvec(p, v))
            Kf = np.asarray(jax.vmap(lambda v: mv(plan, v))(Ecols)).T
            maxrel = np.abs(Kf - Kd).max() / sK
            rms = np.sqrt(np.mean((Kf - Kd) ** 2)) / sK
            lm = lanmin(lambda v: mv(plan, v), n)
            print(f"l={l} N={N:4d} {tag:8s} maxrel {maxrel:.3e} rms {rms:.3e} "
                  f"lam_min {lm:+.4e}", flush=True)
