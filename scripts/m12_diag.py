"""Diagnose the matern12 fastsum divergence (VERDICT r4 missing #3).

Small-n f64 CPU: materialize the fastsum operator via matvecs, check
symmetry, definiteness, and accuracy vs the dense additive kernel, with
each ingredient (psd_clip, near-field) toggled.
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
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs

n, d = 2000, 10
l = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
kind = "matern12"
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float64)
params = KernelParams.make(1.0, l, 0.01, dtype=jnp.float64)
windows = make_windows([[i, i + 1] for i in range(0, d, 2)])

Kd = np.asarray(additive_kernel_matrix(kind, params, X, windows))
eigs_d = np.linalg.eigvalsh(Kd)
print(f"dense: eig range [{eigs_d[0]:.3e}, {eigs_d[-1]:.3e}]")

geom = fs.additive_fastsum_geometry(X, windows)

for psd_clip in (True, False):
    for nf in (None, 0):  # None = auto near-field, 0 = off
        plan = fs.additive_fastsum_coeffs(kind, params, geom,
                                          psd_clip=psd_clip, nearfield_lfil=nf)
        mvb = jax.jit(lambda p, V: jax.vmap(lambda v: fs.additive_fastsum_matvec(p, v))(V))
        Kf = np.asarray(mvb(plan, jnp.eye(n, dtype=jnp.float64))).T
        sym = np.abs(Kf - Kf.T).max()
        eigs = np.linalg.eigvalsh(0.5 * (Kf + Kf.T))
        relerr = np.abs(Kf - Kd).max() / np.abs(Kd).max()
        print(f"psd_clip={psd_clip} nf={'auto' if nf is None else nf}: "
              f"sym err {sym:.2e}, eig range [{eigs[0]:.3e}, {eigs[-1]:.3e}], "
              f"max relerr vs dense {relerr:.3e}")

# where is the error? wrap (smooth periodization) vs kink
plan = fs.additive_fastsum_coeffs(kind, params, geom, psd_clip=False, nearfield_lfil=0)
# per-window scaled radii
for gi, (dw, order, bg) in enumerate(geom.groups):
    sc = np.asarray(bg.scale)
    print(f"group {gi}: window d={dw}, scales {sc}, "
          f"true torus-edge dist {0.5/sc}, phi(edge) {np.exp(-0.5/sc/l)}")
