"""PSD-by-construction near-field: per-cell PSD-projected error blocks.

The raw sparse correction phi - tp on ANY pattern is indefinite at scale
(lambda_min -0.06 by n=8e3, .r5_taper_scan.log).  Alternative: restrict the
correction to within-cell blocks and PSD-project each (eigh clip).  The sum
of per-cell PSD blocks is PSD, so T_clip + C + mu >= mu ALWAYS.  Double
cover (second grid shifted by h/2) catches pairs split by cell boundaries.

Measures matvec relative error vs the dense kernel (TEST1-style oracle) for
nf0 / ELL-nf16 (indefinite) / cellpsd single & double cover.
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
    KernelParams, kernel_matrix, _BASE_KERNELS,
)
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import cellgrid as cg

kind = "matern12"
mu = 0.01


def cell_psd_correction(grid, xs, b, db_l, params, scale, weight=1.0):
    """(ncells, c, c) PSD-projected within-cell error blocks (f64 host-ish)."""
    dev = cg.to_device(grid)
    # padded cell coordinates
    Xp = jnp.stack([cg.pad_cells(dev, xs[:, j]) for j in range(xs.shape[1])],
                   axis=-1)                                    # (ncells, c, d)
    D = Xp[:, :, None, :] - Xp[:, None, :, :]                  # (ncells, c, c, d)
    r2 = jnp.sum(D * D, axis=3)
    phi, _ = _BASE_KERNELS[kind](r2 / (scale * scale), params.l)
    tp = fs.trigpoly_eval(b, D.reshape(-1, xs.shape[1])).reshape(r2.shape)
    E = phi - tp
    m2 = dev.padmask[:, :, None] & dev.padmask[:, None, :]
    E = jnp.where(m2, E, 0.0) * weight
    # PSD projection per cell
    lam, V = jnp.linalg.eigh(E)
    lam = jnp.maximum(lam, 0.0)
    Epsd = jnp.einsum("nik,nk,njk->nij", V, lam, V)
    return dev, jnp.where(m2, Epsd, 0.0)


def apply_cellpsd(dev, blocks, x):
    pad = cg.pad_cells(dev, x)
    ypad = jnp.einsum("nij,nj->ni", blocks, pad)
    return cg.unpad_cells(dev, ypad)


for l in (0.5, 0.05):
    for n in (8000, 32000):
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float64)
        params = KernelParams.make(1.0, l, mu, dtype=jnp.float64)
        geom = fs.fastsum_geometry(X, 32)
        xs_np = np.asarray(geom.x)

        cols = rng.choice(n, size=256, replace=False)
        Kd = np.asarray(kernel_matrix(kind, params, X[jnp.asarray(cols)], X)).T
        scale_K = np.abs(Kd).max()

        def report(name, mv):
            Ecols = jnp.zeros((256, n), jnp.float64).at[
                jnp.arange(256), jnp.asarray(cols)].set(1.0)
            Kf = np.asarray(jax.vmap(mv)(Ecols)).T
            relerr = np.abs(Kf - Kd).max() / scale_K
            # rms error too (max can be one bad pair)
            rms = np.sqrt(np.mean((Kf - Kd) ** 2)) / scale_K
            print(f"l={l} n={n:6d} {name:18s} maxrel {relerr:.3e} rms {rms:.3e}",
                  flush=True)

        plan0 = fs.fastsum_coeffs(kind, params, geom, psd_clip=True,
                                  nearfield_lfil=0)
        report("nf0", jax.jit(lambda v: fs.fastsum_matvec(plan0, v)))

        plan16 = fs.fastsum_coeffs(kind, params, geom, psd_clip=True,
                                   nearfield_lfil=16)
        report("nf16-ell-tap", jax.jit(lambda v: fs.fastsum_matvec(plan16, v)))

        # cell-PSD: single cover
        grid = cg.build_cell_grid(xs_np, target_occupancy=12.0)
        if grid is None:
            print("grid degenerate; skip")
            continue
        dev1, B1 = cell_psd_correction(grid, jnp.asarray(xs_np), plan0.b,
                                       plan0.db_l, params, geom.scale)
        f2 = float(params.f) ** 2

        def mv_single(v):
            y = fs.fastsum_matvec(plan0, v)
            return y + f2 * apply_cellpsd(dev1, B1, v)

        report("cellpsd-1cover", jax.jit(mv_single))

        # double cover: second grid shifted by h/2 (shift points instead)
        h = grid.h
        grid2 = cg.build_cell_grid(xs_np + h / 2, h=h)
        dev2, B2 = cell_psd_correction(grid2, jnp.asarray(xs_np), plan0.b,
                                       plan0.db_l, params, geom.scale,
                                       weight=1.0)

        def mv_double(v):
            y = fs.fastsum_matvec(plan0, v)
            return (y + 0.5 * f2 * apply_cellpsd(dev1, B1, v)
                    + 0.5 * f2 * apply_cellpsd(dev2, B2, v))

        report("cellpsd-2cover", jax.jit(mv_double))
