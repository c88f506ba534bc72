"""Stencil near-field (fastsum + cellgrid): parity with the ELL apply, the
radius pattern's symmetry, and the taper's spectral role.
"""

import numpy as np
import jax
import jax.numpy as jnp

from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import cellgrid as cg
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
    KernelParams, make_windows,
)


def _setup(n=1500, d=4, kind="matern12", l=0.3, lfil=12):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float64)
    params = KernelParams.make(1.0, l, 0.01, dtype=jnp.float64)
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])
    geom = fs.additive_fastsum_geometry(X, windows)
    nf_pats, nf_stens = fs.additive_nearfield_radius_stencils(geom, kind, lfil)
    assert nf_pats is not None
    plan = fs.additive_fastsum_coeffs(kind, params, geom, psd_clip=True,
                                      nearfield_lfil=lfil, nf_patterns=nf_pats)
    return X, params, geom, nf_pats, nf_stens, plan


def test_radius_pattern_symmetric():
    rng = np.random.default_rng(5)
    x = rng.uniform(size=(900, 2))
    grid = cg.build_cell_grid(x, target_occupancy=6.0)
    idx, mask = cg.radius_pattern(grid, x)
    n = x.shape[0]
    # membership is symmetric: (i, j) valid => (j, i) valid
    edges = set()
    for i in range(n):
        for s in range(idx.shape[1] - 1):
            if mask[i, s]:
                edges.add((i, int(idx[i, s])))
    for (i, j) in edges:
        assert (j, i) in edges
        assert np.linalg.norm(x[i] - x[j]) <= grid.h + 1e-12
    # self in last slot
    assert np.all(idx[:, -1] == np.arange(n))
    assert np.all(mask[:, -1])


def test_packed_stencil_matches_ell():
    X, params, geom, nf_pats, nf_stens, plan = _setup()
    pn_ell = fs.packed_ndft_plan(plan)
    pn_st = fs.packed_ndft_plan(plan, nf_stencils=nf_stens)
    assert any(
        isinstance(t, fs.NfStencilEntry)
        for t in list(pn_st.nf2) + list(pn_st.nf1) if t is not None
    )
    x = jnp.asarray(np.random.default_rng(1).normal(size=(X.shape[0],)), jnp.float64)
    y_ell = np.asarray(fs.packed_ndft_matvec(pn_ell, x, interpret=True))
    y_st = np.asarray(fs.packed_ndft_matvec(pn_st, x, interpret=True))
    np.testing.assert_allclose(y_st, y_ell, rtol=1e-10, atol=1e-10)

    # batched + gradient paths
    Xb = jnp.asarray(np.random.default_rng(2).normal(size=(3, X.shape[0])), jnp.float64)
    yb_ell = np.asarray(fs.packed_ndft_matvec_batch(pn_ell, Xb, interpret=True))
    yb_st = np.asarray(fs.packed_ndft_matvec_batch(pn_st, Xb, interpret=True))
    np.testing.assert_allclose(yb_st, yb_ell, rtol=1e-10, atol=1e-10)
    g_ell = np.asarray(fs.packed_ndft_grad_matvec(pn_ell, x, interpret=True))
    g_st = np.asarray(fs.packed_ndft_grad_matvec(pn_st, x, interpret=True))
    np.testing.assert_allclose(g_st, g_ell, rtol=1e-10, atol=1e-10)


def test_radius_nearfield_symmetric_operator():
    X, params, geom, nf_pats, nf_stens, plan = _setup(n=800)
    n = X.shape[0]
    mvb = jax.jit(lambda p, V: jax.vmap(lambda v: fs.additive_fastsum_matvec(p, v))(V))
    K = np.asarray(mvb(plan, jnp.eye(n, dtype=jnp.float64)))
    assert np.abs(K - K.T).max() < 1e-12
    # tapered self-correction keeps full weight (w(0) = 1): diagonal of the
    # corrected operator matches the exact kernel diagonal closely
    want_diag = float(params.f) ** 2 * (1.0 + float(params.mu))
    assert abs(np.median(np.diag(K)) - want_diag) < 5e-3


def test_stencil_fallback_on_duplicates():
    # integer-valued features: grids degenerate, radius stencils refuse
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(0, 4, size=(1200, 4)).astype(np.float64))
    windows = make_windows([[0, 1], [2, 3]])
    geom = fs.additive_fastsum_geometry(X, windows)
    nf_pats, nf_stens = fs.additive_nearfield_radius_stencils(geom, "matern12", 12)
    assert nf_pats is None and nf_stens is None
