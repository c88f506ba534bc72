"""Direct stencil near-field (fastsum + cellgrid): exact parity with a
brute-force evaluation of the radius-tapered correction, plus the spectral
properties that fix the r4 matern12 divergence.
"""

import numpy as np
import jax
import jax.numpy as jnp

from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
    KernelParams, make_windows, kernel_matrix, _BASE_KERNELS,
)


def _setup(n=1200, d=4, kind="matern12", l=0.3, lfil=12):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float64)
    params = KernelParams.make(1.0, l, 0.01, dtype=jnp.float64)
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])
    geom = fs.additive_fastsum_geometry(X, windows)
    nf_stens = fs.additive_nearfield_stencil_direct(geom, kind, lfil)
    assert nf_stens is not None
    plan = fs.additive_fastsum_coeffs(kind, params, geom, psd_clip=True,
                                      nearfield_lfil=0)
    return X, params, geom, nf_stens, plan


def _brute_nf(kind, params, geom_group, w, b, rho):
    """Brute-force radius-tapered correction matrix for one window."""
    x = np.asarray(geom_group.x[w])
    scale = float(np.asarray(geom_group.scale[w]))
    n = x.shape[0]
    D = x[:, None, :] - x[None, :, :]
    r = np.linalg.norm(D, axis=2)
    phi = np.asarray(_BASE_KERNELS[kind](
        jnp.asarray(r * r / (scale * scale)), params.l)[0])
    tp = np.asarray(fs.trigpoly_eval(
        b, jnp.asarray(D.reshape(-1, x.shape[1])))).reshape(n, n)
    wgt = np.maximum(1.0 - r / rho, 0.0) ** 2
    C = np.where(r <= rho, (phi - tp) * wgt, 0.0)
    return C


def test_direct_stencil_matches_bruteforce():
    X, params, geom, nf_stens, plan = _setup(n=900)
    pn = fs.packed_ndft_plan(plan, nf_stencils=nf_stens)
    entries = [t for t in list(pn.nf2) + list(pn.nf1) if t is not None]
    assert entries and all(isinstance(t, fs.NfStencilEntry) for t in entries)

    n = X.shape[0]
    # packed matvec WITH stencil nf  minus  packed matvec WITHOUT
    pn0 = fs.packed_ndft_plan(plan)
    E = jnp.eye(n, dtype=jnp.float64)
    Kc = np.asarray(jax.vmap(
        lambda v: fs.packed_ndft_matvec(pn, v, interpret=True))(E)).T
    K0 = np.asarray(jax.vmap(
        lambda v: fs.packed_ndft_matvec(pn0, v, interpret=True))(E)).T
    got = Kc - K0

    f2 = float(params.f) ** 2
    W = plan.n_windows
    want = np.zeros((n, n))
    for (dw, order, plans), group_st in zip(plan.groups, nf_stens):
        if group_st is None:
            continue
        for w, sten in enumerate(group_st):
            want += _brute_nf("matern12", params, plans.geom, w,
                              plans.b[w], sten.rho)
    want *= f2 / W
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    # the correction itself is exactly symmetric (the packed NDFT base
    # carries f32-level table roundoff of its own)
    assert np.abs(got - got.T).max() < 1e-10


def test_direct_stencil_improves_accuracy_and_psd():
    """The corrected operator must beat the uncorrected one against the
    dense kernel and stay (near-)PSD — the two properties whose conflict
    broke the r4 ELL near-field at scale."""
    X, params, geom, nf_stens, plan = _setup(n=1500, l=0.2)
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        additive_kernel_matrix,
    )

    windows = make_windows([[0, 1], [2, 3]])
    Kd = np.asarray(additive_kernel_matrix("matern12", params, X, windows))
    n = X.shape[0]
    E = jnp.eye(n, dtype=jnp.float64)
    pn = fs.packed_ndft_plan(plan, nf_stencils=nf_stens)
    pn0 = fs.packed_ndft_plan(plan)
    Kc = np.asarray(jax.vmap(
        lambda v: fs.packed_ndft_matvec(pn, v, interpret=True))(E)).T
    K0 = np.asarray(jax.vmap(
        lambda v: fs.packed_ndft_matvec(pn0, v, interpret=True))(E)).T
    err_c = np.abs(Kc - Kd).max()
    err_0 = np.abs(K0 - Kd).max()
    assert err_c < 0.7 * err_0
    lam_min = np.linalg.eigvalsh(0.5 * (Kc + Kc.T))[0]
    mu_floor = float(params.f) ** 2 * float(params.mu)
    assert lam_min > -0.5 * mu_floor


def test_grad_and_batch_paths():
    X, params, geom, nf_stens, plan = _setup(n=800)
    pn = fs.packed_ndft_plan(plan, nf_stencils=nf_stens)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(X.shape[0],)),
                    jnp.float64)
    y1 = np.asarray(fs.packed_ndft_matvec(pn, x, interpret=True))
    Xb = jnp.stack([x, 2.0 * x])
    yb = np.asarray(fs.packed_ndft_matvec_batch(pn, Xb, interpret=True))
    np.testing.assert_allclose(yb[0], y1, rtol=1e-12)
    np.testing.assert_allclose(yb[1], 2.0 * y1, rtol=1e-12)
    g1 = np.asarray(fs.packed_ndft_grad_matvec(pn, x, interpret=True))
    gb = np.asarray(fs.packed_ndft_grad_matvec_batch(pn, Xb, interpret=True))
    np.testing.assert_allclose(gb[0], g1, rtol=1e-12)
    # dk/df row consistency: y_f = 2/f * (K x) at mu-term granularity is
    # covered by test_fastsum; here just finite and shaped
    assert g1.shape == (3, X.shape[0])


def test_stencil_fallback_on_duplicates():
    # integer-valued features: grids degenerate, direct stencils refuse
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(0, 4, size=(1200, 4)).astype(np.float64))
    windows = make_windows([[0, 1], [2, 3]])
    geom = fs.additive_fastsum_geometry(X, windows)
    assert fs.additive_nearfield_stencil_direct(geom, "matern12", 12) is None
