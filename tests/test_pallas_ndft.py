"""Pallas fused-phase NDFT kernels vs the table-based path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.ops.fastsum import (
    fastsum_geometry,
    fastsum_coeffs,
    fastsum_base_apply,
)
from nfft4gp_tpu.ops.kernels import KernelParams
from nfft4gp_tpu.ops.pallas_ndft import (
    ndft_adjoint1,
    ndft_adjoint2,
    fused_window_apply,
)
from nfft4gp_tpu.ops.fastsum import _ndft_adjoint, _full_tables


@pytest.mark.parametrize("d", [1, 2])
def test_fused_apply_matches_table_path(d):
    rng = np.random.default_rng(101)
    n, N = 300, 16
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    p = KernelParams.make(1.0, 0.4, 0.05, dtype=jnp.float32)
    geom = fastsum_geometry(X, N)
    plan = fastsum_coeffs("gaussian", p, geom)
    alpha = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    ref = fastsum_base_apply(plan, plan.b, alpha)
    out = fused_window_apply(
        geom.x, alpha, plan.b, N, block=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("d", [1, 2])
def test_adjoint_matches_table_path(d):
    rng = np.random.default_rng(103)
    n, N = 200, 16
    X = jnp.asarray(rng.uniform(size=(n, d)) - 0.5, jnp.float32) * 0.5
    alpha = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    geom = fastsum_geometry(X, N)
    re_ref, im_ref = _ndft_adjoint(_full_tables(geom.x, N), alpha)
    if d == 1:
        re, im = ndft_adjoint1(geom.x, alpha, N, block=64, interpret=True)
    else:
        re, im = ndft_adjoint2(geom.x, alpha, N, block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(re), np.asarray(re_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(im), np.asarray(im_ref), rtol=2e-4, atol=2e-4)
