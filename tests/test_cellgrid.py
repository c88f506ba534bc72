"""Cell-sorted stencil layout (ops/cellgrid.py): correctness vs padded-ELL.

The stencil layout must reproduce the ELL apply exactly (same values, new
layout) — it replaces the gather-bound applies of fsai.c:106-124 / the
NFFT3 nearfield sum on TPU (SETUP.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import cellgrid as cg
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.knn import knn_pattern
from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.matops import (
    ell_matvec,
    ell_rmatvec,
)


def _setup(n=800, d=2, lfil=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n, d))
    grid = cg.build_cell_grid(X, target_occupancy=10.0)
    assert grid is not None
    Xs = X[grid.perm]
    idx, mask = jax.jit(lambda x: knn_pattern(jnp.asarray(x), lfil))(Xs)
    idx, mask = np.asarray(idx), np.asarray(mask)
    # pattern distances must fit one cell hop: enforce via min_h rebuild
    D = np.linalg.norm(Xs[:, None, :] - Xs[idx], axis=2)
    rmax = float(D[mask].max())
    if rmax > grid.h:
        grid = cg.build_cell_grid(X, min_h=rmax * 1.0001)
        assert grid is not None
        Xs = X[grid.perm]
        idx, mask = jax.jit(lambda x: knn_pattern(jnp.asarray(x), lfil))(Xs)
        idx, mask = np.asarray(idx), np.asarray(mask)
    rng2 = np.random.default_rng(seed + 1)
    val = np.where(mask, rng2.normal(size=idx.shape), 0.0)
    return X, grid, idx, mask, val


@pytest.mark.parametrize("d", [1, 2, 3])
def test_pad_unpad_roundtrip(d):
    rng = np.random.default_rng(3)
    n = 500
    X = rng.uniform(size=(n, d))
    grid = cg.build_cell_grid(X, target_occupancy=8.0)
    assert grid is not None
    dev = cg.to_device(grid)
    xs = jnp.asarray(rng.normal(size=(n,)))
    pad = cg.pad_cells(dev, xs)
    assert pad.shape == (dev.ncells, grid.c)
    back = cg.unpad_cells(dev, pad)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xs), rtol=0, atol=0)
    # user-order fused permutation roundtrip
    xu = jnp.asarray(rng.normal(size=(n,)))
    pad_u = cg.pad_cells_user(dev, xu)
    np.testing.assert_allclose(
        np.asarray(pad_u), np.asarray(cg.pad_cells(dev, xu[jnp.asarray(grid.perm)]))
    )
    back_u = cg.unpad_cells(dev, pad_u, user_order=True)
    np.testing.assert_allclose(np.asarray(back_u), np.asarray(xu))
    # batched
    Xb = jnp.asarray(rng.normal(size=(n, 3)))
    np.testing.assert_allclose(
        np.asarray(cg.unpad_cells(dev, cg.pad_cells(dev, Xb))), np.asarray(Xb)
    )


@pytest.mark.parametrize("d", [1, 2])
def test_stencil_matvec_matches_ell(d):
    X, grid, idx, mask, val = _setup(d=d)
    dev = cg.to_device(grid)
    emb = cg.ell_stencil_embed_plan(grid, idx, mask, sorted_idx=True)
    assert emb is not None
    sm = cg.stencil_embed(dev, emb, jnp.asarray(val))
    xs = jnp.asarray(np.random.default_rng(9).normal(size=(grid.n,)))
    want = np.asarray(ell_matvec(jnp.asarray(idx), jnp.asarray(val), xs))
    got = np.asarray(cg.stencil_matvec(dev, sm, xs))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # batched RHS
    Xb = jnp.asarray(np.random.default_rng(10).normal(size=(grid.n, 4)))
    wantb = np.stack(
        [np.asarray(ell_matvec(jnp.asarray(idx), jnp.asarray(val), Xb[:, j]))
         for j in range(4)], axis=1,
    )
    gotb = np.asarray(cg.stencil_matvec(dev, sm, Xb))
    np.testing.assert_allclose(gotb, wantb, rtol=1e-12, atol=1e-12)


def test_stencil_transpose_matches_rmatvec():
    X, grid, idx, mask, val = _setup(d=2)
    dev = cg.to_device(grid)
    emb = cg.ell_stencil_embed_plan(grid, idx, mask, sorted_idx=True)
    sm = cg.stencil_embed(dev, emb, jnp.asarray(val))
    smt = cg.stencil_transpose(dev, sm)
    xs = jnp.asarray(np.random.default_rng(11).normal(size=(grid.n,)))
    want = np.asarray(ell_rmatvec(jnp.asarray(idx), jnp.asarray(val), xs))
    got = np.asarray(cg.stencil_matvec(dev, smt, xs))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_user_order_matvec():
    X, grid, idx, mask, val = _setup(d=2)
    dev = cg.to_device(grid)
    emb = cg.ell_stencil_embed_plan(grid, idx, mask, sorted_idx=True)
    sm = cg.stencil_embed(dev, emb, jnp.asarray(val))
    # user-order apply == P^T (M (P x))
    xu = jnp.asarray(np.random.default_rng(12).normal(size=(grid.n,)))
    xs = xu[jnp.asarray(grid.perm)]
    want_s = np.asarray(ell_matvec(jnp.asarray(idx), jnp.asarray(val), xs))
    want_u = np.empty_like(want_s)
    want_u[grid.perm] = want_s
    got = np.asarray(cg.stencil_matvec(dev, sm, xu, user_order=True))
    np.testing.assert_allclose(got, want_u, rtol=1e-12, atol=1e-12)


def test_embed_nonlocal_entries():
    rng = np.random.default_rng(0)
    X = rng.uniform(size=(300, 2))
    grid = cg.build_cell_grid(X, target_occupancy=4.0)
    assert grid is not None
    # a deliberately global pattern: neighbor 0 for everyone — the far
    # edges ride the exception list; with max_exceptions=0 it must reject
    idx = np.zeros((300, 2), np.int32)
    idx[:, 1] = np.arange(300)
    mask = np.ones((300, 2), bool)
    emb = cg.ell_stencil_embed_plan(grid, idx, mask, sorted_idx=True)
    assert emb is not None and int(np.asarray(emb.exc_valid).sum()) > 0
    assert cg.ell_stencil_embed_plan(grid, idx, mask, sorted_idx=True,
                                     max_exceptions=0) is None
    # stencil apply + exception COO term reproduces the full ELL product
    val = np.where(mask, rng.normal(size=idx.shape), 0.0)
    dev = cg.to_device(grid)
    sm = cg.stencil_embed(dev, emb, jnp.asarray(val))
    x = jnp.asarray(rng.normal(size=(300,)))
    flat = emb.exc_rows * emb.lfil + emb.exc_slot
    exc_v = jnp.where(emb.exc_valid, jnp.asarray(val).reshape(-1)[flat], 0.0)
    y = cg.stencil_matvec(dev, sm, x)
    y = y.at[emb.exc_rows].add(exc_v * x[emb.exc_cols])
    want = np.asarray(ell_matvec(jnp.asarray(idx), jnp.asarray(val), x))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6, atol=1e-6)


def test_degenerate_data_falls_back():
    # duplicate-heavy (integer) data must refuse the layout
    rng = np.random.default_rng(0)
    X = rng.integers(0, 3, size=(2000, 2)).astype(np.float64)
    grid = cg.build_cell_grid(X, target_occupancy=10.0)
    assert grid is None
