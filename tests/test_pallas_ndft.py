"""Packed fused-phase NDFT Pallas kernels vs the table path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.ops.fastsum import (
    additive_fastsum_build,
    additive_fastsum_matvec,
    additive_fastsum_grad_matvec,
    additive_fastsum_matvec_fused,
    additive_fastsum_grad_matvec_fused,
    fastsum_geometry,
    fastsum_coeffs,
    _folded_adjoint,
    _folded_combine,
    _folded_forward,
)
from nfft4gp_tpu.ops.kernels import KernelParams, make_windows
from nfft4gp_tpu.ops.pallas_ndft import packed_adjoint, packed_forward


def test_packed_adjoint_matches_folded():
    rng = np.random.default_rng(101)
    n, N = 300, 16
    P = N // 2 + 1
    X = jnp.asarray(rng.uniform(size=(n, 5)), jnp.float32)
    alpha = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    geos = [fastsum_geometry(X[:, [a, b]], N) for a, b in [(0, 1), (2, 3)]]
    geo1 = fastsum_geometry(X[:, [4]], N)

    xT = jnp.stack(
        [geos[0].x[:, 0], geos[0].x[:, 1], geos[1].x[:, 0], geos[1].x[:, 1],
         geo1.x[:, 0]]
    )
    A2, A1 = packed_adjoint(
        xT, alpha, P=P, pairs=((0, 1), (2, 3)), singles=(4,), block=128,
        interpret=True,
    )
    for w, g in enumerate(geos):
        ref = _folded_adjoint(g.Tcs, alpha)
        np.testing.assert_allclose(
            np.asarray(A2[w]), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
    ref1 = _folded_adjoint(geo1.Tcs, alpha)
    np.testing.assert_allclose(np.asarray(A1[0]), np.asarray(ref1), rtol=1e-4, atol=1e-4)


def test_packed_forward_matches_folded():
    rng = np.random.default_rng(103)
    n, N = 256, 16
    P = N // 2 + 1
    X = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    p = KernelParams.make(1.0, 0.4, 0.05, dtype=jnp.float32)
    g2 = fastsum_geometry(X[:, [0, 1]], N)
    g1 = fastsum_geometry(X[:, [2]], N)
    p2 = fastsum_coeffs("gaussian", p, g2)
    p1 = fastsum_coeffs("gaussian", p, g1)
    alpha = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    A2 = _folded_adjoint(g2.Tcs, alpha)
    A1 = _folded_adjoint(g1.Tcs, alpha)
    G2 = _folded_combine(p2.w, A2, 2)
    G1 = _folded_combine(p1.w, A1, 1)

    xT = jnp.stack([g2.x[:, 0], g2.x[:, 1], g1.x[:, 0]])
    ys = packed_forward(
        xT, [[G2]], [[G1]], P=P, pairs=((0, 1),), singles=(2,), block=128,
        interpret=True,
    )
    ref = _folded_forward(g2.Tcs, G2) + _folded_forward(g1.Tcs, G1)
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nearfield", [0, 12])
def test_fused_additive_matvec_matches_table(nearfield):
    """5 x 2-D + 1 x 1-D windows: packed fused path == table path."""
    rng = np.random.default_rng(107)
    n, d = 400, 11
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    p = KernelParams.make(1.1, 0.5, 0.02, dtype=jnp.float32)
    windows = make_windows([[0, 1], [2, 3], [4, 5], [6, 7], [8, 9], [10]])
    plan = additive_fastsum_build(
        "gaussian", p, X, windows, N=32, nearfield_lfil=nearfield
    )
    x = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    ref = additive_fastsum_matvec(plan, x)
    out = additive_fastsum_matvec_fused(plan, x, block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)

    dref = additive_fastsum_grad_matvec(plan, x)
    dout = additive_fastsum_grad_matvec_fused(plan, x, block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(dout), np.asarray(dref), rtol=3e-4, atol=3e-4)


def test_fused_path_keeps_3d_windows_on_tables():
    rng = np.random.default_rng(109)
    n = 200
    X = jnp.asarray(rng.uniform(size=(n, 5)), jnp.float32)
    p = KernelParams.make(1.0, 0.6, 0.05, dtype=jnp.float32)
    windows = make_windows([[0, 1, 2], [3, 4]])
    plan = additive_fastsum_build("gaussian", p, X, windows, N=16)
    x = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    ref = additive_fastsum_matvec(plan, x)
    out = additive_fastsum_matvec_fused(plan, x, block=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("P", [17, 9])
def test_phase_gen_doubling_matches_direct(P):
    """Block-doubling phase regeneration matches direct cos/sin to ~1e-6
    (f32): rotation error grows only like log2(P) ulp."""
    from nfft4gp_tpu.ops.pallas_ndft import _build_T6, _build_T6_doubling

    rng = np.random.default_rng(5)
    xT = jnp.asarray(rng.uniform(-0.25, 0.25, size=(6, 256)), jnp.float32)
    a = np.asarray(_build_T6(xT, P))
    b = np.asarray(_build_T6_doubling(xT, P))
    RP = ((P + 7) // 8) * 8
    # compare only the real mode rows (pad rows differ by design)
    np.testing.assert_allclose(a[:, :P], b[:, :P], atol=5e-6)
    np.testing.assert_allclose(a[:, RP : RP + P], b[:, RP : RP + P], atol=5e-6)


@pytest.mark.parametrize(
    "table_dtype,upcast,tol_full,tol_trim",
    [
        (None, False, 2e-5, 6e-3),
        # upcast mode: only the stored phases are bf16-rounded (table-path
        # equivalent accuracy)
        (jnp.bfloat16, True, 4e-3, 6e-3),
        # direct-MXU mode: alpha and the combined weights round to bf16 as
        # operands too (the speed mode — one rounding per dot, like the
        # MXU's own DEFAULT-precision operand rounding)
        (jnp.bfloat16, False, 2.5e-2, 2.5e-2),
    ],
)
def test_packed_ndft_streamed_matches_table(table_dtype, upcast, tol_full,
                                            tol_trim):
    """Streamed-table packed plan == table path (edge-trim tolerance)."""
    from nfft4gp_tpu.ops.fastsum import (
        packed_ndft_plan,
        packed_ndft_matvec,
        packed_ndft_grad_matvec,
    )

    rng = np.random.default_rng(113)
    n, d = 400, 11
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    p = KernelParams.make(1.1, 0.5, 0.02, dtype=jnp.float32)
    windows = make_windows([[0, 1], [2, 3], [4, 5], [6, 7], [8, 9], [10]])
    plan = additive_fastsum_build("gaussian", p, X, windows, N=32)
    x = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    ref = additive_fastsum_matvec(plan, x)
    dref = additive_fastsum_grad_matvec(plan, x)

    # untrimmed: exact vs the table path (f32 roundoff / bf16 phase rounding)
    pn_full = packed_ndft_plan(plan, table_dtype=table_dtype, block=128,
                               edge_trim=False)
    out_full = packed_ndft_matvec(pn_full, x, interpret=True, upcast=upcast)
    errf = np.linalg.norm(np.asarray(out_full) - np.asarray(ref))
    assert errf / np.linalg.norm(np.asarray(ref)) < tol_full

    # trimmed default: pad-free layout; Nyquist-mode difference only
    # (~7e-4 rel here — it moves the operator TOWARD the dense oracle)
    pn = packed_ndft_plan(plan, table_dtype=table_dtype, block=128)
    assert pn.P == 16 and pn.Tp.shape[0] % 32 == 0  # pad-free trimmed layout
    out = packed_ndft_matvec(pn, x, interpret=True, upcast=upcast)
    err = np.linalg.norm(np.asarray(out) - np.asarray(ref))
    err /= np.linalg.norm(np.asarray(ref))
    assert err < tol_trim

    dout = packed_ndft_grad_matvec(pn, x, interpret=True, upcast=upcast)
    for j in range(3):
        derr = np.linalg.norm(np.asarray(dout[j]) - np.asarray(dref[j]))
        dnorm = np.linalg.norm(np.asarray(dref[j]))
        assert derr / max(dnorm, 1e-12) < max(9e-3, 3 * tol_trim), f"grad {j}"


def test_packed_ndft_streamed_3d_rest():
    from nfft4gp_tpu.ops.fastsum import packed_ndft_plan, packed_ndft_matvec

    rng = np.random.default_rng(117)
    n = 200
    X = jnp.asarray(rng.uniform(size=(n, 5)), jnp.float32)
    p = KernelParams.make(1.0, 0.6, 0.05, dtype=jnp.float32)
    windows = make_windows([[0, 1, 2], [3, 4]])
    plan = additive_fastsum_build("gaussian", p, X, windows, N=16)
    x = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    ref = additive_fastsum_matvec(plan, x)
    # untrimmed: exact; trimmed: Nyquist-mode difference only
    out_full = packed_ndft_matvec(
        packed_ndft_plan(plan, block=128, edge_trim=False), x, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    out = packed_ndft_matvec(packed_ndft_plan(plan, block=128), x,
                             interpret=True)
    err = np.linalg.norm(np.asarray(out) - np.asarray(ref))
    assert err / np.linalg.norm(np.asarray(ref)) < 6e-3


def test_packed_ndft_matvec_batch_matches_single():
    """nv RHS sharing one table stream == nv single-RHS matvecs."""
    from nfft4gp_tpu.ops.fastsum import (
        packed_ndft_plan,
        packed_ndft_matvec,
        packed_ndft_matvec_batch,
    )

    rng = np.random.default_rng(17)
    n, d, nv = 384, 7, 4
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    p = KernelParams.make(0.9, 0.4, 0.05, dtype=jnp.float32)
    windows = make_windows([[0, 1], [2, 3], [4, 5], [6]])
    plan = additive_fastsum_build("gaussian", p, X, windows, N=16)
    pn = packed_ndft_plan(plan, block=128)
    Xb = jnp.asarray(rng.normal(size=(nv, n)), jnp.float32)

    Yb = packed_ndft_matvec_batch(pn, Xb, interpret=True)
    assert Yb.shape == (nv, n)
    for r in range(nv):
        y1 = packed_ndft_matvec(pn, Xb[r], interpret=True)
        err = np.linalg.norm(np.asarray(Yb[r]) - np.asarray(y1))
        err /= np.linalg.norm(np.asarray(y1))
        assert err < 1e-6, f"rhs {r}: {err}"


def test_packed_ndft_grad_matvec_batch_matches_single():
    from nfft4gp_tpu.ops.fastsum import (
        packed_ndft_plan,
        packed_ndft_grad_matvec,
        packed_ndft_grad_matvec_batch,
    )

    rng = np.random.default_rng(19)
    n, d, nv = 320, 5, 3
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    p = KernelParams.make(0.8, 0.6, 0.03, dtype=jnp.float32)
    windows = make_windows([[0, 1], [2, 3], [4]])
    plan = additive_fastsum_build("gaussian", p, X, windows, N=16)
    pn = packed_ndft_plan(plan, block=128)
    Xb = jnp.asarray(rng.normal(size=(nv, n)), jnp.float32)

    Db = packed_ndft_grad_matvec_batch(pn, Xb, interpret=True)
    assert Db.shape == (nv, 3, n)
    for r in range(nv):
        d1 = packed_ndft_grad_matvec(pn, Xb[r], interpret=True)
        err = np.linalg.norm(np.asarray(Db[r]) - np.asarray(d1))
        err /= np.linalg.norm(np.asarray(d1))
        assert err < 1e-6, f"rhs {r}: {err}"
