"""Fourier-accelerated matvec accuracy vs exact dense — the TEST1 oracle.

Ref: TESTS/TEST1/foo.cpp:240-295 prints L-inf/L2 abs+rel errors of the NFFT
additive matvec and the 3 gradient matvecs against the exact dense operators.
Accuracy here is periodization + mode-truncation error only (the separable
NDFT is exact), so tolerances reflect the N=32 fastsum defaults.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.ops.kernels import (
    KernelParams,
    kernel_matrix,
    kernel_matrix_with_grad,
    additive_kernel_matrix,
    additive_kernel_matrix_with_grad,
    make_windows,
)
from nfft4gp_tpu.ops.fastsum import (
    fastsum_build,
    fastsum_matvec,
    fastsum_grad_matvec,
    additive_fastsum_build,
    additive_fastsum_matvec,
    additive_fastsum_grad_matvec,
)


def rel_err(a, b):
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


@pytest.mark.parametrize(
    # matern12's DEFAULT build now auto-enables the sparse near-field
    # correction (the reference's always-on fastsum regularization role,
    # nfft_interface.c:18-27), so its default-path tolerance tightens from
    # the round-2 4.5e-2 to 1e-2 (VERDICT r2 #4).
    "kind,tol", [("gaussian", 1e-4), ("matern32", 5e-3), ("matern12", 1e-2)]
)
@pytest.mark.parametrize("d", [1, 2])
def test_fastsum_matvec_vs_dense(kind, tol, d):
    rng = np.random.default_rng(31)
    n = 300
    X = jnp.asarray(rng.uniform(size=(n, d)))
    p = KernelParams.make(1.2, 0.25, 0.05)
    K = kernel_matrix(kind, p, X)
    x = jnp.asarray(rng.normal(size=(n,)))
    plan = fastsum_build(kind, p, X, N=32)
    y_fast = fastsum_matvec(plan, x)
    y_ref = K @ x
    assert rel_err(y_fast, y_ref) < tol


def test_fastsum_error_decreases_with_N():
    """Mode truncation error shrinks as the expansion degree grows."""
    rng = np.random.default_rng(53)
    n = 300
    X = jnp.asarray(rng.uniform(size=(n, 1)))
    p = KernelParams.make(1.0, 0.25, 0.05)
    K = kernel_matrix("matern12", p, X)
    x = jnp.asarray(rng.normal(size=(n,)))
    errs = []
    for N in (16, 32, 64):
        plan = fastsum_build("matern12", p, X, N=N)
        errs.append(rel_err(fastsum_matvec(plan, x), K @ x))
    assert errs[2] < errs[1] < errs[0]


@pytest.mark.parametrize("kind,tol", [("gaussian", 2e-4), ("matern12", 6.5e-2)])
def test_fastsum_grad_matvec_vs_dense(kind, tol):
    rng = np.random.default_rng(37)
    n = 250
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.1, 0.3, 0.05)
    _, dK = kernel_matrix_with_grad(kind, p, X)
    x = jnp.asarray(rng.normal(size=(n,)))
    plan = fastsum_build(kind, p, X, N=32)
    dy = fastsum_grad_matvec(plan, x)
    for j in range(3):
        ref = dK[j] @ x
        assert rel_err(dy[j], ref) < tol, f"grad {j}"


def test_fastsum_3d_window():
    rng = np.random.default_rng(41)
    n = 200
    X = jnp.asarray(rng.uniform(size=(n, 3)))
    p = KernelParams.make(1.0, 0.6, 0.02)
    K = kernel_matrix("gaussian", p, X)
    x = jnp.asarray(rng.normal(size=(n,)))
    plan = fastsum_build("gaussian", p, X, N=16)
    y_fast = fastsum_matvec(plan, x)
    assert rel_err(y_fast, K @ x) < 2e-3


def test_additive_fastsum_vs_dense_additive():
    rng = np.random.default_rng(43)
    n = 250
    X = jnp.asarray(rng.uniform(size=(n, 4)))
    p = KernelParams.make(1.3, 0.5, 0.04)
    windows = make_windows([[0], [1, 2], [3]])
    K = additive_kernel_matrix("gaussian", p, X, windows)
    _, dK = additive_kernel_matrix_with_grad("gaussian", p, X, windows)
    x = jnp.asarray(rng.normal(size=(n,)))

    plan = additive_fastsum_build("gaussian", p, X, windows, N=32)
    y = additive_fastsum_matvec(plan, x)
    assert rel_err(y, K @ x) < 2e-3

    dy = additive_fastsum_grad_matvec(plan, x)
    for j in range(3):
        assert rel_err(dy[j], dK[j] @ x) < 5e-3, f"grad {j}"


def test_fastsum_matvec_jits_and_symmetric():
    rng = np.random.default_rng(47)
    n = 128
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.0, 0.5, 0.1)
    plan = fastsum_build("gaussian", p, X, N=32)

    mv = jax.jit(lambda v: fastsum_matvec(plan, v))
    a = jnp.asarray(rng.normal(size=(n,)))
    b = jnp.asarray(rng.normal(size=(n,)))
    # operator is symmetric: a'(K b) == b'(K a)
    np.testing.assert_allclose(
        float(jnp.vdot(a, mv(b))), float(jnp.vdot(b, mv(a))), rtol=1e-10
    )


@pytest.mark.parametrize("d", [1, 2, 3])
def test_fastsum_bf16_tables_speed_mode(d):
    """bf16 phase tables (speed mode): same operator to ~bf16 accuracy,
    f32 output dtype, tables actually stored narrow."""
    rng = np.random.default_rng(11)
    n = 250
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    p = KernelParams.make(1.0, 0.5, 0.05, dtype=jnp.float32)
    ref = fastsum_matvec(fastsum_build("gaussian", p, X, N=16), x)
    plan_b = fastsum_build("gaussian", p, X, N=16, table_dtype=jnp.bfloat16)
    assert plan_b.geom.Tcs.dtype == jnp.bfloat16
    out = fastsum_matvec(plan_b, x)
    assert out.dtype == jnp.float32
    assert rel_err(out, ref) < 2e-2


def test_additive_fastsum_bf16_tables():
    rng = np.random.default_rng(12)
    n, dfull = 200, 5
    X = jnp.asarray(rng.uniform(size=(n, dfull)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    p = KernelParams.make(1.0, 0.5, 0.05, dtype=jnp.float32)
    windows = make_windows([[0, 1], [2], [3, 4]])
    ref = additive_fastsum_matvec(
        additive_fastsum_build("gaussian", p, X, windows, N=16), x
    )
    out = additive_fastsum_matvec(
        additive_fastsum_build(
            "gaussian", p, X, windows, N=16, table_dtype=jnp.bfloat16
        ),
        x,
    )
    assert rel_err(out, ref) < 2e-2


def test_fastsum_oversampled_coeffs_beat_aliased():
    """The NN=2N-style oversampled coefficient quadrature
    (nfft_interface.c:18-27) beats the direct N-grid (aliased) DFT for
    slowly-decaying spectra."""
    rng = np.random.default_rng(61)
    n = 300
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.2, 0.25, 0.05)
    K = kernel_matrix("matern12", p, X)
    x = jnp.asarray(rng.normal(size=(n,)))
    e_alias = rel_err(
        fastsum_matvec(fastsum_build("matern12", p, X, N=32, oversample=1), x), K @ x
    )
    e_over = rel_err(
        fastsum_matvec(fastsum_build("matern12", p, X, N=32, oversample=2), x), K @ x
    )
    assert e_over < 0.8 * e_alias


@pytest.mark.parametrize(
    "d,N,lfil,tol",
    [
        (2, 32, 32, 8e-3),   # VERDICT #3 target: ~5x below the uncorrected 4e-2
        (1, 64, 16, 3e-3),   # 1-D kink error decays slowly in distance; use N
    ],
)
def test_fastsum_nearfield_corrected_matern12(d, N, lfil, tol):
    """Near-field sparse correction (the eps_I role of NFFT3 fastsum) takes
    Matérn-1/2 below the smooth-kernel tolerance range."""
    rng = np.random.default_rng(31)
    n = 300
    X = jnp.asarray(rng.uniform(size=(n, d)))
    p = KernelParams.make(1.2, 0.25, 0.05)
    K, dK = kernel_matrix_with_grad("matern12", p, X)
    x = jnp.asarray(rng.normal(size=(n,)))
    plan = fastsum_build("matern12", p, X, N=N, nearfield_lfil=lfil)
    assert rel_err(fastsum_matvec(plan, x), K @ x) < tol
    dy = fastsum_grad_matvec(plan, x)
    for j in range(3):
        assert rel_err(dy[j], dK[j] @ x) < 3 * tol, f"grad {j}"
    # still exactly symmetric
    a = jnp.asarray(rng.normal(size=(n,)))
    b = jnp.asarray(rng.normal(size=(n,)))
    np.testing.assert_allclose(
        float(jnp.vdot(a, fastsum_matvec(plan, b))),
        float(jnp.vdot(b, fastsum_matvec(plan, a))),
        rtol=1e-10,
    )


def test_additive_fastsum_nearfield():
    """Per-window near-field corrections compose through the additive mean."""
    rng = np.random.default_rng(67)
    n = 200
    X = jnp.asarray(rng.uniform(size=(n, 4)))
    p = KernelParams.make(1.0, 0.3, 0.05)
    windows = make_windows([[0, 1], [2, 3]])
    K = additive_kernel_matrix("matern12", p, X, windows)
    x = jnp.asarray(rng.normal(size=(n,)))
    # nearfield_lfil=0 disables the (now default-on for matern12) correction
    e0 = rel_err(
        additive_fastsum_matvec(
            additive_fastsum_build(
                "matern12", p, X, windows, N=32, nearfield_lfil=0
            ),
            x,
        ),
        K @ x,
    )
    e1 = rel_err(
        additive_fastsum_matvec(
            additive_fastsum_build(
                "matern12", p, X, windows, N=32, nearfield_lfil=24
            ),
            x,
        ),
        K @ x,
    )
    assert e1 < 0.5 * e0
    assert e1 < 5e-3


def test_nearfield_pattern_precompute_matches():
    """Precomputed KNN patterns give identical plans to the inline path."""
    from nfft4gp_tpu.ops.fastsum import (
        additive_fastsum_coeffs,
        additive_fastsum_geometry,
        additive_nearfield_patterns,
    )

    rng = np.random.default_rng(11)
    n = 150
    X = jnp.asarray(rng.uniform(size=(n, 4)))
    p = KernelParams.make(1.0, 0.3, 0.05)
    windows = make_windows([[0], [1, 2], [2, 3]])
    geom = additive_fastsum_geometry(X, windows, N=16)
    pats = additive_nearfield_patterns("matern12", geom)
    x = jnp.asarray(rng.normal(size=(n,)))
    y_inline = additive_fastsum_matvec(
        additive_fastsum_coeffs("matern12", p, geom), x
    )
    y_pre = additive_fastsum_matvec(
        additive_fastsum_coeffs("matern12", p, geom, nf_patterns=pats), x
    )
    np.testing.assert_allclose(np.asarray(y_pre), np.asarray(y_inline), rtol=1e-12)
