"""Round-2 probe: MXU cost model for the fused-NDFT design space.

Times the candidate GEMM shapes of the packed fused-phase NDFT on the real
chip (one process owns the tunnel; run alone):

  adjoint:  (M, n) x (n, M)     M in {34, 102, 104, 128, 170, 256}
  forward:  (n, K) x (K, K)     K in {34, 102, 128, 170, 256}
  M-granularity: (M, n) x (n, 128) for M in {8, 34, 40, 128}
  precisions: f32 default / high ("bf16_3x") / highest, bf16 operands

plus VPU phase-generation costs (direct cos/sin vs Chebyshev recurrence) and
the XLA-only "recompute tables each matvec" variant.

Usage: nohup python -u scripts/r2_probe_shapes.py > .r2_probe.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PTS = 200_000
ITERS = 300


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    n = N_PTS

    def timeit(name, fn, *args):
        try:
            f = jax.jit(fn)
            out = f(*args)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = f(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{name:58s} {dt*1e6:10.1f} us", flush=True)
            return dt
        except Exception as e:
            print(f"{name:58s} FAILED: {type(e).__name__} {e}", flush=True)
            return None

    def loop(body, init):
        def fn(*args):
            def step(i, c):
                return body(c, *args)
            return lax.fori_loop(0, ITERS, step, init(*args))
        return fn

    # ---- adjoint shapes: (M, n) @ (n, M), accumulate scalar to keep alive
    print("== adjoint (M,n)x(n,M) f32, precision sweep ==", flush=True)
    for M in (34, 102, 104, 128, 170, 256):
        A = jnp.asarray(rng.normal(size=(n, M)), jnp.float32)
        B = jnp.asarray(rng.normal(size=(n, M)), jnp.float32)
        for prec in ("default", "high", "highest"):
            def body(c, A, B, _p=prec):
                r = jnp.matmul(A.T, B + c, precision=_p)
                return jnp.sum(r * r) * 1e-30
            timeit(f"adj M={M} f32 {prec}", loop(body, lambda A, B: jnp.float32(0)), A, B)
        Ab = A.astype(jnp.bfloat16)
        Bb = B.astype(jnp.bfloat16)
        def body(c, Ab, Bb):
            r = jnp.matmul(Ab.T, Bb + c.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return jnp.sum(r * r) * 1e-30
        timeit(f"adj M={M} bf16", loop(body, lambda A, B: jnp.float32(0)), Ab, Bb)

    # ---- M-granularity: (M, n) @ (n, 128)
    print("== M-granularity (M,n)x(n,128) f32 highest ==", flush=True)
    B128 = jnp.asarray(rng.normal(size=(n, 128)), jnp.float32)
    for M in (8, 34, 40, 64, 128):
        A = jnp.asarray(rng.normal(size=(n, M)), jnp.float32)
        def body(c, A, B128):
            r = jnp.matmul(A.T, B128 + c, precision="highest")
            return jnp.sum(r * r) * 1e-30
        timeit(f"Mgran M={M}", loop(body, lambda A, B: jnp.float32(0)), A, B128)

    # ---- forward shapes: (n, K) @ (K, K)
    print("== forward (n,K)x(K,K) precision sweep ==", flush=True)
    for K in (34, 102, 128, 170, 256):
        A = jnp.asarray(rng.normal(size=(n, K)), jnp.float32)
        W = jnp.asarray(rng.normal(size=(K, K)), jnp.float32)
        for prec in ("default", "high", "highest"):
            def body(c, A, W, _p=prec):
                r = jnp.matmul(A, W + c, precision=_p)
                return jnp.sum(r * r) * 1e-30
            timeit(f"fwd K={K} f32 {prec}", loop(body, lambda A, W: jnp.float32(0)), A, W)
        Ab = A.astype(jnp.bfloat16)
        Wb = W.astype(jnp.bfloat16)
        def body(c, Ab, Wb):
            r = jnp.matmul(Ab, Wb + c.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            return jnp.sum(r * r) * 1e-30
        timeit(f"fwd K={K} bf16", loop(body, lambda A, W: jnp.float32(0)), Ab, Wb)

    # ---- VPU: transcendental and recurrence costs on (n, C) arrays
    print("== VPU phase generation ==", flush=True)
    for C in (34, 170, 340):
        X = jnp.asarray(rng.uniform(size=(n, C)), jnp.float32)
        def body(c, X):
            r = jnp.cos(X + c) + jnp.sin(X + c)
            return jnp.sum(r * r) * 1e-30
        timeit(f"cos+sin (n,{C})", loop(body, lambda X: jnp.float32(0)), X)

    # Chebyshev recurrence c_p = 2 c1 c_{p-1} - c_{p-2} over 16 steps, (n, 10)
    X10 = jnp.asarray(rng.uniform(size=(n, 16)), jnp.float32)
    def body(c, X10):
        c1 = jnp.cos(X10 + c)
        s1 = jnp.sin(X10 + c)
        cm2, cm1 = jnp.ones_like(c1), c1
        sm2, sm1 = jnp.zeros_like(s1), s1
        acc = c1
        for _ in range(15):
            cn = 2 * c1 * cm1 - cm2
            sn = 2 * c1 * sm1 - sm2
            cm2, cm1 = cm1, cn
            sm2, sm1 = sm1, sn
            acc = acc + cn + sn
        return jnp.sum(acc * acc) * 1e-30
    timeit("chebyshev 16-step (n,16)", loop(body, lambda X: jnp.float32(0)), X10)

    # ---- XLA-only fused variant: regenerate tables + folded matvec, 5 windows
    print("== XLA-only fused additive matvec (5 x 2-D windows) ==", flush=True)
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fastsum import (
        additive_fastsum_build, additive_fastsum_matvec,
        _folded_adjoint, _folded_forward, _folded_combine,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams, make_windows,
    )

    d = 10
    NMODE = 32
    P2 = NMODE // 2 + 1
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    params = KernelParams.make(1.0, 0.5, 0.01, dtype=jnp.float32)
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])

    plan = jax.jit(
        lambda X: additive_fastsum_build("gaussian", params, X, windows, N=NMODE)
    )(X)
    jax.block_until_ready(plan)

    def table_mv(c, plan, v):
        return jnp.sum(jnp.square(additive_fastsum_matvec(plan, v + c))) * 1e-30
    timeit("baseline table matvec", loop(table_mv, lambda p, v: jnp.float32(0)), plan, v)

    # regenerate-tables variant: x (5, 2, n) scaled coords -> tables -> folded apply
    xs = jnp.stack([plan.groups[0][2].geom.x[w].T for w in range(5)])  # (5, 2, n)
    Wfold = plan.groups[0][2].w  # (5, nS, P, P)
    pvec = jnp.arange(P2, dtype=jnp.float32)

    def regen_mv(c, xs, Wfold, v):
        def one(xw, Ww):
            ph = 2 * jnp.pi * xw[:, :, None] * pvec[None, None, :]   # (2, n, P)
            Tcs = jnp.concatenate([jnp.cos(ph), jnp.sin(ph)], axis=2)
            A = _folded_adjoint(Tcs, v + c)
            return _folded_forward(Tcs, _folded_combine(Ww, A, 2))
        ys = jax.vmap(one)(xs, Wfold)
        return jnp.sum(ys * ys) * 1e-30
    timeit("XLA regen-tables matvec", loop(regen_mv, lambda *a: jnp.float32(0)), xs, Wfold, v)

    print("done", flush=True)


if __name__ == "__main__":
    main()
