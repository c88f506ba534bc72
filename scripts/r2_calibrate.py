"""Chip calibration + small-block fused sweep (run alone).

1. HBM stream bandwidth (sum of 512 MB).
2. Big-GEMM MXU rate f32-highest / default / bf16.
3. Adjoint-Gram orientations at (102, 2e5, 102).
4. Fused matvec at block 256/512/1024 + vmem report.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)

    def timed(name, f, *args, iters=ITERS, work=None):
        f = jax.jit(f)
        try:
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = (time.perf_counter() - t0) / iters
            extra = ""
            if work:
                extra = f"  ({work/dt/1e9:.0f} G/s)"
            print(f"{name:52s} {dt*1e6:9.1f} us{extra}", flush=True)
        except Exception as e:
            print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

    # 1. HBM stream: chained scaled sums of a 512 MB array
    big = jnp.asarray(rng.normal(size=(128 * 1024 * 1024,)), jnp.float32)  # 512MB
    def stream(big):
        def step(i, c):
            return jnp.sum(big * (1.0 + c * 1e-30)) * 1e-30
        return lax.fori_loop(0, ITERS, step, jnp.float32(0))
    timed("HBM stream sum 512MB", stream, big, work=512e6)

    # 2. big GEMM 2048^3
    A = jnp.asarray(rng.normal(size=(2048, 2048)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(2048, 2048)), jnp.float32)
    for prec in ("highest", "default"):
        def gemm(A, B, _p=prec):
            def step(i, C):
                return jnp.matmul(A + C[0, 0] * 1e-30, B, precision=_p)
            return lax.fori_loop(0, ITERS, step, jnp.zeros_like(A))
        timed(f"GEMM 2048^3 f32 {prec}", gemm, A, B, work=2 * 2048**3)
    Ab, Bb = A.astype(jnp.bfloat16), B.astype(jnp.bfloat16)
    def gemmb(Ab, Bb):
        def step(i, C):
            return jnp.matmul(Ab + C[0, 0].astype(jnp.bfloat16) * 1e-30, Bb,
                              preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return lax.fori_loop(0, ITERS, step, jnp.zeros_like(Ab))
    timed("GEMM 2048^3 bf16", gemmb, Ab, Bb, work=2 * 2048**3)

    # 3. adjoint-Gram orientations at (102, n, 102)
    n = 200_000
    X1 = jnp.asarray(rng.normal(size=(n, 102)), jnp.float32)
    X2 = jnp.asarray(rng.normal(size=(n, 102)), jnp.float32)
    X1t = jnp.asarray(np.asarray(X1).T.copy())
    X2t = jnp.asarray(np.asarray(X2).T.copy())

    def tn(X1, X2):
        def step(i, c):
            M = jnp.matmul((X1 * (1 + c * 1e-30)).T, X2, precision="highest")
            return jnp.sum(M * M) * 1e-30
        return lax.fori_loop(0, ITERS, step, jnp.float32(0))
    timed("Gram TN matmul(A.T, B) from (n,102)", tn, X1, X2, work=204e6 * 4)

    def nn(X1t, X2):
        def step(i, c):
            M = jnp.matmul(X1t * (1 + c * 1e-30), X2, precision="highest")
            return jnp.sum(M * M) * 1e-30
        return lax.fori_loop(0, ITERS, step, jnp.float32(0))
    timed("Gram NN matmul(At, B) (102,n)x(n,102)", nn, X1t, X2, work=204e6 * 4)

    def nt(X1t, X2t):
        def step(i, c):
            M = jax.lax.dot_general(X1t * (1 + c * 1e-30), X2t,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(M * M) * 1e-30
        return lax.fori_loop(0, ITERS, step, jnp.float32(0))
    timed("Gram NT dot_general (102,n)x(102,n)", nt, X1t, X2t, work=204e6 * 4)

    # bf16 TN
    X1b, X2b = X1.astype(jnp.bfloat16), X2.astype(jnp.bfloat16)
    def tnb(X1b, X2b):
        def step(i, c):
            M = jnp.matmul((X1b * (1 + c.astype(jnp.bfloat16) * 1e-30)).T, X2b,
                           preferred_element_type=jnp.float32)
            return jnp.sum(M * M) * 1e-30
        return lax.fori_loop(0, ITERS, step, jnp.float32(0))
    timed("Gram TN bf16 from (n,102)", tnb, X1b, X2b, work=102e6 * 4)

    # 4. fused matvec small blocks
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams, make_windows,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fastsum import (
        additive_fastsum_build, additive_fastsum_matvec_fused,
    )
    d = 10
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    params = KernelParams.make(1.0, 0.5, 0.01, dtype=jnp.float32)
    plan = jax.jit(
        lambda X: additive_fastsum_build("gaussian", params, X, windows, N=32)
    )(X)
    jax.block_until_ready(plan)

    for blk in (256, 512, 1024):
        def mv(plan, v, _b=blk):
            def step(i, x):
                y = additive_fastsum_matvec_fused(plan, x, block=_b)
                return y / jnp.linalg.norm(y)
            return lax.fori_loop(0, ITERS, step, v)
        timed(f"fused matvec block={blk}", mv, plan, v, work=n)

    print("done", flush=True)


if __name__ == "__main__":
    main()
