"""Fused packed-NDFT vs table path on the real chip (bench.py methodology:
vector-chained fori_loop so nothing hoists).  Run alone."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PTS = int(os.environ.get("NPTS", 200_000))
ITERS = int(os.environ.get("ITERS", 200))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams, make_windows,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fastsum import (
        additive_fastsum_build,
        additive_fastsum_matvec,
        additive_fastsum_grad_matvec,
        additive_fastsum_matvec_fused,
        additive_fastsum_grad_matvec_fused,
    )

    n, d = N_PTS, 10
    rng = np.random.default_rng(0)
    dtype = jnp.float32
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])
    X = jnp.asarray(rng.uniform(size=(n, d)), dtype)
    v = jnp.asarray(rng.normal(size=(n,)), dtype)
    params = KernelParams.make(1.0, 0.5, 0.01, dtype=dtype)

    plan = jax.jit(
        lambda X: additive_fastsum_build("gaussian", params, X, windows, N=32)
    )(X)
    jax.block_until_ready(plan)

    def chain(mv):
        def f(plan, v):
            def step(i, x):
                y = mv(plan, x)
                return y / jnp.linalg.norm(y)
            return lax.fori_loop(0, ITERS, step, v)
        return f

    def timeit(name, mv, *, iters_scale=1.0):
        f = jax.jit(chain(mv))
        t0 = time.perf_counter()
        out = f(plan, v)
        np.asarray(out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = f(plan, v)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:44s} {dt*1e6:9.1f} us/mv  {n/dt/1e6:8.1f} Mpts/s  (compile {tc:.1f}s)  finite={bool(jnp.isfinite(out).all())}", flush=True)
        return dt

    timeit("table matvec", additive_fastsum_matvec)
    for blk in (1024, 2048, 4096):
        timeit(f"fused matvec block={blk}",
               lambda p_, x_, _b=blk: additive_fastsum_matvec_fused(p_, x_, block=_b))

    # grad matvecs (3-output): chain through the sum of rows
    def grad_chain(gmv):
        def mv(plan, x):
            dy = gmv(plan, x)
            return dy[0] + 0.5 * dy[1] + 0.25 * dy[2]
        return mv

    timeit("table grad matvec", grad_chain(additive_fastsum_grad_matvec))
    timeit("fused grad matvec block=2048",
           grad_chain(lambda p_, x_: additive_fastsum_grad_matvec_fused(p_, x_, block=2048)))

    # accuracy cross-check on-chip
    y_t = jax.jit(additive_fastsum_matvec)(plan, v)
    y_f = jax.jit(lambda p_, x_: additive_fastsum_matvec_fused(p_, x_, block=2048))(plan, v)
    err = float(jnp.linalg.norm(y_t - y_f) / jnp.linalg.norm(y_t))
    print(f"fused-vs-table relerr on chip: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
