"""Probe TPU HBM layout padding + candidate folded-NDFT layouts.

Answers two questions that decide the folded-table orientation:
1. Does a (n, 34)/(n, 64) f32 array occupy padded (n, 128) bytes in HBM?
   (memory_stats delta after device_put)
2. Which orientation of the folded adjoint+forward pair is fastest:
   mode-minor (n, 2P) vs point-minor (2P, n)?
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dev = jax.devices()[0]
    n = 200_000

    stats = dev.memory_stats()
    if stats:  # unavailable through the axon tunnel; timing decides instead
        print("memory_stats available:", {k: stats[k] for k in list(stats)[:3]})

    # --- timing: folded window apply in both orientations, 5 windows d=2 ---
    P2 = 34  # 2 * (N//2 + 1) at N=32
    W = 5
    iters = 50
    rng = np.random.default_rng(0)
    alpha = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    # mode-minor: tables (W, 2, n, 2P)
    Tm = jnp.asarray(rng.normal(size=(W, 2, n, P2)), jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(W, P2, P2)), jnp.float32)

    @jax.jit
    def apply_mode_minor(T, B, a):
        def body(i, acc):
            def one(Tw, Bw):
                M = jnp.matmul((Tw[0] * acc[:, None]).T, Tw[1], precision="highest")
                Tt = jnp.matmul(Tw[0], Bw + M, precision="highest")
                return jnp.sum(Tt * Tw[1], axis=1)
            y = jnp.sum(jax.vmap(one)(T, B), axis=0)
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, iters, body, a)

    # point-minor: tables (W, 2, 2P, n)
    Tp = jnp.asarray(rng.normal(size=(W, 2, P2, n)), jnp.float32)

    @jax.jit
    def apply_point_minor(T, B, a):
        def body(i, acc):
            def one(Tw, Bw):
                M = jax.lax.dot_general(
                    Tw[0] * acc[None, :], Tw[1],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision="highest",
                )
                Tt = jnp.matmul((Bw + M).T, Tw[0], precision="highest")
                return jnp.sum(Tt * Tw[1], axis=0)
            y = jnp.sum(jax.vmap(one)(T, B), axis=0)
            return y / jnp.linalg.norm(y)
        return jax.lax.fori_loop(0, iters, body, a)

    for name, fn, args in [
        ("mode-minor  (n,2P)", apply_mode_minor, (Tm, Bm, alpha)),
        ("point-minor (2P,n)", apply_point_minor, (Tp, Bm, alpha)),
    ]:
        y = np.asarray(fn(*args))  # warm-up + force full round-trip
        t0 = time.perf_counter()
        y = np.asarray(fn(*args))
        t1 = time.perf_counter()
        per = (t1 - t0) / iters
        print(f"{name}: sum={y.sum():.3e} {per*1e3:.3f} ms/matvec -> {n/per/1e6:.1f} Mpts/s")


if __name__ == "__main__":
    main()
