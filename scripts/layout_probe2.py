"""Decompose the additive-NDFT matvec cost on the real chip.

Times fori_loop bodies of increasing content to find the floor:
(a) normalize only, (b) 1 window adjoint only, (c) 1 window adjoint+forward,
(d) 5 windows full, (e) 5 windows full in bf16 tables / f32 accum.
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

    n = 200_000
    P2 = 34
    W = 5
    iters = 50
    rng = np.random.default_rng(0)
    alpha = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    Tp = jnp.asarray(rng.normal(size=(W, 2, P2, n)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(W, P2, P2)), jnp.float32)
    Tb = Tp.astype(jnp.bfloat16)

    def loop(body):
        @jax.jit
        def fn(T, B, a):
            def step(i, acc):
                y = body(T, B, acc)
                return y / jnp.linalg.norm(y)
            return jax.lax.fori_loop(0, iters, step, a)
        return fn

    def norm_only(T, B, a):
        return a + 1e-6

    def adj1(T, B, a):
        Tw = T[0]
        M = jax.lax.dot_general(
            Tw[0] * a[None, :], Tw[1],
            dimension_numbers=(((1,), (1,)), ((), ())), precision="highest",
        )
        return a + jnp.sum(M) * 1e-12

    def win1(T, B, a):
        Tw, Bw = T[0], B[0]
        M = jax.lax.dot_general(
            Tw[0] * a[None, :], Tw[1],
            dimension_numbers=(((1,), (1,)), ((), ())), precision="highest",
        )
        Tt = jnp.matmul((Bw * M).T, Tw[0], precision="highest")
        return jnp.sum(Tt * Tw[1], axis=0)

    def full5(T, B, a):
        def one(Tw, Bw):
            M = jax.lax.dot_general(
                Tw[0] * a[None, :], Tw[1],
                dimension_numbers=(((1,), (1,)), ((), ())), precision="highest",
            )
            Tt = jnp.matmul((Bw * M).T, Tw[0], precision="highest")
            return jnp.sum(Tt * Tw[1], axis=0)
        return jnp.sum(jax.vmap(one)(T, B), axis=0)

    def full5_bf16(T, B, a):
        def one(Tw, Bw):
            M = jax.lax.dot_general(
                Tw[0] * a.astype(jnp.bfloat16)[None, :], Tw[1],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            Tt = jnp.matmul((Bw * M).astype(jnp.bfloat16).T, Tw[0],
                            preferred_element_type=jnp.float32)
            return jnp.sum(Tt * Tw[1].astype(jnp.float32), axis=0)
        return jnp.sum(jax.vmap(one)(T, B), axis=0)

    cases = [
        ("norm-only     ", loop(norm_only), (Tp, B, alpha)),
        ("1w adjoint    ", loop(adj1), (Tp, B, alpha)),
        ("1w adj+fwd    ", loop(win1), (Tp, B, alpha)),
        ("5w full       ", loop(full5), (Tp, B, alpha)),
        ("5w bf16 tables", loop(full5_bf16), (Tb, B, alpha)),
    ]
    for name, fn, args in cases:
        y = np.asarray(fn(*args))
        t0 = time.perf_counter()
        y = np.asarray(fn(*args))
        t1 = time.perf_counter()
        per = (t1 - t0) / iters
        print(f"{name}: {per*1e3:.3f} ms/it -> {n/per/1e6:.1f} Mpts/s  (sum={y.sum():.3e})")


if __name__ == "__main__":
    main()
