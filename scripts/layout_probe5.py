"""Final layout shootout at iters=500 (amortizes the ~40ms call overhead):
full-table (current), folded point-minor, folded mode-minor, bf16 folded."""

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
    W = 5
    N = 32
    P2 = 2 * (N // 2 + 1)  # 34
    iters = 500
    rng = np.random.default_rng(0)
    alpha = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    Ecs = jnp.asarray(rng.normal(size=(W, 2, n, 2 * N)), jnp.float32)   # full tables
    Bf = jnp.asarray(rng.normal(size=(W, N, N)), jnp.float32)
    Tp = jnp.asarray(rng.normal(size=(W, 2, P2, n)), jnp.float32)       # folded (2P, n)
    Tm = jnp.asarray(rng.normal(size=(W, 2, n, P2)), jnp.float32)       # folded (n, 2P)
    Bq = jnp.asarray(rng.normal(size=(W, P2, P2)), jnp.float32)
    Tpb = Tp.astype(jnp.bfloat16)

    def loop(body, *consts):
        @jax.jit
        def fn(a, *cs):
            def step(i, acc):
                y = body(acc, *cs)
                return y * (1.0 / (1e-30 + jnp.max(jnp.abs(y))))
            return jax.lax.fori_loop(0, iters, step, a)
        return lambda: fn(alpha, *consts)

    def full_tables(a, E, B):
        def one(Ew, Bw):
            Acat = Ew[0] * a[:, None]
            M = jnp.matmul(Acat.T, Ew[1], precision="highest")
            re = M[:N, :N] - M[N:, N:]
            im = M[:N, N:] + M[N:, :N]
            Cre, Cim = Bw * re, Bw * im
            RHS = jnp.concatenate(
                [jnp.concatenate([Cre, Cim], axis=1),
                 jnp.concatenate([Cim, -Cre], axis=1)], axis=0)
            T = jnp.matmul(Ew[0], RHS, precision="highest")
            return jnp.sum(T * Ew[1], axis=1)
        return jnp.sum(jax.vmap(one)(E, B), axis=0)

    def folded_pm(a, T, B):
        def one(Tw, Bw):
            M = jax.lax.dot_general(
                Tw[0] * a[None, :], Tw[1],
                dimension_numbers=(((1,), (1,)), ((), ())), precision="highest")
            Tt = jnp.matmul((Bw * M).T, Tw[0], precision="highest")
            return jnp.sum(Tt * Tw[1], axis=0)
        return jnp.sum(jax.vmap(one)(T, B), axis=0)

    def folded_mm(a, T, B):
        def one(Tw, Bw):
            M = jnp.matmul((Tw[0] * a[:, None]).T, Tw[1], precision="highest")
            Tt = jnp.matmul(Tw[0], Bw * M, precision="highest")
            return jnp.sum(Tt * Tw[1], axis=1)
        return jnp.sum(jax.vmap(one)(T, B), axis=0)

    def folded_pm_bf16(a, T, B):
        def one(Tw, Bw):
            M = jax.lax.dot_general(
                Tw[0] * a.astype(jnp.bfloat16)[None, :], Tw[1],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            Tt = jnp.matmul((Bw * M).astype(jnp.bfloat16).T, Tw[0],
                            preferred_element_type=jnp.float32)
            return jnp.sum(Tt * Tw[1].astype(jnp.float32), axis=0)
        return jnp.sum(jax.vmap(one)(T, B), axis=0)

    cases = [
        ("full tables (current)", loop(full_tables, Ecs, Bf)),
        ("folded point-minor   ", loop(folded_pm, Tp, Bq)),
        ("folded mode-minor    ", loop(folded_mm, Tm, Bq)),
        ("folded pm bf16       ", loop(folded_pm_bf16, Tpb, Bq)),
    ]
    for name, fn in cases:
        y = np.asarray(fn())
        t0 = time.perf_counter()
        y = np.asarray(fn())
        t1 = time.perf_counter()
        per = (t1 - t0) / iters
        print(f"{name}: {per*1e3:.3f} ms/matvec -> {n/per/1e6:.1f} Mpts/s (sum={y.sum():.3e})")


if __name__ == "__main__":
    main()
