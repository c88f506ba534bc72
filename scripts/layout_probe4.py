"""Is the ~0.8ms/iter floor a per-loop-step runtime cost? Test unrolling."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    n = 200_000
    a0 = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    body = lambda acc: acc * 1.0000001 + 1e-9

    def time_fn(name, fn, iters):
        y = np.asarray(fn(a0))
        t0 = time.perf_counter()
        y = np.asarray(fn(a0))
        t1 = time.perf_counter()
        print(f"{name}: {(t1-t0)/iters*1e3:.4f} ms/it total={t1-t0:.3f}s (sum={y.sum():.3e})")

    for iters, unroll in [(50, 1), (500, 1), (50, 10), (500, 10), (500, 50)]:
        @jax.jit
        def fn(a, it=iters, u=unroll):
            return jax.lax.fori_loop(0, it, lambda i, acc: body(acc), a, unroll=u)
        time_fn(f"fori iters={iters:4d} unroll={unroll:2d}", fn, iters)

    @jax.jit
    def chain(a):
        for _ in range(50):
            a = body(a)
        return a
    time_fn("python-unrolled chain 50   ", chain, 50)


if __name__ == "__main__":
    main()
