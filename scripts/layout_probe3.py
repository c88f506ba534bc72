"""Isolate the 0.85 ms/iter fori_loop floor seen in layout_probe2."""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    iters = 50
    rng = np.random.default_rng(0)

    def run(name, n, body):
        a0 = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

        @jax.jit
        def fn(a):
            return jax.lax.fori_loop(0, iters, lambda i, acc: body(acc), a)

        y = np.asarray(fn(a0))
        t0 = time.perf_counter()
        y = np.asarray(fn(a0))
        t1 = time.perf_counter()
        print(f"{name}: {(t1-t0)/iters*1e3:.3f} ms/it (sum={y.sum():.3e})")

    run("n=200k scale-const      ", 200_000, lambda a: a * 1.0000001)
    run("n=200k vdot->scalar mul ", 200_000, lambda a: a * (1.0 / (jnp.vdot(a, a) + 1.0)))
    run("n=200k norm divide      ", 200_000, lambda a: a / jnp.linalg.norm(a))
    run("n=2048 norm divide      ", 2_048, lambda a: a / jnp.linalg.norm(a))
    run("n=200k two reductions   ", 200_000,
        lambda a: a * (1.0 / (jnp.vdot(a, a) + 1.0)) + jnp.sum(a) * 1e-12)


if __name__ == "__main__":
    main()
