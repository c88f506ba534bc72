"""Stream-kernel block-size sweep (VERDICT r3 #4: close to the byte floor).

The streamed packed-table matvec at n=2e5 measured 476 us vs its 313 us
bf16-table byte floor (66%).  One suspected overhead is the grid granularity
(block=2048 -> 98 grid steps/pass); this sweep measures block in
{2048, 4096, 8192, 16384} plus the upcast on/off variants.

Usage: python scripts/block_probe.py [--n 200000] [--json OUT]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams, make_windows,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs

    n, d = args.n, args.d
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])
    params = KernelParams.make(1.0, 0.5, 0.01, dtype=jnp.float32)
    plan = jax.jit(
        lambda Xv: fs.additive_fastsum_build("gaussian", params, Xv, windows, N=32)
    )(X)

    out = {"n": n, "d": d, "rows": []}
    for block in (2048, 4096, 8192, 16384):
        for upcast in (True, False):
            pn = jax.jit(
                lambda pl_: fs.packed_ndft_plan(pl_, table_dtype=jnp.bfloat16,
                                                block=block)
            )(plan)
            mv = lambda p_, x_: fs.packed_ndft_matvec(
                p_, x_, prec="default", upcast=upcast)
            run = jax.jit(lambda p_, x_: jax.lax.fori_loop(
                0, args.iters, lambda i, y: mv(p_, y / jnp.linalg.norm(y)), x_))
            try:
                y = np.asarray(run(pn, v))
                t0 = time.perf_counter()
                y = np.asarray(run(pn, v))
                dt = (time.perf_counter() - t0) / args.iters
                row = {"block": block, "upcast": upcast,
                       "us": round(dt * 1e6, 1),
                       "mpts_s": round(n / dt / 1e6, 1)}
            except Exception as e:
                row = {"block": block, "upcast": upcast,
                       "error": f"{type(e).__name__}: {str(e)[:90]}"}
            out["rows"].append(row)
            print(row, flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
