"""Batched TPU experiments — run alone (the tunnel serializes device access).

Logs progressively; each stage is independent so a failure doesn't block the
next.  Usage: nohup python -u scripts/tpu_experiments.py > .tpu_exp.log 2>&1 &
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage(name):
    def deco(fn):
        def wrapped(*a, **kw):
            t0 = time.time()
            print(f"=== {name} start", flush=True)
            try:
                fn(*a, **kw)
                print(f"=== {name} OK ({round(time.time() - t0, 1)}s)", flush=True)
            except Exception:
                print(f"=== {name} FAILED ({round(time.time() - t0, 1)}s)", flush=True)
                traceback.print_exc()
        return wrapped
    return deco


@stage("pallas_block_sweep")
def pallas_sweep():
    import jax
    import jax.numpy as jnp
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.pallas_ndft import (
        fused_window_apply,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fastsum import (
        fastsum_geometry,
        fastsum_coeffs,
        fastsum_base_apply,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams,
    )

    rng = np.random.default_rng(0)
    n, N = 200_000, 32
    X = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
    p = KernelParams.make(1.0, 0.5, 0.01, dtype=jnp.float32)
    geom = jax.jit(lambda Xv: fastsum_geometry(Xv, N))(X)
    plan = jax.jit(lambda g: fastsum_coeffs("gaussian", p, g))(geom)
    alpha = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    xpts, b = geom.x, plan.b

    def timeloop(f, *a, iters=30):
        run = jax.jit(
            lambda *aa: jax.lax.fori_loop(
                0, iters, lambda i, y: f(*aa[:-1], y / jnp.linalg.norm(y)), aa[-1]
            )
        )
        jax.block_until_ready(run(*a))
        t0 = time.perf_counter()
        jax.block_until_ready(run(*a))
        return (time.perf_counter() - t0) / iters

    ft = jax.jit(fastsum_base_apply)
    out2 = jax.block_until_ready(ft(plan, b, alpha))
    tt = timeloop(lambda pl_, y: ft(pl_, pl_.b, y), plan, alpha)
    print(f"table: {tt * 1e3:.2f} ms ({n / tt / 1e6:.1f} Mpts/s)", flush=True)

    for blk in (1024, 512):
        try:
            t0 = time.time()
            fp = jax.jit(lambda xp, a, bb: fused_window_apply(xp, a, bb, N, block=blk))
            out = jax.block_until_ready(fp(xpts, alpha, b))
            print(f"block={blk} compile+run {round(time.time() - t0, 1)}s", flush=True)
            err = float(jnp.linalg.norm(out - out2) / jnp.linalg.norm(out2))
            tp = timeloop(lambda xp, bb, y: fp(xp, y, bb), xpts, b, alpha)
            print(
                f"block={blk}: pallas {tp * 1e3:.2f} ms ({n / tp / 1e6:.1f} Mpts/s), "
                f"rel err {err:.2e}",
                flush=True,
            )
            break
        except Exception as e:
            print(f"block={blk} failed: {str(e)[:200]}", flush=True)


@stage("entry_compile")
def entry_compile():
    import jax
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(jfn(*args))
    print(
        f"entry compile+run {round(time.time() - t0, 1)}s; loss {float(out[0]):.6f}",
        flush=True,
    )
    t0 = time.time()
    out = jax.block_until_ready(jfn(*args))
    print(f"entry steady {round(time.time() - t0, 3)}s", flush=True)


@stage("bench")
def bench():
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True, timeout=2400
    )
    print("bench stdout:", r.stdout.strip(), flush=True)
    if r.returncode != 0:
        print("bench stderr:", r.stderr[-500:], flush=True)


if __name__ == "__main__":
    pallas_sweep()
    entry_compile()
    bench()
    print("=== ALL EXPERIMENTS DONE", flush=True)
