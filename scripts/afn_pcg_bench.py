"""AFN-PCG time-to-tolerance at scale — BASELINE.json configs 2-3.

Builds a synthetic additive-kernel problem (N points, d dims, 2-feature
windows), the Fourier fastsum operator, and compares PCG convergence with no
preconditioner / Nyström / AFN: iterations and wall time to rel-res 1e-6.

Usage: python scripts/afn_pcg_bench.py [--n 100000] [--d 10] [--rank 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--rank", type=int, default=200)
    ap.add_argument("--lfil", type=int, default=16)
    ap.add_argument("--l", type=float, default=0.5)
    ap.add_argument("--mu", type=float, default=0.01)
    ap.add_argument("--tol", type=float, default=1e-3)  # f32-attainable (f64 path reaches 1e-6)
    ap.add_argument("--maxits", type=int, default=400)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams,
        make_windows,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fastsum import (
        additive_fastsum_build,
        additive_fastsum_matvec,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fps import fps
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.preconds.afn import (
        AfnPlan,
        afn_setup_from_plan,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.preconds.nystrom import (
        nystrom_setup,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.knn import knn_pattern
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.pcg import pcg
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.utils.datasets import (
        expand_perm,
        rand_perm,
    )

    dtype = jnp.float32
    n, d = args.n, args.d
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), dtype)
    b = jnp.asarray(rng.normal(size=(n,)), dtype)
    params = KernelParams.make(1.0, args.l, args.mu, dtype=dtype)
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])

    print(f"n={n} d={d} rank={args.rank} lfil={args.lfil} l={args.l} mu={args.mu}",
          flush=True)

    t0 = time.time()
    plan = jax.jit(lambda Xv: additive_fastsum_build("gaussian", params, Xv, windows, psd_clip=True))(X)
    mv = jax.jit(lambda pl_, v: additive_fastsum_matvec(pl_, v))
    jax.block_until_ready(mv(plan, b))
    print(f"fastsum plan+compile {time.time() - t0:.1f}s", flush=True)

    def solve(name, precond):
        run = jax.jit(
            lambda pl_, bb, pre: pcg(
                lambda v: additive_fastsum_matvec(pl_, v), bb,
                precond=(pre.solve if pre is not None else None),
                tol=args.tol, maxits=args.maxits,
            ),
            static_argnames=(),
        )
        if precond is None:
            run = jax.jit(
                lambda pl_, bb: pcg(
                    lambda v: additive_fastsum_matvec(pl_, v), bb,
                    tol=args.tol, maxits=args.maxits,
                )
            )
            res = jax.block_until_ready(run(plan, b))   # compile
            t0 = time.time()
            res = jax.block_until_ready(run(plan, b))
        else:
            res = jax.block_until_ready(run(plan, b, precond))
            t0 = time.time()
            res = jax.block_until_ready(run(plan, b, precond))
        dt = time.time() - t0
        print(
            f"{name:12s} | iters {int(res.niter):4d} | relres {float(res.relres):.2e}"
            f" | solve {dt:.2f}s | converged {bool(res.converged)}",
            flush=True,
        )

    solve("none", None)

    t0 = time.time()
    perm = expand_perm(rand_perm(jax.random.PRNGKey(7), n, args.rank), n)
    nys = jax.jit(
        lambda Xv, pp: nystrom_setup("gaussian", pp, Xv, perm, args.rank, windows=windows)
    )(X, params)
    jax.block_until_ready(nys.U)
    print(f"nystrom setup {time.time() - t0:.1f}s", flush=True)
    solve("nystrom", nys)

    t0 = time.time()
    perm_k = fps(X, args.rank).perm
    perm_a = np.asarray(expand_perm(perm_k, n))
    X2 = X[perm_a[args.rank:]]
    idx, mask = knn_pattern(X2, args.lfil)
    aplan = AfnPlan(perm=perm_a, k=args.rank, use_ran=False,
                    pattern=(np.asarray(idx), np.asarray(mask)))
    afn = jax.jit(
        lambda Xv, pp: afn_setup_from_plan("gaussian", pp, Xv, aplan, windows=windows)
    )(X, params)
    jax.block_until_ready(afn.L11)
    print(f"afn setup {time.time() - t0:.1f}s", flush=True)
    solve("afn", afn)


if __name__ == "__main__":
    main()
