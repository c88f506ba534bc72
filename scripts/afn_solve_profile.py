"""Per-component timing of the AFN preconditioner apply at scale.

The r4 bench measured the AFN-PCG iteration at ~23 ms vs the bare matvec's
0.5 ms at n=1e5 — this probe times each piece of AfnPrecond.solve (perm
gather, chol solves, K12 GEMVs, FSAI ELL products, unperm scatter) to find
the cost.  Usage: python scripts/afn_solve_profile.py --n 100000
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
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams, make_windows,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fps import fps
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.knn import knn_pattern
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.matops import (
        ell_matvec, ell_rmatvec,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.preconds.afn import (
        AfnPlan, afn_setup_from_plan,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.utils.datasets import (
        expand_perm,
    )

    dtype = jnp.float32
    n, d, k = args.n, args.d, args.rank
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), dtype)
    r = jnp.asarray(rng.normal(size=(n,)), dtype)
    params = KernelParams.make(1.0, 0.5, 0.01, dtype=dtype)
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])

    perm_k = fps(X, k).perm
    perm_a = np.asarray(jax.jit(lambda p: expand_perm(p, n))(perm_k))
    idx, mask = jax.jit(lambda Xv: knn_pattern(Xv, args.lfil))(X[perm_a[k:]])
    aplan = AfnPlan(perm=perm_a, k=k, use_ran=False,
                    pattern=(np.asarray(idx), np.asarray(mask)))
    afn = jax.jit(
        lambda Xv, pp: afn_setup_from_plan("gaussian", pp, Xv, aplan, windows=windows)
    )(X, params)
    jax.block_until_ready(afn.L11)

    iters = args.iters

    def timeit(name, fn, *a):
        wrapped = jax.jit(lambda *aa: jax.lax.fori_loop(
            0, iters, lambda i, acc: fn(*aa[:-1], acc), aa[-1]))
        out = jax.block_until_ready(wrapped(*a))
        t0 = time.perf_counter()
        out = np.asarray(wrapped(*a))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:24s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    hm = lambda a, b: jnp.matmul(a, b, precision="highest")

    # full solve
    timeit("afn.solve", lambda pre, v: pre.solve(v) / jnp.linalg.norm(v), afn, r)
    # components
    timeit("perm gather x[perm]", lambda pre, v: (v[pre.perm])[:n] * 1.00001, afn, r)
    timeit("unperm scatter", lambda pre, v: jnp.zeros_like(v).at[pre.perm].set(v) * 1.00001, afn, r)
    timeit("chol_solve k", lambda pre, v: jnp.concatenate([
        jax.scipy.linalg.solve_triangular(pre.L11, v[:k], lower=True), v[k:]]) * 1.00001, afn, r)
    timeit("K12' gemv", lambda pre, v: jnp.concatenate([
        hm(pre.K12, v[k:]), v[:n-k]]) * 1.00001 if False else jnp.concatenate([hm(pre.K12, v[k:]), jnp.zeros((n - k,), v.dtype)]) * 1.00001, afn, r)
    timeit("fsai ell fwd", lambda pre, v: jnp.concatenate([
        ell_matvec(pre.gs.idx, pre.gs.val, v[k:]), jnp.zeros((k,), v.dtype)]) * 1.00001, afn, r)
    timeit("fsai ell transpose", lambda pre, v: jnp.concatenate([
        ell_rmatvec(pre.gs.idx, pre.gs.val, v[k:]), jnp.zeros((k,), v.dtype)]) * 1.00001, afn, r)


if __name__ == "__main__":
    main()
