"""Component profile of the GP loss step at n=1e5 (VERDICT r3 #3).

Times, on-chip, each piece of models/gp.gp_loss for the flagship additive
fastsum problem: FGMRES solve alone, SLQ alone, the precond setup alone,
batched probe matvec alone, and the full loss with precond none/nystrom —
to attribute the ~31 ms loss step (r3) to its real bound.

Usage: python scripts/loss_profile.py [--n 100000] [--json OUT]
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--nvecs", type=int, default=10)
    ap.add_argument("--maxits", type=int, default=10)
    ap.add_argument("--rank", type=int, default=50)
    ap.add_argument("--reps", type=int, default=20)
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
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.models.gp import (
        GPConfig, gp_loss,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.models.problem import (
        _stream_ops,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.preconds.nystrom import (
        nystrom_setup,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.fgmres import fgmres
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.lanczos import (
        slq_logdet, rademacher_probes,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.utils.datasets import (
        rand_perm,
    )

    n, d = args.n, args.d
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])
    params = KernelParams.make(1.0, 0.5, 0.1, dtype=jnp.float32)
    probes = rademacher_probes(jax.random.PRNGKey(1), args.nvecs, n, dtype=jnp.float32)
    tdt = jnp.bfloat16

    geom = jax.jit(lambda Xv: fs.additive_fastsum_geometry(Xv, windows, table_dtype=tdt))(X)
    perm = np.asarray(rand_perm(jax.random.PRNGKey(0), n, args.rank))

    out = {"n": n, "d": d, "nvecs": args.nvecs, "maxits": args.maxits,
           "rank": args.rank, "rows": {}}
    reps = args.reps

    def bench(name, make_fn, *arrs):
        fn = jax.jit(make_fn)
        jax.block_until_ready(fn(*arrs))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*arrs)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps * 1e3
        out["rows"][name] = round(dt, 3)
        print(f"{name:28s} {dt:8.2f} ms", flush=True)

    def build_stream(g, p):
        plan = fs.additive_fastsum_coeffs("gaussian", p, g)
        return _stream_ops(plan, tdt)

    # coeffs+packed-plan build alone
    bench("coeffs+plan build", lambda g, p: jax.tree_util.tree_map(
        lambda x: x, fs.packed_ndft_plan(
            fs.additive_fastsum_coeffs("gaussian", p, g), table_dtype=tdt)
    ).w2[0], geom, params)

    # single-RHS matvec / batched probe matvec
    def mv_once(g, p, v):
        mv, _ = build_stream(g, p)
        return mv(v)

    bench("matvec single", mv_once, geom, params, y)

    def mv_batch(g, p, Z):
        mv, _ = build_stream(g, p)
        return jax.vmap(mv)(Z)

    bench(f"matvec batch x{args.nvecs}", mv_batch, geom, params, probes)

    # FGMRES solve alone (kdim = 2*maxits, the loss setting)
    def fg(g, p, yy):
        mv, _ = build_stream(g, p)
        return fgmres(mv, yy, kdim=2 * args.maxits, maxits=2 * args.maxits,
                      tol=1e-6).x

    bench("fgmres 2*maxits", fg, geom, params, y)

    # SLQ alone (no precond)
    def slq(g, p, Z):
        mv, dmv = build_stream(g, p)
        r = slq_logdet(mv, dmv, Z, maxits=args.maxits)
        return r.logdet, r.dlogdet

    bench("slq (no precond)", slq, geom, params, probes)

    # nystrom setup alone (require_grad as the loss uses)
    def nys(Xv, p, pm):
        return nystrom_setup("gaussian", p, Xv, pm, args.rank,
                             require_grad=True, windows=windows).U

    bench("nystrom setup (grad)", nys, X, params, jnp.asarray(perm))

    # eigh of the SLQ tridiagonals (nvecs batched maxits x maxits)
    T = jnp.asarray(rng.normal(size=(args.nvecs, args.maxits, args.maxits)), jnp.float32)
    T = T + jnp.swapaxes(T, 1, 2)
    bench("batched eigh (nvecs,m,m)", lambda Tv: jnp.linalg.eigh(Tv)[0], T)

    # full loss none / nystrom
    cfg = GPConfig(kind="gaussian", maxits=args.maxits, nvecs=args.nvecs, tol=1e-6)
    raw = jnp.asarray([0.5, -0.5, -2.0], jnp.float32)

    def loss_none(rw, g, yy, Z):
        return gp_loss(rw, yy, lambda p: build_stream(g, p), Z, cfg, None).loss

    bench("gp_loss precond=none", loss_none, raw, geom, y, probes)

    def loss_nys(rw, g, Xv, yy, Z, pm):
        setup = lambda p: nystrom_setup("gaussian", p, Xv, pm, args.rank,
                                        require_grad=True, windows=windows)
        return gp_loss(rw, yy, lambda p: build_stream(g, p), Z, cfg, setup).loss

    bench("gp_loss precond=nystrom", loss_nys, raw, geom, X, y, probes,
          jnp.asarray(perm))

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
