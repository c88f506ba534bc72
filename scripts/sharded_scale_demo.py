"""Scale-out demonstration: row-sharded additive-NDFT PCG at large N.

Two modes:
  --mode mesh  : 8 virtual CPU devices (xla_force_host_platform_device_count),
                 points axis row-sharded over the mesh.  The SAME solver and
                 operator code as single-chip runs; XLA inserts psums for
                 Krylov dots and all-reduces the small folded mode tensors
                 (SURVEY.md §2.15).  Verifies the sharded path compiles and
                 converges at N beyond a single host's comfortable dense range.
  --mode tpu   : single real chip, big-N matvec throughput + PCG.

Usage:
  python scripts/sharded_scale_demo.py --mode mesh --n 200000
  python scripts/sharded_scale_demo.py --mode tpu  --n 1000000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="mesh", choices=["mesh", "tpu"])
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--fastsum-N", type=int, default=32)
    ap.add_argument("--mu", type=float, default=0.1)
    ap.add_argument("--rank", type=int, default=200)
    ap.add_argument("--compensated", action="store_true",
                    help="TwoSum float-float dot/norm accumulation in the "
                    "solvers (reference f64 reduction semantics at f32; "
                    "solvers/reductions.py) — needed for deep tolerances "
                    "at N ~ 1e6")
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args()

    if args.mode == "mesh":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )

    import jax

    if args.mode == "mesh":
        jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams,
        make_windows,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fastsum import (
        additive_fastsum_geometry,
        additive_fastsum_coeffs,
        additive_fastsum_matvec,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.pcg import pcg
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.fgmres import fgmres
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.parallel.mesh import (
        make_mesh,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.preconds.nystrom import (
        nystrom_setup,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.utils.datasets import (
        expand_perm,
    )

    n, d = args.n, args.d
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])
    params = KernelParams.make(1.0, 0.5, args.mu, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n,)), jnp.float32)

    if args.mode == "mesh":
        mesh = make_mesh(args.devices)
        X = jax.device_put(X, NamedSharding(mesh, P("points", None)))
        b = jax.device_put(b, NamedSharding(mesh, P("points")))
        print(f"mesh: {args.devices} devices, points axis sharded; n={n}")
    else:
        print(f"single chip ({jax.devices()[0].platform}); n={n}")

    # STAGED build (separate cached jits): the r3 monolithic
    # geometry+coeffs jit took 968 s to compile at N=1e6 on the tunneled
    # backend; the staged form is ~28 s cold / 0.2 s warm (SETUP.md)
    t0 = time.perf_counter()
    geom = jax.block_until_ready(jax.jit(
        lambda Xv: additive_fastsum_geometry(Xv, windows, N=args.fastsum_N)
    )(X))
    plan = jax.block_until_ready(jax.jit(
        lambda g, p: additive_fastsum_coeffs("gaussian", p, g, psd_clip=True)
    )(geom, params))
    t_build = time.perf_counter() - t0

    iters = args.iters

    @jax.jit
    def run_matvecs(plan, v):
        def body(i, y):
            y = y / jnp.linalg.norm(y)
            return additive_fastsum_matvec(plan, y)
        return jax.lax.fori_loop(0, iters, body, v)

    y = np.asarray(run_matvecs(plan, b))
    assert np.isfinite(y).all()
    t0 = time.perf_counter()
    y = np.asarray(run_matvecs(plan, b))
    t_mv = (time.perf_counter() - t0) / iters
    print(f"plan build: {t_build:.2f}s;  matvec: {t_mv*1e3:.2f} ms "
          f"-> {n/t_mv/1e6:.1f} Mpts/s")

    rank = args.rank

    @jax.jit
    def solve(plan, Xv, bv):
        # Nystrom preconditioner: random landmarks (as the library tests use,
        # TEST2 foo1.cpp:208); landmark block replicated (k x k), the tall
        # factor row-sharded like X (SURVEY.md §2.15)
        perm = jax.random.permutation(jax.random.PRNGKey(0), n)[:rank]
        pre = nystrom_setup("gaussian", params, Xv, perm, rank,
                            require_grad=False, windows=windows)
        res = pcg(lambda v: additive_fastsum_matvec(plan, v), bv,
                  precond=pre.solve,
                  tol=args.tol, maxits=iters, compensated=args.compensated)
        # At N ~ 1e6 in f32 the PCG quadratic form p'Ap drops below the
        # matvec noise floor (lambda_max * eps ~ mu) and the breakdown
        # guard freezes; FGMRES tolerates the inexact matvec — the same
        # reason the reference's loss uses it (gp_loss.c:199-213).
        resf = fgmres(lambda v: additive_fastsum_matvec(plan, v), bv,
                      precond=pre.solve, kdim=min(iters, 60),
                      tol=args.tol, maxits=min(iters, 60),
                      compensated=args.compensated)
        return res.x, res.relres, res.niter, resf.relres, resf.niter

    x, relres, its, frelres, fits = jax.block_until_ready(solve(plan, X, b))
    t0 = time.perf_counter()
    x, relres, its, frelres, fits = jax.block_until_ready(solve(plan, X, b))
    t_solve = time.perf_counter() - t0
    if args.mode == "mesh":
        assert x.sharding.spec == P("points"), x.sharding  # stays row-sharded
    print(f"PCG: {int(its)} its, relres {float(relres):.2e} | "
          f"FGMRES: {int(fits)} its, relres {float(frelres):.2e} | "
          f"{t_solve:.2f}s (sharded mode: {args.mode == 'mesh'}, "
          f"compensated: {args.compensated}, tol: {args.tol})")


if __name__ == "__main__":
    main()
