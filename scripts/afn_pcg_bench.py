"""AFN-PCG time-to-tolerance at scale — BASELINE.json configs 2-3 and the
north-star "AFN-PCG time-to-tol at N=1e5-1e6" metric.

Builds a synthetic additive-kernel problem (N points, d dims, 2-feature
windows), the Fourier fastsum operator, and compares PCG + FGMRES
convergence with no preconditioner / Nyström / AFN.  Reports, per
preconditioner: setup time, per-iteration time, the full relative-residual
history, and the time/iterations to cross each tolerance decade — the
committed artifact is the JSON (--json).

f32 TPU runs hit an operator-noise floor (the fastsum matvec accumulates n
terms in f32; the Nyström/AFN solve amplifies projector noise by 1/eta =
1/(mu f^2)) — the reference runs f64 CPU where this is absent (pcg.c is
double).  Use --platform cpu --x64 for the deep-tolerance parity backstop.

Usage:
  python scripts/afn_pcg_bench.py --n 100000 --d 10 --json AFN_PCG_1e5.json
  python scripts/afn_pcg_bench.py --n 20000 --kernel matern32 --operator dense
  python scripts/afn_pcg_bench.py --n 50000 --platform cpu --x64 --tol 1e-6
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DECADES = (1e-1, 1e-2, 1e-3, 1e-4, 1e-5, 1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--rank", type=int, default=200)
    ap.add_argument("--lfil", type=int, default=16)
    ap.add_argument("--l", type=float, default=0.5)
    ap.add_argument("--mu", type=float, default=0.01)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--maxits", type=int, default=400)
    ap.add_argument("--kernel", default="gaussian")
    ap.add_argument("--operator", default="fastsum", choices=["fastsum", "dense"])
    ap.add_argument("--engine", default="auto", choices=["auto", "table", "stream"],
                    help="fastsum engine: streamed packed-table Pallas kernels "
                    "with stencil near-field (TPU default) or XLA table path")
    ap.add_argument("--N", type=int, default=32, help="fastsum modes per dim "
                    "(matern12 PSD+accuracy needs ~2/r_pattern; see "
                    ".r5_opN_probe.log)")
    ap.add_argument("--nf-lfil", type=int, default=None,
                    help="near-field size (None = kernel auto)")
    ap.add_argument("--table-dtype", default=None, choices=[None, "bfloat16"],
                    help="phase-table dtype for the stream engine")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--x64", action="store_true",
                    help="f64 arrays (reference precision; pair with cpu)")
    ap.add_argument("--fgmres-kdim", type=int, default=100)
    ap.add_argument("--comp", action="store_true",
                    help="compensated solver reductions (TwoSum dots/norms "
                    "+ FGMRES compensated x-update)")
    ap.add_argument("--comp-op", action="store_true",
                    help="ALSO use the chunked-compensated NDFT adjoint "
                    "(measured unnecessary: the plain f32 matvec is already "
                    "~2e-6 accurate at n=1e5, .r4_op_acc.log; costs 2.7x)")
    ap.add_argument("--replace-every", type=int, default=-1,
                    help="PCG residual replacement period; -1 = AUTO: 25 on "
                    "f32 preconditioned runs (the 1/eta projector noise made "
                    "committed r4 nystrom:pcg rows diverge 24x at 1e6 — the "
                    "periodic true-residual guard is now default, ref "
                    "pcg.c:181-193), 0 in f64")
    ap.add_argument("--mixed", action="store_true",
                    help="MIXED precision on chip: f32 operator/preconditioner"
                    " matmuls, f64 Krylov vectors (x/r/p and dots).  The f32"
                    " solution-vector representation alone floors the true"
                    " relres at ~cond*eps_f32 (~1e-3 at mu=0.01, n=1e5);"
                    " f64 vectors remove that wall while every matmul stays"
                    " on the MXU.")
    ap.add_argument("--precs", default="none,nystrom,afn")
    ap.add_argument("--solvers", default="pcg,fgmres")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64 or args.mixed:
        jax.config.update("jax_enable_x64", True)
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
        additive_kernel_matrix,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs
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
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.fgmres import fgmres
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.utils.datasets import (
        expand_perm,
        rand_perm,
    )

    dtype = jnp.float64 if args.x64 else jnp.float32
    if args.replace_every < 0:
        # auto guard: periodic true-residual replacement for f32
        # PRECONDITIONED pcg (the 1/eta noise floor); unpreconditioned and
        # f64 runs keep the reference's final-recheck-only semantics
        args.replace_every = 0 if (args.x64 or args.mixed) else 25
    n, d = args.n, args.d
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), dtype)
    b = jnp.asarray(rng.normal(size=(n,)), dtype)
    params = KernelParams.make(1.0, args.l, args.mu, dtype=dtype)
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])

    out = {
        "n": n, "d": d, "kernel": args.kernel, "operator": args.operator,
        "rank": args.rank, "lfil": args.lfil, "l": args.l, "mu": args.mu,
        "tol": args.tol, "maxits": args.maxits, "N": args.N,
        "engine": args.engine, "nf_lfil": args.nf_lfil,
        "compensated": args.comp, "replace_every": args.replace_every, "mixed": args.mixed,
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "platform": jax.default_backend(), "runs": {},
    }
    print(f"n={n} d={d} kernel={args.kernel} op={args.operator} rank={args.rank} "
          f"lfil={args.lfil} l={args.l} mu={args.mu} dtype={out['dtype']} "
          f"backend={out['platform']}", flush=True)

    t0 = time.time()
    if args.operator == "fastsum":
        tdt = jnp.bfloat16 if args.table_dtype == "bfloat16" else None
        geom = jax.jit(lambda Xv: fs.additive_fastsum_geometry(
            Xv, windows, N=args.N, table_dtype=tdt))(X)
        use_stream = args.engine == "stream" or (
            args.engine == "auto" and jax.default_backend() not in ("cpu",)
        )
        # DIRECT radius-stencil near-field (host grids once per dataset):
        # values computed straight in stencil layout, gather-free apply (r5)
        nf_stens = None
        nf_lfil_build = args.nf_lfil
        if use_stream and fs._resolve_nf_lfil(args.kernel, args.nf_lfil, n, 2) > 0:
            nf_stens = fs.additive_nearfield_stencil_direct(
                geom, args.kernel, args.nf_lfil
            )
            if nf_stens is None:
                print("nf stencil degenerate; ELL near-field", flush=True)
            else:
                nf_lfil_build = 0
        plan = jax.jit(
            lambda g, p: fs.additive_fastsum_coeffs(
                args.kernel, p, g, psd_clip=True,
                nearfield_lfil=nf_lfil_build)
        )(geom, params)
        if use_stream:
            pn = jax.jit(
                lambda pl_: fs.packed_ndft_plan(pl_, table_dtype=tdt,
                                                nf_stencils=nf_stens,
                                                nf_require_grad=False)
            )(plan)
            interp = jax.default_backend() == "cpu"
            prec = "default" if tdt == jnp.bfloat16 else "highest"
            mv = lambda pn_, v: fs.packed_ndft_matvec(
                pn_, v, interpret=interp, upcast=True, prec=prec)
            operand = pn
            # free the table-path plan: the packed plan references only the
            # point coords/weights, so the (d, n, 2P) geometry tables are
            # dead weight (~0.7 GB at n=1e6 — part of an HBM OOM with the
            # kdim-100 FGMRES workspace, .r5_g_1e6d.log)
            del plan
        else:
            # NOT jitted: the solvers close over mv inside their own jit, and
            # the nested jit-in-jit form faults the tunneled backend on the
            # AFN runs (isolated: the same pcg with the raw fn runs clean)
            mv = lambda pl_, v: fs.additive_fastsum_matvec(
                pl_, v, compensated=args.comp_op)
            operand = plan
    else:
        K = jax.jit(
            lambda Xv, p: additive_kernel_matrix(args.kernel, p, Xv, windows)
        )(X, params)
        mv = lambda K_, v: jnp.matmul(K_, v, precision="highest")
        operand = K
    jax.block_until_ready(jax.jit(mv)(operand, b))
    t_op = time.time() - t0
    out["operator_build_s"] = round(t_op, 2)
    print(f"operator build+compile {t_op:.1f}s", flush=True)

    def report(name, solver, res, t_solve, setup_s):
        hist = np.asarray(res.res_history, np.float64)
        its = int(res.niter)
        t_it = t_solve / max(its, 1)
        crossings = {}
        for dec in DECADES:
            hit = np.where(hist[: its + 1] <= dec)[0]
            if hit.size:
                crossings[f"{dec:.0e}"] = {
                    "iters": int(hit[0]),
                    "time_s": round(float(hit[0]) * t_it, 3),
                }
        rec = {
            "solver": solver, "iters": its,
            "relres": float(res.relres), "solve_s": round(t_solve, 3),
            "s_per_iter": round(t_it, 5), "setup_s": round(setup_s, 2),
            "converged": bool(res.converged),
            "time_to_tol": crossings,
            "history_decimated": [float(h) for h in hist[: its + 1 : max(1, its // 50)]],
        }
        out["runs"][f"{name}:{solver}"] = rec
        cross_str = " ".join(f"{k}@{v['iters']}it/{v['time_s']}s"
                             for k, v in crossings.items())
        print(f"{name:8s} {solver:6s} | iters {its:4d} | relres {rec['relres']:.2e} "
              f"| solve {t_solve:.2f}s | setup {setup_s:.1f}s | {cross_str}",
              flush=True)

    if args.mixed:
        f64 = jnp.float64
        b_solver = b.astype(f64)

        def wrap_mv(op):
            return lambda v: mv(op, v.astype(dtype)).astype(f64)

        def wrap_ps(pre):
            # the preconditioner can stay f32: FGMRES/PCG only need M^{-1}
            # approximately; accuracy of the OUTER recursion is what counts
            return lambda r: pre.solve(r.astype(dtype)).astype(f64)
    else:
        b_solver = b
        wrap_mv = lambda op: (lambda v: mv(op, v))
        wrap_ps = lambda pre: pre.solve

    def run_both(name, pre, setup_s):
        # the preconditioner is an explicit jit ARGUMENT: closure-captured
        # device arrays inline as MLIR constants on the tunneled backend
        if pre is None:
            # PCG runs uncompensated: measured no benefit (the recursion
            # drift, not reduction noise, is its f32 floor), and the TwoSum
            # scan + AFN-solve scatter combination triggers a backend
            # kernel fault (r4 .r4_afn1e5i.log)
            pcg_run = jax.jit(lambda op, bb: pcg(
                wrap_mv(op), bb,
                tol=args.tol, maxits=args.maxits,
                replace_every=0))
            fg_run = jax.jit(lambda op, bb: fgmres(
                wrap_mv(op), bb,
                kdim=args.fgmres_kdim, maxits=args.maxits, tol=args.tol,
                compensated=args.comp))
            run_p = lambda: pcg_run(operand, b_solver)
            run_f = lambda: fg_run(operand, b_solver)
        else:
            pcg_run = jax.jit(lambda op, bb, pr: pcg(
                wrap_mv(op), bb, precond=wrap_ps(pr),
                tol=args.tol, maxits=args.maxits,
                replace_every=args.replace_every))
            fg_run = jax.jit(lambda op, bb, pr: fgmres(
                wrap_mv(op), bb, precond=wrap_ps(pr),
                kdim=args.fgmres_kdim, maxits=args.maxits, tol=args.tol,
                compensated=args.comp))
            run_p = lambda: pcg_run(operand, b_solver, pre)
            run_f = lambda: fg_run(operand, b_solver, pre)

        if "pcg" in args.solvers:
            res = jax.block_until_ready(run_p())
            t0 = time.time()
            res = jax.block_until_ready(run_p())
            report(name, "pcg", res, time.time() - t0, setup_s)

        if "fgmres" in args.solvers:
            resf = jax.block_until_ready(run_f())
            t0 = time.time()
            resf = jax.block_until_ready(run_f())
            report(name, "fgmres", resf, time.time() - t0, setup_s)

    def x32_trace(fn):
        """Trace/compile fn with x64 OFF (mixed mode): the f32 setup graphs
        are the known-good compiles; tracing them under the x64 flag emits
        int64/f64 variants that crash the tunnel's XLA (TransposeFolding
        null-buffer check, .r4_afn1e5g.log)."""
        if not args.mixed:
            return fn()
        jax.config.update("jax_enable_x64", False)
        try:
            return fn()
        finally:
            jax.config.update("jax_enable_x64", True)

    precs = args.precs.split(",")
    if "none" in precs:
        run_both("none", None, 0.0)

    if "nystrom" in precs:
        t0 = time.time()
        perm = rand_perm(jax.random.PRNGKey(7), n, args.rank)
        nys = x32_trace(lambda: jax.jit(
            lambda Xv, pp: nystrom_setup(args.kernel, pp, Xv, perm, args.rank,
                                         windows=windows)
        )(X, params))
        jax.block_until_ready(nys.U)
        run_both("nystrom", nys, time.time() - t0)

    if "afn" in precs:
        t0 = time.time()

        from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.preconds.afn import (
            afn_plan,
        )

        # afn_plan: FPS landmarks + cell-sorted Schur tail + stencil-embedded
        # FSAI pattern (gather-free applies, ops/cellgrid.py)
        plan = x32_trace(lambda: afn_plan(
            args.kernel, params, X, maxrank=args.rank, lfil=args.lfil,
            rank=args.rank, force_afn=True,
        ))
        print(f"afn plan: stencil={'on' if plan.sdev is not None else 'off'} "
              f"({time.time() - t0:.1f}s)", flush=True)

        # plan arrays as jit ARGUMENTS (closure-captured arrays inline as
        # MLIR constants; at n=1e5 the upload exceeds the tunnel's request
        # size limit — HTTP 413)
        def _setup(Xv, pp, permv, idxv, maskv, sdev, semb):
            pl = AfnPlan(perm=permv, k=args.rank, use_ran=False,
                         pattern=(idxv, maskv), sdev=sdev, semb=semb)
            return afn_setup_from_plan(args.kernel, pp, Xv, pl, windows=windows)

        afn = x32_trace(lambda: jax.jit(_setup)(
            X, params, jnp.asarray(plan.perm), jnp.asarray(plan.pattern[0]),
            jnp.asarray(plan.pattern[1]), plan.sdev, plan.semb,
        ))
        jax.block_until_ready(afn.L11)
        run_both("afn", afn, time.time() - t0)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
