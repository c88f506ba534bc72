"""Consolidated on-chip matvec probe: time + accuracy for every NDFT path.

Replaces the round-2 one-off scripts (layout_probe*.py, r2_*.py).  Measures
the additive fastsum matvec variants on the current backend (the tunneled
v5e by default) with the bench.py methodology (single jitted fori_loop,
np.asarray sync), and each variant's accuracy against a small-n dense
oracle, then prints one table + optional JSON artifact.

Variants:
  table-f32-highest    folded HBM phase tables, f32, bf16x6 GEMM passes
  table-f32-high       f32 tables, bf16x3 passes
  table-f32-default    f32 tables, bf16x1 passes (~bf16-table accuracy)
  table-bf16           bf16 tables, single pass, f32 accumulation
  fused-<gen>-<prec>   packed Pallas fused-phase kernels; gen in
                       {direct, doubling} phase regeneration, prec in
                       {highest, default} MXU passes
  stream-<dt>-<prec>   streamed packed-table kernels (packed_ndft_plan,
                       edge-trimmed pad-free layout), table dtype in
                       {f32, bf16}

Usage:
  python scripts/chip_probe.py                 # full sweep, n=2e5
  python scripts/chip_probe.py --variants table-bf16 fused-doubling-default
  python scripts/chip_probe.py --n 50000 --iters 200 --json probe.json
"""

import argparse
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    "table-f32-highest",
    "table-f32-high",
    "table-f32-default",
    "table-bf16",
    "fused-direct-highest",
    "fused-doubling-highest",
    "fused-direct-default",
    "fused-doubling-default",
    "stream-f32-highest",
    "stream-f32-default",
    "stream-bf16-default",
]


@contextlib.contextmanager
def _table_precision(fs, jnp, prec: str):
    """Temporarily set the table path's GEMM precision (probe-only knob)."""
    orig = fs._tmat

    def tmat(A, B, out_dtype):
        if A.dtype == out_dtype and B.dtype == out_dtype:
            return jnp.matmul(A, B, precision=prec)
        return jnp.matmul(A, B.astype(A.dtype), preferred_element_type=out_dtype)

    fs._tmat = tmat
    try:
        yield
    finally:
        fs._tmat = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--kernel", default="gaussian")
    ap.add_argument("--block", type=int, default=2048, help="fused block size")
    ap.add_argument("--variants", nargs="*", default=VARIANTS)
    ap.add_argument("--n-acc", type=int, default=2048,
                    help="dense-oracle size for the accuracy column")
    ap.add_argument("--grad", action="store_true", help="also time grad matvec")
    ap.add_argument("--pcg", action="store_true",
                    help="time the fused dense-PCG Pallas kernel vs the XLA "
                    "while_loop PCG at n = --n-acc (skips the matvec sweep)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache (the tunneled backend's compiles are slow)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams,
        make_windows,
        additive_kernel_matrix,
    )

    dtype = jnp.float32
    windows = make_windows([[i, i + 1] for i in range(0, args.d, 2)])
    params = KernelParams.make(1.0, 0.5, 0.01, dtype=dtype)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(args.n, args.d)), dtype)
    v = jnp.asarray(rng.normal(size=(args.n,)), dtype)
    Xa = jnp.asarray(rng.uniform(size=(args.n_acc, args.d)), dtype)
    va = jnp.asarray(rng.normal(size=(args.n_acc,)), dtype)

    # dense oracle for the accuracy column (f32 highest)
    Ka = jax.jit(
        lambda Xv: additive_kernel_matrix(args.kernel, params, Xv, windows)
    )(Xa)
    y_oracle = np.asarray(jax.jit(lambda K, x: K @ x)(Ka, va))

    if args.pcg:
        from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.pcg import pcg
        from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.solvers.pallas_pcg import (
            fused_pcg_dense,
        )

        maxits, tol = 200, 1e-5
        reps = max(args.iters // 10, 5)

        @jax.jit
        def run_fused(K, b):
            def body(i, bb):
                x, rr, ni = fused_pcg_dense(K, bb, maxits=maxits, tol=tol)
                return bb + 0.0 * x  # keep solves independent but sequenced
            return jax.lax.fori_loop(0, reps, body, b)

        @jax.jit
        def run_xla(K, b):
            def body(i, bb):
                res = pcg(lambda v: K @ v, bb, tol=tol, maxits=maxits)
                return bb + 0.0 * res.x
            return jax.lax.fori_loop(0, reps, body, b)

        rows = []
        for name, fn in (("fused-pallas-pcg", run_fused), ("xla-pcg", run_xla)):
            np.asarray(fn(Ka, va))
            t0 = time.perf_counter()
            np.asarray(fn(Ka, va))
            dt = (time.perf_counter() - t0) / reps
            rows.append(dict(variant=name, n=args.n_acc, maxits=maxits,
                             tol=tol, ms_per_solve=round(dt * 1e3, 3)))
            print(json.dumps(rows[-1]))
        x, rr, ni = jax.block_until_ready(
            fused_pcg_dense(Ka, va, maxits=maxits, tol=tol)
        )
        print(f"fused relres {float(rr):.2e} in {int(ni)} its")
        if args.json:
            with open(args.json, "w") as f:
                json.dump(dict(config=vars(args), results=rows), f, indent=1)
        return

    def build_plan(Xv, table_dtype=None):
        return jax.jit(
            lambda Xq: fs.additive_fastsum_build(
                args.kernel, params, Xq, windows, N=args.N,
                table_dtype=table_dtype,
            )
        )(Xv)

    def parse(variant):
        parts = variant.split("-")
        if parts[0] == "table":
            return dict(path="table", tdt=parts[1], prec=parts[2] if len(parts) > 2 else "highest")
        if parts[0] == "stream":
            # 'bf16u' = upcast-to-f32-in-VMEM accuracy mode
            tdt = parts[1]
            return dict(path="stream", tdt=tdt.rstrip("u"), prec=parts[2],
                        upcast=tdt.endswith("u"))
        return dict(path="fused", gen=parts[1], prec=parts[2])

    def make_matvec(spec, plan):
        if spec["path"] == "table":
            return lambda pl_, x: fs.additive_fastsum_matvec(pl_, x)
        if spec["path"] == "stream":
            return lambda pn_, x: fs.packed_ndft_matvec(
                pn_, x, prec=spec["prec"], upcast=spec["upcast"])
        return lambda pl_, x: fs.additive_fastsum_matvec_fused(
            pl_, x, block=args.block, prec=spec["prec"], phase_gen=spec["gen"]
        )

    def make_grad(spec):
        if spec["path"] == "table":
            return lambda pl_, x: fs.additive_fastsum_grad_matvec(pl_, x)
        if spec["path"] == "stream":
            return lambda pn_, x: fs.packed_ndft_grad_matvec(
                pn_, x, prec=spec["prec"], upcast=spec["upcast"])
        return lambda pl_, x: fs.additive_fastsum_grad_matvec_fused(
            pl_, x, block=args.block, prec=spec["prec"], phase_gen=spec["gen"]
        )

    results = []
    for variant in args.variants:
        spec = parse(variant)
        tdt = jnp.bfloat16 if spec.get("tdt") == "bf16" else None
        ctx = (
            _table_precision(fs, jnp, spec["prec"])
            if spec["path"] == "table" and spec["prec"] != "highest"
            else contextlib.nullcontext()
        )
        try:
            with ctx:
                if spec["path"] == "stream":
                    sdt = jnp.bfloat16 if spec["tdt"] == "bf16" else None
                    plan = jax.jit(
                        lambda pl_: fs.packed_ndft_plan(
                            pl_, table_dtype=sdt, block=args.block
                        )
                    )(build_plan(X))
                    plan_a = jax.jit(
                        lambda pl_: fs.packed_ndft_plan(
                            pl_, table_dtype=sdt, block=args.block
                        )
                    )(build_plan(Xa))
                else:
                    plan = build_plan(X, table_dtype=tdt)
                    plan_a = build_plan(Xa, table_dtype=tdt)
                mv = make_matvec(spec, plan)

                # accuracy vs dense oracle
                y_acc = np.asarray(jax.jit(lambda p_, x: mv(p_, x))(plan_a, va))
                rel = float(np.linalg.norm(y_acc - y_oracle) / np.linalg.norm(y_oracle))

                @jax.jit
                def run(pl_, x):
                    def body(i, y):
                        y = y / jnp.linalg.norm(y)
                        return mv(pl_, y)

                    return jax.lax.fori_loop(0, args.iters, body, x)

                y = np.asarray(run(plan, v))      # warm-up / compile
                assert np.isfinite(y).all()
                t0 = time.perf_counter()
                y = np.asarray(run(plan, v))
                t1 = time.perf_counter()
                us = (t1 - t0) / args.iters * 1e6
                row = dict(variant=variant, us_per_matvec=round(us, 1),
                           mpts_per_s=round(args.n / (us * 1e-6) / 1e6, 1),
                           rel_err_vs_dense=rel)

                if args.grad:
                    gv = make_grad(spec)

                    @jax.jit
                    def rung(pl_, x):
                        def body(i, y):
                            y = y / jnp.linalg.norm(y)
                            return gv(pl_, y)[0]

                        return jax.lax.fori_loop(0, args.iters, body, x)

                    np.asarray(rung(plan, v))
                    t0 = time.perf_counter()
                    np.asarray(rung(plan, v))
                    t1 = time.perf_counter()
                    row["grad_us"] = round((t1 - t0) / args.iters * 1e6, 1)
        except Exception as e:
            row = dict(variant=variant, error=f"{type(e).__name__}: {str(e)[:200]}")
        results.append(row)
        print(json.dumps(row), flush=True)

    print(f"\nn={args.n} d={args.d} N={args.N} kernel={args.kernel} "
          f"iters={args.iters} block={args.block}")
    for r in results:
        if "error" in r:
            print(f"{r['variant']:24s} | ERROR {r['error']}")
        else:
            g = f" | grad {r['grad_us']:9.1f} us" if "grad_us" in r else ""
            print(f"{r['variant']:24s} | {r['us_per_matvec']:9.1f} us "
                  f"| {r['mpts_per_s']:7.1f} Mpts/s "
                  f"| rel {r['rel_err_vs_dense']:.2e}{g}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(config=vars(args), results=results), f, indent=1)


if __name__ == "__main__":
    main()
