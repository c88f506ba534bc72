"""Stage-timing breakdown of the large-N fastsum setup path (VERDICT r3 #2).

The round-3 scale demo recorded a 968 s plan build at N=1e6 with no
attribution.  This probe splits the build into separately-jitted stages and
reports compile (first call) vs warm (second call) time per stage:

  transfer   : host -> device of X
  geometry   : center/scale + folded phase tables per window
  coeffs     : torus sampling + FFT + fold (per-params, runs every loss eval)
  packed     : streamed packed-table plan construction (pack_phase_table)
  matvec     : one streamed matvec (compile + warm)

Usage: python scripts/setup_timing.py --n 1000000 --d 10 [--json OUT]
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--kind", default="gaussian")
    ap.add_argument("--json", default=None)
    ap.add_argument("--table-dtype", default="bfloat16",
                    help="'bfloat16' (training default) | 'float32'")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams,
        make_windows,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops import fastsum as fs

    n, d = args.n, args.d
    tdt = jnp.bfloat16 if args.table_dtype == "bfloat16" else None
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])
    params = KernelParams.make(1.0, 0.5, 0.1, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    Xh = rng.uniform(size=(n, d)).astype(np.float32)

    out = {"n": n, "d": d, "N": args.N, "kind": args.kind,
           "table_dtype": args.table_dtype, "stages": {}}

    def stage(name, fn, *a, repeat=True):
        t0 = time.perf_counter()
        r = jax.block_until_ready(fn(*a))
        t_cold = time.perf_counter() - t0
        t_warm = None
        if repeat:
            t0 = time.perf_counter()
            r = jax.block_until_ready(fn(*a))
            t_warm = time.perf_counter() - t0
        out["stages"][name] = {"cold_s": round(t_cold, 3),
                               "warm_s": round(t_warm, 3) if t_warm is not None else None}
        print(f"{name:10s} cold {t_cold:8.2f}s  warm "
              f"{(t_warm if t_warm is not None else float('nan')):8.2f}s", flush=True)
        return r

    X = stage("transfer", lambda: jax.device_put(jnp.asarray(Xh)), repeat=False)

    geom_fn = jax.jit(lambda Xv: fs.additive_fastsum_geometry(Xv, windows, N=args.N, table_dtype=tdt))
    geom = stage("geometry", geom_fn, X)

    coeffs_fn = jax.jit(lambda g, p: fs.additive_fastsum_coeffs(args.kind, p, g, psd_clip=True))
    plan = stage("coeffs", coeffs_fn, geom, params)

    packed_fn = jax.jit(lambda pl: fs.packed_ndft_plan(pl, table_dtype=tdt))
    pn = stage("packed", packed_fn, plan)

    b = jax.device_put(jnp.asarray(rng.normal(size=(n,)).astype(np.float32)))
    prec = "default" if tdt == jnp.bfloat16 else "highest"
    mv_fn = jax.jit(lambda pn_, v: fs.packed_ndft_matvec(pn_, v, upcast=True, prec=prec))
    stage("matvec", mv_fn, pn, b)

    # the XLA table-path matvec for comparison (what the r3 scale demo ran)
    mv_tab = jax.jit(lambda pl_, v: fs.additive_fastsum_matvec(pl_, v))
    stage("matvec_tab", mv_tab, plan, b)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
