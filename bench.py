"""Headline benchmark: Fourier-accelerated additive kernel matvec throughput.

Measures pts/s/chip of the additive fastsum matvec (the reference's hot path,
SURVEY.md §3.2: Nfft4GPAdditiveNFFTMatSymv) at N=200k points, d=10, five
2-feature windows — BASELINE.json config 3 scaled up.

Runs the framework's TRAINING-default operator configuration: the STREAMED
packed-table Pallas kernels (ops/fastsum.packed_ndft_plan) with bfloat16
phase tables upcast to f32 in VMEM (GPProblem fastsum_engine 'auto' on
TPU + f32 data).  The f32 XLA table path is at the HBM roofline (measured
~870 GB/s effective, ROOFLINE.md); bf16 tables halve the dominant traffic
term and the streamed kernels eliminate the XLA dot-operand/result HBM
materializations on top (measured r3: stream-bf16 470 us vs table-bf16
517 us vs table-f32 961 us at n=2e5).  Operator accuracy is ~1-2e-3
relative vs the dense oracle (chip_probe), well inside the reference's own
shipped fastsum error for non-smooth kernels (4e-2) and below the SLQ
estimator noise in the loss.

The reference publishes no numbers (README.md:4 "not optimized for
performance"), so there is NO measured baseline to normalize against:
vs_baseline = measured / 1e6 pts/s, where 1e6 is a NOMINAL (order-of-
magnitude, favorable-to-the-reference) estimate of its threaded CPU NFFT
matvec rate at this problem size — read it as "x vs a nominal 1 Mpts/s
CPU reference", not as a ratio of two measurements.

Prints exactly one JSON line.
"""

import json
import os
import time

import numpy as np


def _enable_compile_cache(jax):
    """Persistent compile cache: the remote-compile TPU backend has high and
    variable first-compile latency; cached executables load in <1s."""
    try:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _run(n, d, iters):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache(jax)

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams,
        make_windows,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fastsum import (
        additive_fastsum_build,
        additive_fastsum_matvec,
        packed_ndft_plan,
        packed_ndft_matvec,
    )

    dtype = jnp.float32
    windows = make_windows([[i, i + 1] for i in range(0, d, 2)])

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(n, d)), dtype)
    x = jnp.asarray(rng.normal(size=(n,)), dtype)
    params = KernelParams.make(1.0, 0.5, 0.01, dtype=dtype)

    # plan built inside jit (on the remote-compile TPU backend every eager op
    # is a compile round-trip) and passed as a jit ARGUMENT so the large
    # phase tables are buffers, not inlined MLIR constants
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        # streamed packed-table Pallas kernels (the r3 training default)
        plan = jax.jit(
            lambda Xv: packed_ndft_plan(
                additive_fastsum_build("gaussian", params, Xv, windows, N=32),
                table_dtype=jnp.bfloat16,
            )
        )(X)
        mv = lambda p, v: packed_ndft_matvec(p, v, prec="default", upcast=True)
    else:
        plan = jax.jit(
            lambda Xv: additive_fastsum_build(
                "gaussian", params, Xv, windows, N=32, table_dtype=jnp.bfloat16
            )
        )(X)
        mv = additive_fastsum_matvec

    # the timing loop lives inside ONE jit so per-dispatch latency (large
    # through the remote TPU tunnel) is amortized out of the measurement
    @jax.jit
    def run(plan, v):
        def body(i, y):
            y = y / jnp.linalg.norm(y)
            return mv(plan, y)

        return jax.lax.fori_loop(0, iters, body, v)

    # warm-up / compile; np.asarray forces a full device round-trip (the
    # remote backend's block_until_ready alone under-syncs)
    y = np.asarray(run(plan, x))
    assert bool(np.isfinite(y).all())

    # best-of-3: the tunneled chip shows up to ~25% run-to-run variance
    # (measured r4: 311/329/389 Mpts/s for identical configs); the max is
    # the steady-state device rate, the spread is tunnel/host noise
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = np.asarray(run(plan, x))
        t1 = time.perf_counter()
        best = min(best, (t1 - t0) / iters)
    return n / best


def main():
    baseline_pts_per_s = 1.0e6  # nominal reference CPU NFFT rate (no published numbers)
    # fall back to smaller problems if the backend rejects the big one
    # iters high enough to amortize the ~40 ms per-dispatch overhead of the
    # remote TPU tunnel (measured: 50 its -> +0.8 ms/matvec of pure overhead)
    for n, d, iters in ((200_000, 10, 500), (50_000, 10, 500), (8_192, 4, 100)):
        try:
            pts_per_s = _run(n, d, iters)
            break
        except Exception as e:
            import sys

            print(f"bench config n={n} failed: {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
    else:
        pts_per_s = 0.0
    print(
        json.dumps(
            {
                "metric": "additive_fastsum_matvec_pts_per_s_per_chip",
                "value": round(pts_per_s, 1),
                "unit": "pts/s",
                "vs_baseline": round(pts_per_s / baseline_pts_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
