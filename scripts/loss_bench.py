"""On-chip GP loss-step benchmark: streamed multi-RHS engine vs table path.

The training loss (models/gp.gp_loss) is matvec-dominated: FGMRES burns
2*maxits single-RHS matvecs and SLQ burns nvecs*maxits probe matvecs plus
nvecs gradient matvecs.  With fastsum_engine='stream' the SLQ probes are
batched through the multi-RHS packed kernels (ONE phase-table stream per
Lanczos step for all probes, ops/fastsum.packed_ndft_matvec_batch), so the
HBM traffic of the dominant term drops ~nvecs-fold.

Usage:  python scripts/loss_bench.py [--n 100000] [--reps 20]
Prints one timing row per engine + the speedup, and optionally JSON.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--nvecs", type=int, default=10)
    ap.add_argument("--maxits", type=int, default=10)
    ap.add_argument("--engines", nargs="*", default=["table", "stream"])
    ap.add_argument("--operator", default="fastsum", choices=["fastsum", "dense"],
                    help="dense: the small-n regime (multiclass/TEST2 scale); "
                    "engines are ignored")
    ap.add_argument("--precond", default="none")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.models.problem import GPProblem
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.models.transforms import (
        transform_inverse,
    )

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(args.n, args.d)), jnp.float32)
    y = jnp.asarray(
        np.sin(3 * np.asarray(X[:, 0])) + 0.1 * rng.normal(size=args.n),
        jnp.float32,
    )
    raw = transform_inverse(
        "softplus", jnp.asarray([1.0, 0.5, 0.05], jnp.float32)
    )
    windows = [[i, i + 1] for i in range(0, args.d, 2)]

    rows = []
    engines = args.engines if args.operator == "fastsum" else ["dense"]
    for engine in engines:
        prob = GPProblem(
            kernel="gaussian", windows=windows, operator=args.operator,
            precond=args.precond, rank=64, maxits=args.maxits,
            nvecs=args.nvecs, fastsum_N=32,
            fastsum_engine=engine if engine != "dense" else "table", seed=0,
        )
        loss_fn = prob.make_loss(X, y)

        @jax.jit
        def run(r):
            def body(i, acc):
                loss, grad = loss_fn(r + 0.0 * acc)
                return acc + loss

            return jax.lax.fori_loop(0, args.reps, body, jnp.zeros((), r.dtype))

        loss0, grad0 = loss_fn(raw)
        loss0 = float(np.asarray(loss0))
        acc = np.asarray(run(raw))           # warm-up / compile
        t0 = time.perf_counter()
        acc = np.asarray(run(raw))
        dt = (time.perf_counter() - t0) / args.reps
        rows.append(dict(engine=engine, n=args.n, d=args.d,
                         nvecs=args.nvecs, maxits=args.maxits,
                         ms_per_loss_step=round(dt * 1e3, 2), loss=loss0))
        print(json.dumps(rows[-1]), flush=True)

    if len(rows) == 2:
        print(f"speedup {rows[0]['ms_per_loss_step'] / rows[1]['ms_per_loss_step']:.2f}x "
              f"(loss delta {abs(rows[0]['loss'] - rows[1]['loss']):.2e})",
              flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(config=vars(args), results=rows), f, indent=1)


if __name__ == "__main__":
    main()
