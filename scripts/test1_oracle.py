"""TEST1 oracle: fastsum vs exact-dense matvec error table ("Figure 2").

Reproduces the reference driver's printed accuracy oracle
(ref TESTS/TEST1/foo.cpp:240-295): build the additive exact and Fourier
operator stacks on the same data, apply both to a random vector, and print
L-inf/L2 absolute + relative errors for K@x and the three gradient matvecs.

Usage: python scripts/test1_oracle.py [--n 800] [--d 4] [--N 32] [--kernel gaussian]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=800)
    ap.add_argument("--d", type=int, default=4)
    ap.add_argument("--N", type=int, default=32)
    ap.add_argument("--kernel", default="gaussian",
                    choices=["gaussian", "matern32", "matern12"])
    ap.add_argument("--f", type=float, default=1.0)
    ap.add_argument("--l", type=float, default=0.25)
    ap.add_argument("--mu", type=float, default=0.05)
    ap.add_argument("--nearfield-lfil", type=int, default=None,
                    help="near-field correction size (default auto: on for "
                    "matern12, matching the reference's always-on fastsum "
                    "regularization)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--x64", action="store_true")
    args = ap.parse_args()

    if args.x64:
        os.environ["JAX_ENABLE_X64"] = "1"
    import jax

    if args.x64:
        jax.config.update("jax_enable_x64", True)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.kernels import (
        KernelParams,
        make_windows,
        additive_kernel_matrix_with_grad,
    )
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fastsum import (
        additive_fastsum_build,
        additive_fastsum_matvec,
        additive_fastsum_grad_matvec,
    )

    rng = np.random.default_rng(906)
    dtype = jnp.float64 if args.x64 else jnp.float32
    X = jnp.asarray(rng.uniform(size=(args.n, args.d)), dtype)
    x = jnp.asarray(rng.normal(size=(args.n,)), dtype)
    p = KernelParams.make(args.f, args.l, args.mu, dtype=dtype)
    wlist = [[i] for i in range(0, args.d, 2)] + [
        [i, i + 1] for i in range(1, args.d - 1, 2)
    ]
    windows = make_windows(wlist)

    K, dK = additive_kernel_matrix_with_grad(args.kernel, p, X, windows)
    y_exact = K @ x
    dy_exact = jnp.einsum("knm,m->kn", dK, x)

    plan = jax.jit(
        lambda Xv: additive_fastsum_build(
            args.kernel, p, Xv, windows, N=args.N,
            nearfield_lfil=args.nearfield_lfil,
        )
    )(X)
    y_fast = jax.jit(additive_fastsum_matvec)(plan, x)
    dy_fast = jax.jit(additive_fastsum_grad_matvec)(plan, x)

    def report(name, a, b):
        diff = np.asarray(a - b)
        bb = np.asarray(b)
        linf = np.abs(diff).max()
        l2 = np.linalg.norm(diff)
        print(
            f"{name:10s} | Linf abs {linf:.3e} | Linf rel {linf / np.abs(bb).max():.3e}"
            f" | L2 abs {l2:.3e} | L2 rel {l2 / np.linalg.norm(bb):.3e}"
        )

    print(f"kernel={args.kernel} n={args.n} d={args.d} N={args.N} "
          f"windows={wlist} (f,l,mu)=({args.f},{args.l},{args.mu})")
    report("K@x", y_fast, y_exact)
    for j, nm in enumerate(["dK/df@x", "dK/dl@x", "dK/dmu@x"]):
        report(nm, dy_fast[j], dy_exact[j])

    if args.kernel == "matern12" and args.nearfield_lfil is None:
        # extra oracle row: the uncorrected pure-Fourier operator, so the
        # default near-field correction's gain is visible in one run
        plan0 = jax.jit(
            lambda Xv: additive_fastsum_build(
                args.kernel, p, Xv, windows, N=args.N, nearfield_lfil=0
            )
        )(X)
        report("K@x nf=0", jax.jit(additive_fastsum_matvec)(plan0, x), y_exact)


if __name__ == "__main__":
    main()
