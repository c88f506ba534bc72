"""On-chip operator accuracy + AFN-apply timing probe.

1. Accuracy: the additive fastsum matvec in f32 (plain vs compensated
   adjoint) against a float64 HOST reference of the same folded-NDFT math —
   measures the TPU's accumulation noise directly (CPU matmuls hide it).
2. Timing: the FSAI ELL products inside the AFN apply (suspected to carry
   the ~20 ms gap between the 24 ms AFN-PCG iteration and its ~4 ms of
   accounted GEMM/permutation work).

Usage: python scripts/op_accuracy_probe.py --n 100000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def host_reference_matvec(Xh, vh, windows_list, l, mu, f, N=32, oversample=2):
    """f64 numpy folded-NDFT additive matvec (same math as ops/fastsum)."""
    n = Xh.shape[0]
    acc = np.zeros(n)
    W = len(windows_list)
    for feats in windows_list:
        Xw = Xh[:, feats]
        c = Xw.mean(0)
        xc = Xw - c
        r = np.sqrt((xc**2).sum(1)).max()
        scale = 0.25 / r if (r > 0.25 or r < 0.125) else 1.0
        x = xc * scale
        Nos = oversample * N
        g = np.fft.fftfreq(Nos, d=1.0 / Nos) / Nos
        gg = np.meshgrid(*([g] * x.shape[1]), indexing="ij")
        r2 = sum(gi * gi for gi in gg) / (scale * scale)
        phi = np.exp(-r2 / (2 * l * l))
        bs = np.real(np.fft.fftshift(np.fft.fftn(phi))) / phi.size
        lo = Nos // 2 - N // 2
        b = bs[(slice(lo, lo + N),) * x.shape[1]]
        b = np.maximum(b, 0.0)  # psd_clip=True parity with the bench
        k = np.arange(N) - N // 2
        # exact NDFT via complex phases (f64)
        if x.shape[1] == 2:
            # y_i = Re sum_kl E0[i,k] E1[i,l] b[k,l] Ahat[k,l]
            E0 = np.exp(-2j * np.pi * np.outer(x[:, 0], k))
            E1 = np.exp(-2j * np.pi * np.outer(x[:, 1], k))
            Ahat = E0.conj().T @ (vh[:, None] * E1.conj())
            y = np.real(np.einsum("ik,kl,il->i", E0, b * Ahat, E1))
        else:
            raise NotImplementedError
        acc += y
    return f * f * (acc / W + mu * vh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--l", type=float, default=0.5)
    ap.add_argument("--mu", type=float, default=0.01)
    ap.add_argument("--skip-timing", action="store_true")
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

    n, d = args.n, args.d
    rng = np.random.default_rng(0)
    Xh = rng.uniform(size=(n, d))
    vh = rng.normal(size=(n,))
    wlist = [[i, i + 1] for i in range(0, d, 2)]
    windows = make_windows(wlist)
    params = KernelParams.make(1.0, args.l, args.mu, dtype=jnp.float32)

    print("building f64 host reference...", flush=True)
    y_ref = host_reference_matvec(Xh, vh, wlist, args.l, args.mu, 1.0)
    den = np.abs(y_ref).max()

    X = jnp.asarray(Xh, jnp.float32)
    v = jnp.asarray(vh, jnp.float32)
    geom = jax.jit(lambda Xv: fs.additive_fastsum_geometry(Xv, windows))(X)
    plan = jax.jit(
        lambda g, p: fs.additive_fastsum_coeffs("gaussian", p, g, psd_clip=True)
    )(geom, params)

    for comp in (False, True):
        mv = jax.jit(lambda pl_, vv: fs.additive_fastsum_matvec(
            pl_, vv, compensated=comp))
        y = np.asarray(jax.block_until_ready(mv(plan, v)))
        err = np.abs(y - y_ref).max() / den
        # timing
        loop = jax.jit(lambda pl_, vv: jax.lax.fori_loop(
            0, 100, lambda i, a: mv(pl_, a / jnp.linalg.norm(a)), vv))
        jax.block_until_ready(loop(plan, v))
        t0 = time.perf_counter()
        np.asarray(loop(plan, v))
        dt = (time.perf_counter() - t0) / 100
        print(f"compensated={comp}: rel err {err:.3e}  matvec {dt*1e3:.3f} ms "
              f"({n/dt/1e6:.0f} Mpts/s)", flush=True)


if __name__ == "__main__":
    main()
