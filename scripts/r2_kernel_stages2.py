"""Second round of packed-NDFT isolations (run alone).

EXP1: pallas adjoint with PREBUILT operands from HBM (no phases) — GEMM cost.
EXP2: same GEMM shapes in raw XLA (vector-chained).
EXP3: XLA-level packed-table matvec (3-windows-per-GEMM on stored tables).
EXP4: in-kernel-phases adjoint at block 8192.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PTS = 200_000
ITERS = 100
TWO_PI = 6.283185307179586


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    n = N_PTS

    def timed(name, f, *args):
        f = jax.jit(f)
        try:
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            t0 = time.perf_counter()
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{name:56s} {dt*1e6:9.1f} us/pass", flush=True)
        except Exception as e:
            print(f"{name:56s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

    # --- EXP1: pure-GEMM pallas adjoint, operands from HBM -----------------
    R1, R2 = 102, 68
    for BLOCK in (2048, 8192):
        nb = -(-n // BLOCK)
        npad = nb * BLOCK
        L0a = jnp.asarray(rng.normal(size=(R1, npad)), jnp.float32)
        L1a = jnp.asarray(rng.normal(size=(R1, npad)), jnp.float32)
        L0b = jnp.asarray(rng.normal(size=(R2, npad)), jnp.float32)
        L1b = jnp.asarray(rng.normal(size=(R2, npad)), jnp.float32)

        def adj2(l0a_ref, l1a_ref, l0b_ref, l1b_ref, a_ref, o1_ref, o2_ref):
            i = pl.program_id(0)
            a = a_ref[:, :]
            M1 = jax.lax.dot_general(l0a_ref[:, :] * a, l1a_ref[:, :],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
            M2 = jax.lax.dot_general(l0b_ref[:, :] * a, l1b_ref[:, :],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)
            @pl.when(i == 0)
            def _():
                o1_ref[:, :] = jnp.zeros_like(o1_ref)
                o2_ref[:, :] = jnp.zeros_like(o2_ref)
            o1_ref[:, :] += M1
            o2_ref[:, :] += M2

        def call(L0a, L1a, L0b, L1b):
            def step(i, acc):
                o1, o2 = pl.pallas_call(
                    adj2,
                    grid=(nb,),
                    in_specs=[
                        pl.BlockSpec((R1, BLOCK), lambda i: (0, i)),
                        pl.BlockSpec((R1, BLOCK), lambda i: (0, i)),
                        pl.BlockSpec((R2, BLOCK), lambda i: (0, i)),
                        pl.BlockSpec((R2, BLOCK), lambda i: (0, i)),
                        pl.BlockSpec((1, BLOCK), lambda i: (0, i)),
                    ],
                    out_specs=(pl.BlockSpec((R1, R1), lambda i: (0, 0)),
                               pl.BlockSpec((R2, R2), lambda i: (0, 0))),
                    out_shape=(jax.ShapeDtypeStruct((R1, R1), jnp.float32),
                               jax.ShapeDtypeStruct((R2, R2), jnp.float32)),
                )(L0a, L1a, L0b, L1b, acc)
                s = jnp.sum(o1) + jnp.sum(o2)
                return acc * 0.999 + s * 1e-25
            return lax.fori_loop(0, ITERS, step, jnp.ones((1, npad), jnp.float32))
        timed(f"EXP1 pallas GEMM-only adjoint block={BLOCK}", call, L0a, L1a, L0b, L1b)

    # --- EXP2: same shapes raw XLA ------------------------------------------
    L0a = jnp.asarray(rng.normal(size=(n, R1)), jnp.float32)
    L1a = jnp.asarray(rng.normal(size=(n, R1)), jnp.float32)
    L0b = jnp.asarray(rng.normal(size=(n, R2)), jnp.float32)
    L1b = jnp.asarray(rng.normal(size=(n, R2)), jnp.float32)

    def xla_adj(L0a, L1a, L0b, L1b):
        def step(i, acc):
            M1 = jnp.matmul((L0a * acc[:, None]).T, L1a, precision="highest")
            M2 = jnp.matmul((L0b * acc[:, None]).T, L1b, precision="highest")
            s = jnp.sum(M1) + jnp.sum(M2)
            return acc * 0.999 + s * 1e-25
        return lax.fori_loop(0, ITERS, step, jnp.ones((n,), jnp.float32))
    timed("EXP2 XLA packed adjoint (102+68)", xla_adj, L0a, L1a, L0b, L1b)

    def xla_fwd(L0a, L1a, L0b, L1b):
        G1 = jnp.asarray(rng.normal(size=(R1, R1)), jnp.float32) * 0.01
        G2 = jnp.asarray(rng.normal(size=(R2, R2)), jnp.float32) * 0.01
        def step(i, acc):
            Z1 = jnp.matmul(L0a + acc[:, None] * 1e-20, G1, precision="highest")
            Z2 = jnp.matmul(L0b + acc[:, None] * 1e-20, G2, precision="highest")
            y = jnp.sum(Z1 * L1a, axis=1) + jnp.sum(Z2 * L1b, axis=1)
            return y / jnp.linalg.norm(y)
        return lax.fori_loop(0, ITERS, step, jnp.ones((n,), jnp.float32))
    timed("EXP2 XLA packed forward (102+68)", xla_fwd, L0a, L1a, L0b, L1b)

    # --- EXP4: in-kernel phases, block 8192, adjoint ------------------------
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.pallas_ndft import (
        _build_CS, _window_rows,
    )
    P, DTOT = 17, 10
    PAIRS = ((0, 1), (2, 3), (4, 5), (6, 7), (8, 9))
    GROUPS = ((0, 1, 2), (3, 4))
    for BLOCK in (8192,):
        nb = -(-n // BLOCK)
        npad = nb * BLOCK
        xT = jnp.asarray(rng.uniform(-0.25, 0.25, size=(DTOT, npad)), jnp.float32)

        def adjp(xT_ref, a_ref, o1_ref, o2_ref):
            i = pl.program_id(0)
            C, S = _build_CS(xT_ref[:, :], P)
            a = a_ref[:, :]
            for g, out_ref in zip(GROUPS, (o1_ref, o2_ref)):
                L0 = jnp.concatenate([_window_rows(C, S, PAIRS[w][0], P) for w in g], axis=0)
                L1 = jnp.concatenate([_window_rows(C, S, PAIRS[w][1], P) for w in g], axis=0)
                M = jax.lax.dot_general(L0 * a, L1, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)
                @pl.when(i == 0)
                def _():
                    out_ref[:, :] = jnp.zeros_like(out_ref)
                out_ref[:, :] += M

        def call(xT):
            def step(i, acc):
                o1, o2 = pl.pallas_call(
                    adjp,
                    grid=(nb,),
                    in_specs=[
                        pl.BlockSpec((DTOT, BLOCK), lambda i: (0, i)),
                        pl.BlockSpec((1, BLOCK), lambda i: (0, i)),
                    ],
                    out_specs=(pl.BlockSpec((R1, R1), lambda i: (0, 0)),
                               pl.BlockSpec((R2, R2), lambda i: (0, 0))),
                    out_shape=(jax.ShapeDtypeStruct((R1, R1), jnp.float32),
                               jax.ShapeDtypeStruct((R2, R2), jnp.float32)),
                )(xT, acc)
                s = jnp.sum(o1) + jnp.sum(o2)
                return acc * 0.999 + s * 1e-25
            return lax.fori_loop(0, ITERS, step, jnp.ones((1, npad), jnp.float32))
        timed(f"EXP4 in-kernel phases adjoint block={BLOCK}", call, xT)

    print("done", flush=True)


if __name__ == "__main__":
    main()
