"""Stage-isolated timing of the packed NDFT kernel pieces on the real chip.

Each variant is a full pallas_call over the same grid; the carry chains the
output back into alpha so nothing hoists.  Run alone.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PTS = 200_000
ITERS = 100
BLOCK = 2048
P = 17
DTOT = 10
PAIRS = ((0, 1), (2, 3), (4, 5), (6, 7), (8, 9))
TWO_PI = 6.283185307179586


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.pallas_ndft import (
        _build_CS, _window_rows, _group_windows,
    )

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    n = N_PTS
    nb = -(-n // BLOCK)
    npad = nb * BLOCK
    xT = jnp.asarray(rng.uniform(-0.25, 0.25, size=(DTOT, npad)), jnp.float32)
    a0 = jnp.asarray(rng.normal(size=(1, npad)), jnp.float32)
    groups = _group_windows(len(PAIRS), P)

    def timed(name, call):
        f = jax.jit(call)
        try:
            out = f(xT, a0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = f(xT, a0)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{name:52s} {dt*1e6:9.1f} us/pass", flush=True)
        except Exception as e:
            print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    def chain(kernel_fn, out_specs, out_shape, reduce_fn):
        """fori_loop: alpha_{t+1} derived from this pass's (1, npad) output."""
        def call(xT, a):
            def step(i, acc):
                outs = pl.pallas_call(
                    kernel_fn,
                    grid=(nb,),
                    in_specs=[
                        pl.BlockSpec((DTOT, BLOCK), lambda i: (0, i)),
                        pl.BlockSpec((1, BLOCK), lambda i: (0, i)),
                    ],
                    out_specs=out_specs,
                    out_shape=out_shape,
                )(xT, acc)
                y = reduce_fn(outs)
                return y / jnp.linalg.norm(y)
            return lax.fori_loop(0, ITERS, step, a)
        return call

    yspec = pl.BlockSpec((1, BLOCK), lambda i: (0, i))
    yshape = jax.ShapeDtypeStruct((1, npad), jnp.float32)

    # V1: phases only
    def v1(xT_ref, a_ref, y_ref):
        C, S = _build_CS(xT_ref[:, :], P)
        y_ref[:, :] = (
            jnp.sum(C, axis=0, keepdims=True) + jnp.sum(S, axis=0, keepdims=True)
            + a_ref[:, :]
        )
    timed("V1 phases only", chain(v1, yspec, yshape, lambda o: o))

    # V2: phases + group operand concats
    def v2(xT_ref, a_ref, y_ref):
        C, S = _build_CS(xT_ref[:, :], P)
        acc = a_ref[:, :]
        for g in groups:
            L0 = jnp.concatenate([_window_rows(C, S, PAIRS[w][0], P) for w in g], axis=0)
            L1 = jnp.concatenate([_window_rows(C, S, PAIRS[w][1], P) for w in g], axis=0)
            acc = acc + jnp.sum(L0, axis=0, keepdims=True) + jnp.sum(L1, axis=0, keepdims=True)
        y_ref[:, :] = acc
    timed("V2 phases + operand concats", chain(v2, yspec, yshape, lambda o: o))

    # V3: full adjoint (HIGHEST) -> reduce group outputs to a vector via row sums
    def adj_kernel(prec, xT_ref, a_ref, *out_refs):
        i = pl.program_id(0)
        C, S = _build_CS(xT_ref[:, :], P)
        a = a_ref[:, :]
        for g, out_ref in zip(groups, out_refs):
            L0 = jnp.concatenate([_window_rows(C, S, PAIRS[w][0], P) for w in g], axis=0)
            L1 = jnp.concatenate([_window_rows(C, S, PAIRS[w][1], P) for w in g], axis=0)
            M = jax.lax.dot_general(L0 * a, L1, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
            @pl.when(i == 0)
            def _():
                out_ref[:, :] = jnp.zeros_like(out_ref)
            out_ref[:, :] += M

    adj_specs = tuple(pl.BlockSpec((34 * len(g), 34 * len(g)), lambda i: (0, 0)) for g in groups)
    adj_shapes = tuple(jax.ShapeDtypeStruct((34 * len(g), 34 * len(g)), jnp.float32) for g in groups)

    def adj_reduce(outs):
        s = sum(jnp.sum(o) for o in outs)
        return a0 + s * 1e-20

    for prec in ("highest", "high", "default"):
        timed(f"V3 adjoint {prec}",
              chain(functools.partial(adj_kernel, prec), adj_specs, adj_shapes, adj_reduce))

    # V4: forward only (static Gs) (HIGHEST)
    Gs = [jnp.asarray(rng.normal(size=(34 * len(g), 34 * len(g))), jnp.float32) * 0.01
          for g in groups]

    def fwd_kernel(prec, xT_ref, a_ref, g1_ref, g2_ref, y_ref):
        C, S = _build_CS(xT_ref[:, :], P)
        acc = a_ref[:, :] * 1e-20
        for g, gref in zip(groups, (g1_ref, g2_ref)):
            L0 = jnp.concatenate([_window_rows(C, S, PAIRS[w][0], P) for w in g], axis=0)
            L1 = jnp.concatenate([_window_rows(C, S, PAIRS[w][1], P) for w in g], axis=0)
            Z = jax.lax.dot_general(gref[:, :], L1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32, precision=prec)
            acc += jnp.sum(L0 * Z, axis=0, keepdims=True)
        y_ref[:, :] = acc

    def fwd_call(prec):
        def call(xT, a):
            def step(i, acc):
                y = pl.pallas_call(
                    functools.partial(fwd_kernel, prec),
                    grid=(nb,),
                    in_specs=[
                        pl.BlockSpec((DTOT, BLOCK), lambda i: (0, i)),
                        pl.BlockSpec((1, BLOCK), lambda i: (0, i)),
                        pl.BlockSpec(Gs[0].shape, lambda i: (0, 0)),
                        pl.BlockSpec(Gs[1].shape, lambda i: (0, 0)),
                    ],
                    out_specs=yspec,
                    out_shape=yshape,
                )(xT, acc, Gs[0], Gs[1])
                return y / jnp.linalg.norm(y)
            return lax.fori_loop(0, ITERS, step, a)
        return call

    for prec in ("highest", "high", "default"):
        timed(f"V4 forward {prec}", fwd_call(prec))

    print("done", flush=True)


if __name__ == "__main__":
    main()
