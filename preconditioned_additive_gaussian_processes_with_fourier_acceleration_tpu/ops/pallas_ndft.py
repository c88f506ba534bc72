"""Packed fused-phase NDFT Pallas kernels — the speed-of-light matvec path.

The table-based folded NDFT (ops/fastsum.py) is HBM-bound: the per-dim
(n, 2P) cos/sin tables are read twice per matvec (~550 MB at n=2e5, d=10
f32).  These kernels regenerate the phases in VMEM from the raw points
(n*d floats, ~70x less HBM traffic) and pack MULTIPLE WINDOWS into each MXU
tile so the 2P = N/2+1 folded mode width (34 at N=32) fills the 128-lane
systolic array — the round-1 per-window kernel ran 34/128 of the MXU and
lost 3.4x; packing 3 windows (102 lanes) recovers it.

Pipeline per matvec (same math as fastsum._folded_apply_multi):
  adjoint   A_w = (L0_w * alpha) @ L1_w'          L0/L1 = [cos;sin] phase rows
  combine   B_w = _folded_combine(W_w, A_w)       (outside, tiny)
  forward   y_i = sum_w L0_w[:,i]' B_w L1_w[:,i]
            = column-sum of L0_g * (Bdiag_g @ L1_g)   (no transposes)

Kernel layout: everything lives as (modes, points) with points on the lane
axis; phases are built by one cos+sin over a (Dtot*P, B) block whose rows are
dim-major (row j*P + p holds trig(2 pi p x_jd)).  The forward supports
multiple weight sets per pass (K and dK/dl share one phase generation — ref
nfft_interface.c:499-620 runs both plans).

1-D windows ride along as a GEMV against alpha (adjoint) and a broadcast
row-sum (forward).  3-D windows stay on the table path (ops/fastsum.py).

Ref: this replaces NFFT3's fastsum engine role (nfft_interface.c:400-497);
the separable folded-NDFT formulation needs no gridding scatter, so the TPU
kernel is GEMM-shaped (SURVEY.md §2.16).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 6.283185307179586


def _group_windows(n_windows: int, P: int):
    """Static grouping: as many 2P-wide windows as fit 128 lanes per tile."""
    per = max(1, 128 // (2 * P))
    return tuple(
        tuple(range(s, min(s + per, n_windows)))
        for s in range(0, n_windows, per)
    )


def _build_CS(xT_block, P: int):
    """cos/sin(2 pi p x) rows, dim-major: (Dtot*P, B) each.

    Row r = j*P + p of C holds cos(2 pi p x_j).  One broadcast multiply plus
    one cos and one sin over the whole block; the transcendental count is
    n * Dtot * P * 2 per pass (~0.1 ms at n=2e5, Dtot=10, P=17 on v5e).
    """
    Dtot, B = xT_block.shape
    th = TWO_PI * xT_block                                   # (Dtot, B)
    th_rep = jnp.concatenate(
        [jnp.broadcast_to(th[j : j + 1], (P, B)) for j in range(Dtot)], axis=0
    )                                                        # (Dtot*P, B)
    pcol = (
        jax.lax.broadcasted_iota(jnp.int32, (Dtot * P, 1), 0) % P
    ).astype(xT_block.dtype)
    ph = pcol * th_rep
    return jnp.cos(ph), jnp.sin(ph)


def _window_rows(C, S, j, P):
    """(2P, B) = [cos rows of dim j; sin rows of dim j]."""
    return jnp.concatenate([C[j * P : (j + 1) * P], S[j * P : (j + 1) * P]], axis=0)


def _dot(a, b, dn):
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# --- adjoint ----------------------------------------------------------------

def _adjoint_kernel(P, pairs, singles, groups, xT_ref, a_ref, *out_refs):
    i = pl.program_id(0)
    C, S = _build_CS(xT_ref[:, :], P)
    a = a_ref[:, :]                                          # (1, B)

    for g, out_ref in zip(groups, out_refs[: len(groups)]):
        L0 = jnp.concatenate([_window_rows(C, S, pairs[w][0], P) for w in g], axis=0)
        L1 = jnp.concatenate([_window_rows(C, S, pairs[w][1], P) for w in g], axis=0)
        M = _dot(L0 * a, L1, (((1,), (1,)), ((), ())))       # (rows_g, rows_g)

        @pl.when(i == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        out_ref[:, :] += M.astype(out_ref.dtype)

    if singles:
        out_ref = out_refs[len(groups)]
        L0 = jnp.concatenate([_window_rows(C, S, j, P) for j in singles], axis=0)
        v = _dot(L0, a, (((1,), (1,)), ((), ())))            # (rows1, 1)

        @pl.when(i == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        out_ref[:, :] += v.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("P", "pairs", "singles", "block", "interpret")
)
def packed_adjoint(xT, alpha, *, P: int, pairs: tuple, singles: tuple = (),
                   block: int = 2048, interpret: bool = False):
    """Folded adjoint mode tensors for all windows in one fused kernel.

    xT: (Dtot, n) scaled window coordinates (dim-major rows)
    alpha: (n,)
    pairs: per-2-D-window (ja, jb) row indices into xT
    singles: per-1-D-window row index into xT
    Returns (A2, A1): A2 = list of (2P, 2P) per 2-D window (matches
    fastsum._folded_adjoint for d=2), A1 = list of (2P,) per 1-D window.
    """
    Dtot, n = xT.shape
    dtype = xT.dtype
    nb = -(-n // block)
    npad = nb * block
    xTp = jnp.zeros((Dtot, npad), dtype).at[:, :n].set(xT)
    ap = jnp.zeros((1, npad), dtype).at[0, :n].set(alpha)

    groups = _group_windows(len(pairs), P)
    W2 = 2 * P
    out_shapes = [
        jax.ShapeDtypeStruct((W2 * len(g), W2 * len(g)), dtype) for g in groups
    ]
    out_specs = [
        pl.BlockSpec((W2 * len(g), W2 * len(g)), lambda i: (0, 0)) for g in groups
    ]
    if singles:
        out_shapes.append(jax.ShapeDtypeStruct((W2 * len(singles), 1), dtype))
        out_specs.append(pl.BlockSpec((W2 * len(singles), 1), lambda i: (0, 0)))

    outs = pl.pallas_call(
        functools.partial(_adjoint_kernel, P, pairs, singles, groups),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Dtot, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(xTp, ap)

    A2 = []
    for gi, g in enumerate(groups):
        Mg = outs[gi]
        for k, w in enumerate(g):
            A2.append(Mg[k * W2 : (k + 1) * W2, k * W2 : (k + 1) * W2])
    A1 = []
    if singles:
        v = outs[len(groups)][:, 0]
        for k in range(len(singles)):
            A1.append(v[k * W2 : (k + 1) * W2])
    return A2, A1


# --- forward ----------------------------------------------------------------

def _forward_kernel(P, pairs, singles, groups, nsets, xT_ref, *refs):
    # refs: [G_g for each set x group] + [B1 for each set (if singles)] + y_refs
    n_g_in = nsets * len(groups)
    n_s_in = nsets if singles else 0
    in_refs = refs[: n_g_in + n_s_in]
    y_refs = refs[n_g_in + n_s_in :]

    C, S = _build_CS(xT_ref[:, :], P)
    B = xT_ref.shape[1]

    L0s, L1s = [], []
    for g in groups:
        L0s.append(
            jnp.concatenate([_window_rows(C, S, pairs[w][0], P) for w in g], axis=0)
        )
        L1s.append(
            jnp.concatenate([_window_rows(C, S, pairs[w][1], P) for w in g], axis=0)
        )
    if singles:
        Ls = jnp.concatenate([_window_rows(C, S, j, P) for j in singles], axis=0)

    for s in range(nsets):
        acc = jnp.zeros((1, B), jnp.float32)
        for gi in range(len(groups)):
            G = in_refs[s * len(groups) + gi][:, :]
            Z = _dot(G, L1s[gi], (((1,), (0,)), ((), ())))   # (rows_g, B)
            acc += jnp.sum(L0s[gi] * Z, axis=0, keepdims=True)
        if singles:
            bvec = in_refs[n_g_in + s][:, :]                 # (rows1, 1)
            acc += jnp.sum(Ls * bvec, axis=0, keepdims=True)
        y_refs[s][:, :] = acc.astype(y_refs[s].dtype)


@functools.partial(
    jax.jit, static_argnames=("P", "pairs", "singles", "block", "interpret")
)
def packed_forward(xT, G2_sets, G1_sets=None, *, P: int, pairs: tuple,
                   singles: tuple = (), block: int = 2048,
                   interpret: bool = False):
    """Folded forward for one or more weight sets sharing one phase pass.

    G2_sets: list (per weight set) of lists of (2P, 2P) combined block
    tensors per 2-D window (fastsum._folded_combine output).
    G1_sets: list (per weight set) of lists of (2P,) per 1-D window.
    Returns list of y (n,) per weight set.
    """
    Dtot, n = xT.shape
    dtype = xT.dtype
    nb = -(-n // block)
    npad = nb * block
    xTp = jnp.zeros((Dtot, npad), dtype).at[:, :n].set(xT)

    groups = _group_windows(len(pairs), P)
    W2 = 2 * P
    nsets = len(G2_sets) if pairs else len(G1_sets)

    inputs = [xTp]
    in_specs = [pl.BlockSpec((Dtot, block), lambda i: (0, i))]
    for s in range(nsets):
        for g in groups:
            rows = W2 * len(g)
            Gd = jnp.zeros((rows, rows), dtype)
            for k, w in enumerate(g):
                Gd = Gd.at[k * W2 : (k + 1) * W2, k * W2 : (k + 1) * W2].set(
                    G2_sets[s][w]
                )
            inputs.append(Gd)
            in_specs.append(pl.BlockSpec((rows, rows), lambda i: (0, 0)))
    if singles:
        for s in range(nsets):
            bv = jnp.concatenate([G1_sets[s][k] for k in range(len(singles))])
            inputs.append(bv[:, None])
            in_specs.append(pl.BlockSpec((W2 * len(singles), 1), lambda i: (0, 0)))

    y_shapes = [jax.ShapeDtypeStruct((1, npad), dtype) for _ in range(nsets)]
    y_specs = [pl.BlockSpec((1, block), lambda i: (0, i)) for _ in range(nsets)]

    outs = pl.pallas_call(
        functools.partial(
            _forward_kernel, P, pairs, singles, groups, nsets
        ),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(y_specs),
        out_shape=tuple(y_shapes),
        interpret=interpret,
    )(*inputs)
    return [o[0, :n] for o in outs]
