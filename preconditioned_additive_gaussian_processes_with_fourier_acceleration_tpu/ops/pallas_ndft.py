"""Packed fused-phase NDFT Pallas kernels — the speed-of-light matvec path.

The table-based folded NDFT (ops/fastsum.py) is HBM-bound: the per-dim
(n, 2P) cos/sin tables are read twice per matvec (~550 MB at n=2e5, d=10
f32).  These kernels regenerate the phases in VMEM from the raw points
(n*d floats, ~70x less HBM traffic) and pack MULTIPLE WINDOWS into each MXU
tile so the folded mode width fills the 128-lane systolic array.

Two hard-won layout rules (measured on v5e):
  1. EVERY sublane dimension is a multiple of 8.  The natural folded width
     2P = N+2 = 34 is not; operands built by concatenating 17-row slices
     force Mosaic onto slow relayout paths (the round-1 kernel lost 3.4x and
     a 34-row packed variant still lost 2.5x).  Phases therefore live in a
     (Dtot, 48, B) tensor: rows 0..16 cos(p th), rows 24..40 sin(p th), pad
     rows in between — every slice/concat lands on an 8-aligned boundary.
  2. Windows pack 2-per-GEMM (96 rows <= 128 lanes), and the per-window
     48-row operand is a FREE leading-index slice T6[j].

Pipeline per matvec (same math as fastsum._folded_apply_multi):
  adjoint   A_w = (L0_w * alpha) @ L1_w'          L0/L1 = 48-row phase blocks
  combine   B_w = _folded_combine(W_w, A_w)       (outside, tiny)
  forward   y_i = sum_w L0_w[:,i]' B_w L1_w[:,i]
            = column-sum of L0_g * (Bdiag_g @ L1_g)   (no transposes)

The pad rows carry bounded garbage (cos of clamped phases); they are never
read: the adjoint extraction slices the real mode rows outside the kernel and
the forward's block-diagonal G has zeros at pad positions.

The forward supports multiple weight sets per pass (K and dK/dl share one
phase generation — ref nfft_interface.c:499-620 runs both plans).  1-D
windows ride along as a GEMV against alpha (adjoint) and a broadcast row-sum
(forward).  3-D windows stay on the table path (ops/fastsum.py).

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


def _rpad(P: int) -> int:
    """Per-dim phase-block rows: P padded up to a multiple of 8."""
    return ((P + 7) // 8) * 8


def _wrows(P: int) -> int:
    """Rows per window operand: [cos pad | sin pad]."""
    return 2 * _rpad(P)


def _group_windows(n_windows: int, P: int):
    """Static grouping: as many padded windows as fit 128 lanes per tile."""
    per = max(1, 128 // _wrows(P))
    return tuple(
        tuple(range(s, min(s + per, n_windows)))
        for s in range(0, n_windows, per)
    )


def _build_T6(xT_block, P: int):
    """(Dtot, 2*RP, B) phase tensor; T6[j] is dim j's 48-row window operand.

    Rows [0:P] hold cos(2 pi p x_j), rows [RP:RP+P] hold sin; pad rows
    (p >= P) evaluate trig at p=0 (bounded, never read).  Construction is one
    broadcast multiply + one cos + one sin over aligned blocks — no
    sublane-misaligned shuffles (layout rule 1 in the module docstring).
    """
    Dtot, B = xT_block.shape
    RP = _rpad(P)
    th3 = (TWO_PI * xT_block)[:, None, :]                     # (Dtot, 1, B)
    p3 = jax.lax.broadcasted_iota(jnp.int32, (1, RP, 1), 1)
    p3 = jnp.where(p3 < P, p3, 0).astype(xT_block.dtype)
    ph = th3 * p3                                             # (Dtot, RP, B)
    return jnp.concatenate([jnp.cos(ph), jnp.sin(ph)], axis=1)


def _build_T6_doubling(xT_block, P: int):
    """_build_T6 with TWO transcendentals per point/dim instead of 2*RP.

    e^{ip theta} rows are grown by block doubling: rows [have:2*have) =
    rows [0:have) rotated by e^{i have theta}, with the rotator obtained
    from row have/2 by the double-angle identity — so the VPU cost is one
    cos+sin plus ~2*RP complex multiplies of full (Dtot, *, B) blocks
    (PLAN.md round-1 design: "2 transcendentals + rotations").  Phase error
    grows like log2(P) ulp (measured ~1e-6 relative at P=17), below the
    N=32 mode-truncation error.  Pad rows hold valid trig of higher p
    (bounded, never read).
    """
    RP = _rpad(P)
    th = TWO_PI * xT_block                                    # (Dtot, B)
    c1 = jnp.cos(th)
    s1 = jnp.sin(th)
    C = jnp.stack([jnp.ones_like(th), c1], axis=1)            # (Dtot, 2, B)
    S = jnp.stack([jnp.zeros_like(th), s1], axis=1)
    have = 2
    while have < RP:
        ch = C[:, have // 2]
        sh = S[:, have // 2]
        ck = (ch * ch - sh * sh)[:, None, :]                  # cos(have*th)
        sk = (2.0 * ch * sh)[:, None, :]                      # sin(have*th)
        take = min(have, RP - have)
        Cb = C[:, :take]
        Sb = S[:, :take]
        C = jnp.concatenate([C, Cb * ck - Sb * sk], axis=1)
        S = jnp.concatenate([S, Sb * ck + Cb * sk], axis=1)
        have += take
    return jnp.concatenate([C, S], axis=1)                    # (Dtot, 2RP, B)


_PHASE_GEN = {"direct": _build_T6, "doubling": _build_T6_doubling}


def _get_T6(phase_gen: str, src, P: int):
    """Phase source: regenerate from points (src = (Dtot, B) coords) or
    stream a pre-packed table block (src = (Dtot*WR, B), 'table' mode —
    see pack_phase_table; 2-D layout because 3-D input BlockSpecs hang the
    Mosaic compile on the tunneled backend, measured r3).  The leading-axis
    split to (Dtot, WR, B) is a free sublane-preserving view.

    'table' keeps the stored dtype: f32 tables dot at the chosen MXU
    precision; bf16 tables feed the MXU DIRECTLY as bf16 operands with f32
    accumulation (preferred_element_type) — upcasting the whole block to
    f32 in VMEM first (the r3-initial design) costs a VPU cast of every
    streamed element and measured SLOWER with no accuracy gain at DEFAULT
    precision (the MXU rounds f32 operands to bf16 anyway).
    'table_f32' is that upcasting variant, kept as the accuracy mode: the
    alpha product and the mode-row reductions then run f32 on the VPU."""
    if phase_gen in ("table", "table_f32"):
        WR = _wrows(P)
        rows, B = src.shape
        T6 = src.reshape(rows // WR, WR, B)
        return T6.astype(jnp.float32) if phase_gen == "table_f32" else T6
    return _PHASE_GEN[phase_gen](src, P)


def pack_phase_table(xT, P: int, block: int = 2048, table_dtype=None):
    """(Dtot*WR, npad) packed phase table for phase_gen='table' streaming.

    Per dim j, rows [j*WR : j*WR+P] = cos(2 pi p x_j), rows
    [j*WR+RP : j*WR+RP+P] = sin; pad rows (P < RP) are ZERO (pad positions
    of the combined weights are zero too, so they contribute nothing).
    With the Nyquist mode trimmed (P = N/2) the layout is pad-free:
    WR = 2P = N rows/dim and 128/WR windows pack per MXU tile.  npad is
    rounded up to a multiple of `block` so kernel grids need no edge
    handling.  Stored FLAT as 2-D (see _get_T6: 3-D input BlockSpecs hang
    Mosaic on this backend)."""
    Dtot, n = xT.shape
    RP = _rpad(P)
    WR = 2 * RP
    nb = -(-n // block)
    npad = nb * block
    xp = jnp.zeros((Dtot, npad), xT.dtype).at[:, :n].set(xT)
    pr = jnp.arange(P, dtype=xT.dtype)
    ph = TWO_PI * xp[:, None, :] * pr[None, :, None]          # (Dtot, P, npad)
    T = jnp.zeros((Dtot, WR, npad), jnp.float32)
    T = T.at[:, :P].set(jnp.cos(ph))
    T = T.at[:, RP : RP + P].set(jnp.sin(ph))
    if table_dtype is not None:
        T = T.astype(table_dtype)
    return T.reshape(Dtot * WR, npad)


def _dot(a, b, dn, precision):
    return jax.lax.dot_general(
        a, b, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=precision,
    )


def _precision(name: str):
    # Mosaic supports only DEFAULT (bf16x1) and HIGHEST (bf16x6) dot
    # precisions in-kernel (HIGH raises NotImplementedError, measured r3).
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[name]


# --- adjoint ----------------------------------------------------------------

def _adjoint_kernel(P, pairs, singles, groups, nv, prec, phase_gen,
                    src_ref, a_ref, *out_refs):
    """nv right-hand sides share ONE table/phase stream per block: each
    probe's adjoint is an extra pair of GEMMs on data already in VMEM —
    the HBM table traffic (the matvec's wall, ROOFLINE.md) is paid once.
    Per-RHS results are stacked along rows of the 2-D outputs (3-D blocks
    hang Mosaic on this backend, see _get_T6)."""
    i = pl.program_id(0)
    T6 = _get_T6(phase_gen, src_ref[...], P)
    # bf16 streaming: round alpha once (equivalent to the MXU's operand
    # rounding of the product) so the big elementwise multiply runs bf16
    # and the dot takes native bf16 operands with f32 accumulation.
    a_all = a_ref[:, :].astype(T6.dtype)                     # (nv, B)
    precision = _precision(prec)

    for g, out_ref in zip(groups, out_refs[: len(groups)]):
        L0 = jnp.concatenate([T6[pairs[w][0]] for w in g], axis=0)
        L1 = jnp.concatenate([T6[pairs[w][1]] for w in g], axis=0)
        rows = L0.shape[0]

        @pl.when(i == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        # ONE (nv*rows, B) x (B, rows) GEMM for all probes: the per-probe
        # micro-GEMM loop left the loss step kernel-scheduling-bound
        # (~2.1 ms vs the 0.2 ms byte floor at n=1e5, ROOFLINE.md r4
        # addendum); stacking the alpha-scaled operands along rows turns
        # nv dispatches into one MXU-saturating dot.
        A_ops = jnp.concatenate(
            [L0 * a_all[r : r + 1, :] for r in range(nv)], axis=0
        )
        M = _dot(A_ops, L1, (((1,), (1,)), ((), ())), precision)
        out_ref[:, :] += M.astype(out_ref.dtype)

    if singles:
        out_ref = out_refs[len(groups)]
        Ls = jnp.concatenate([T6[j] for j in singles], axis=0)
        # one dot covers all RHS: (rows1, B) @ (B, nv)
        v = _dot(Ls, a_all, (((1,), (1,)), ((), ())), precision)

        @pl.when(i == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        out_ref[:, :] += v.astype(out_ref.dtype)


def _unpad_A(Mpad, P: int):
    """(WR, WR) padded adjoint block -> (2P, 2P) [cos|sin] x [cos|sin]."""
    RP = _rpad(P)
    cc = Mpad[:P, :P]
    cs = Mpad[:P, RP : RP + P]
    sc = Mpad[RP : RP + P, :P]
    ss = Mpad[RP : RP + P, RP : RP + P]
    return jnp.concatenate(
        [jnp.concatenate([cc, cs], axis=1), jnp.concatenate([sc, ss], axis=1)],
        axis=0,
    )


def _pad_G(G, P: int):
    """(2P, 2P) combined block tensor -> (WR, WR) with zeros at pad rows."""
    RP = _rpad(P)
    WR = 2 * RP
    out = jnp.zeros((WR, WR), G.dtype)
    out = out.at[:P, :P].set(G[:P, :P])
    out = out.at[:P, RP : RP + P].set(G[:P, P:])
    out = out.at[RP : RP + P, :P].set(G[P:, :P])
    out = out.at[RP : RP + P, RP : RP + P].set(G[P:, P:])
    return out


def _pad_g1(g, P: int):
    """(2P,) 1-D combined vector -> (WR,) with zeros at pad rows."""
    RP = _rpad(P)
    out = jnp.zeros((2 * RP,), g.dtype)
    out = out.at[:P].set(g[:P])
    return out.at[RP : RP + P].set(g[P:])


@functools.partial(
    jax.jit,
    static_argnames=("P", "pairs", "singles", "block", "interpret", "prec",
                     "phase_gen"),
)
def packed_adjoint(xT, alpha, *, P: int, pairs: tuple, singles: tuple = (),
                   block: int = 2048, interpret: bool = False,
                   prec: str = "highest", phase_gen: str = "doubling"):
    """Folded adjoint mode tensors for all windows in one fused kernel.

    xT: (Dtot, n) scaled window coordinates (dim-major rows), OR with
        phase_gen='table' a pre-packed (Dtot, WR, npad) phase table
        (pack_phase_table) — streamed per block instead of regenerated.
    alpha: (n,) — or (nv, n) for a BATCH of right-hand sides sharing one
        table stream (SLQ probe batches: the HBM traffic is paid once for
        all nv, ROOFLINE.md "multi-RHS" lever).
    pairs: per-2-D-window (ja, jb) row indices into xT
    singles: per-1-D-window row index into xT
    Returns (A2, A1): A2 = list of (2P, 2P) per 2-D window (matches
    fastsum._folded_adjoint for d=2), A1 = list of (2P,) per 1-D window.
    For batched alpha each entry gains a leading (nv,) axis.
    """
    table_mode = phase_gen in ("table", "table_f32")
    WR = _wrows(P)
    batched = alpha.ndim == 2
    nv = alpha.shape[0] if batched else 1
    if table_mode:
        rows, npad = xT.shape
        Dtot = rows // WR
        nb = npad // block
        n = alpha.shape[-1]
        src = xT
        src_spec = pl.BlockSpec((rows, block), lambda i: (0, i))
    else:
        Dtot, n = xT.shape
        nb = -(-n // block)
        npad = nb * block
        src = jnp.zeros((Dtot, npad), xT.dtype).at[:, :n].set(xT)
        src_spec = pl.BlockSpec((Dtot, block), lambda i: (0, i))
    dtype = alpha.dtype
    a2d = alpha if batched else alpha[None, :]
    ap = jnp.zeros((nv, npad), dtype).at[:, :n].set(a2d)

    groups = _group_windows(len(pairs), P)
    out_shapes = [
        jax.ShapeDtypeStruct((nv * WR * len(g), WR * len(g)), dtype)
        for g in groups
    ]
    out_specs = [
        pl.BlockSpec((nv * WR * len(g), WR * len(g)), lambda i: (0, 0))
        for g in groups
    ]
    if singles:
        out_shapes.append(jax.ShapeDtypeStruct((WR * len(singles), nv), dtype))
        out_specs.append(pl.BlockSpec((WR * len(singles), nv), lambda i: (0, 0)))

    outs = pl.pallas_call(
        functools.partial(_adjoint_kernel, P, pairs, singles, groups, nv,
                          prec, phase_gen),
        grid=(nb,),
        in_specs=[
            src_spec,
            pl.BlockSpec((nv, block), lambda i: (0, i)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(src, ap)

    A2 = []
    for gi, g in enumerate(groups):
        rows_g = WR * len(g)
        Mg = outs[gi].reshape(nv, rows_g, rows_g)
        for k, w in enumerate(g):
            blocks = jax.vmap(lambda M: _unpad_A(M, P))(
                Mg[:, k * WR : (k + 1) * WR, k * WR : (k + 1) * WR]
            )
            A2.append(blocks if batched else blocks[0])
    A1 = []
    if singles:
        v = outs[len(groups)]                                # (rows1, nv)
        RP = _rpad(P)
        for k in range(len(singles)):
            blockv = v[k * WR : (k + 1) * WR]
            vec = jnp.concatenate([blockv[:P], blockv[RP : RP + P]], axis=0).T
            A1.append(vec if batched else vec[0])
    return A2, A1


# --- forward ----------------------------------------------------------------

def _forward_kernel(P, pairs, singles, groups, nsets, prec, phase_gen,
                    src_ref, *refs):
    # refs: [stacked G per group] + [stacked B1 (if singles)] + y_refs
    n_g_in = len(groups)
    n_s_in = 1 if singles else 0
    in_refs = refs[: n_g_in + n_s_in]
    y_refs = refs[n_g_in + n_s_in :]
    precision = _precision(prec)

    T6 = _get_T6(phase_gen, src_ref[...], P)
    B = T6.shape[-1]

    # bf16 streaming: the G @ L1 dot takes native bf16 operands (G rounded
    # once — same rounding the MXU applies at DEFAULT precision anyway);
    # the row-reduction multiply upcasts L0 to f32 ONCE per block, shared
    # across weight sets, so the f32 accumulation of y is preserved.
    L0s, L1s = [], []
    for g in groups:
        L0s.append(
            jnp.concatenate([T6[pairs[w][0]] for w in g], axis=0)
            .astype(jnp.float32)
        )
        L1s.append(jnp.concatenate([T6[pairs[w][1]] for w in g], axis=0))
    if singles:
        Ls = jnp.concatenate([T6[j] for j in singles], axis=0)
    tdt = T6.dtype

    # merged weight-set GEMM per group: the caller hands ONE
    # (nsets*rows, rows) stacked input per group, so all sets run as one
    # MXU-saturating dot instead of nsets micro-GEMMs (the SLQ loss step's
    # named lever, ROOFLINE.md r4 addendum); the per-set row reductions
    # then slice the stacked result.
    accs = [jnp.zeros((1, B), jnp.float32) for _ in range(nsets)]
    for gi in range(len(groups)):
        rows = L1s[gi].shape[0]
        Gstack = in_refs[gi][:, :].astype(tdt)           # (nsets*rows, rows)
        Zs = _dot(Gstack, L1s[gi], (((1,), (0,)), ((), ())), precision)
        for s in range(nsets):
            accs[s] += jnp.sum(
                L0s[gi] * Zs[s * rows : (s + 1) * rows], axis=0, keepdims=True
            )
    for s in range(nsets):
        acc = accs[s]
        if singles:
            bvec = in_refs[n_g_in][:, s : s + 1].astype(jnp.float32)
            acc = acc + jnp.sum(
                Ls.astype(jnp.float32) * bvec, axis=0, keepdims=True
            )
        y_refs[s][:, :] = acc.astype(y_refs[s].dtype)


@functools.partial(
    jax.jit,
    static_argnames=("P", "pairs", "singles", "block", "interpret", "prec",
                     "phase_gen", "n_out"),
)
def packed_forward(xT, G2_sets, G1_sets=None, *, P: int, pairs: tuple,
                   singles: tuple = (), block: int = 2048,
                   interpret: bool = False, prec: str = "highest",
                   phase_gen: str = "doubling", n_out: int = None):
    """Folded forward for one or more weight sets sharing one phase pass.

    xT: (Dtot, n) coordinates, or with phase_gen='table' a pre-packed
        (Dtot, WR, npad) phase table (pass n_out = true n).
    G2_sets: list (per weight set) of lists of (2P, 2P) combined block
    tensors per 2-D window (fastsum._folded_combine output).
    G1_sets: list (per weight set) of lists of (2P,) per 1-D window.
    Returns list of y (n,) per weight set.
    """
    table_mode = phase_gen in ("table", "table_f32")
    WR = _wrows(P)
    if table_mode:
        rows, npad = xT.shape
        Dtot = rows // WR
        nb = npad // block
        n = n_out if n_out is not None else npad
        src = xT
        src_spec = pl.BlockSpec((rows, block), lambda i: (0, i))
        dtype = jnp.float32
    else:
        Dtot, n = xT.shape
        dtype = xT.dtype
        nb = -(-n // block)
        npad = nb * block
        src = jnp.zeros((Dtot, npad), dtype).at[:, :n].set(xT)
        src_spec = pl.BlockSpec((Dtot, block), lambda i: (0, i))

    groups = _group_windows(len(pairs), P)

    def _norm2(sets):
        """-> per-window (nsets, 2P, 2P) stacks.

        Accepts the legacy list-of-lists [set][window] or the STACKED form
        (a flat list of per-window (nsets, 2P, 2P) arrays — structurally a
        list whose entries are arrays, not lists) that batched callers
        build with ONE vmapped combine per window."""
        if sets and not isinstance(sets[0], (list, tuple)):
            return list(sets)
        return [
            jnp.stack([sets[s][w] for s in range(len(sets))])
            for w in range(len(pairs))
        ]

    def _norm1(sets):
        if sets and not isinstance(sets[0], (list, tuple)):
            return list(sets)
        return [
            jnp.stack([sets[s][k] for s in range(len(sets))])
            for k in range(len(singles))
        ]

    G2w = _norm2(G2_sets) if pairs else []
    G1w = _norm1(G1_sets) if singles else []
    nsets = G2w[0].shape[0] if G2w else G1w[0].shape[0]

    inputs = [src]
    in_specs = [src_spec]
    # ONE stacked (nsets*rows, rows) input per group: per-window blocks are
    # placed with a vmapped pad over the (nsets, Wg) leading axes — a
    # handful of XLA ops instead of nsets x Wg tiny .at updates (the
    # hundreds of micro-ops that left the SLQ loss step scheduling-bound)
    for g in groups:
        rows = WR * len(g)
        Gw = jnp.stack([G2w[w] for w in g], axis=1)   # (nsets, Wg, 2P, 2P)
        Gpad = jax.vmap(jax.vmap(lambda G: _pad_G(G, P)))(Gw.astype(dtype))
        # block-diagonal placement: (nsets, Wg, WR, WR) -> (nsets*rows, rows)
        eye = jnp.eye(len(g), dtype=dtype)
        Gd = jnp.einsum("swab,wk->swakb", Gpad, eye).reshape(
            nsets * rows, rows
        )
        inputs.append(Gd)
        in_specs.append(pl.BlockSpec((nsets * rows, rows), lambda i: (0, 0)))
    if singles:
        bstack = jnp.stack([G1w[k] for k in range(len(singles))], axis=1)
        # (nsets, nsingles, 2P) -> padded (rows1, nsets)
        bpad = jax.vmap(jax.vmap(lambda gv: _pad_g1(gv, P)))(
            bstack.astype(dtype)
        )
        bv = bpad.reshape(nsets, WR * len(singles)).T
        inputs.append(bv)
        in_specs.append(
            pl.BlockSpec((WR * len(singles), nsets), lambda i: (0, 0))
        )

    y_shapes = [jax.ShapeDtypeStruct((1, npad), dtype) for _ in range(nsets)]
    y_specs = [pl.BlockSpec((1, block), lambda i: (0, i)) for _ in range(nsets)]

    outs = pl.pallas_call(
        functools.partial(
            _forward_kernel, P, pairs, singles, groups, nsets, prec, phase_gen
        ),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(y_specs),
        out_shape=tuple(y_shapes),
        interpret=interpret,
    )(*inputs)
    return [o[0, :n] for o in outs]
