"""Fourier-accelerated kernel matvecs ("fastsum") — the NFFT replacement.

Rebuild of SRC/external/nfft_interface.c + the NFFT3 fastsum engine, designed
for the MXU instead of gridding windows:

1. Geometry (once per dataset, nfft_interface.c:150-213): center points by
   the per-dim mean, compute the max radius, scale so radius <= 1/4 (scale =
   0.25/radius when radius is outside [1/8, 1/4]); precompute per-dim phase
   tables cos/sin(-2 pi k x_i[d]) for the N modes k in [-N/2, N/2).

2. Coefficients (per hyperparameters, cheap): the periodized kernel's Fourier
   coefficients b_k = (1/N^d) sum_j phi(||x_j||) e^{-2 pi i k.x_j} over the
   regular N^d torus grid — exactly what fastsum computes with its defaults
   p=1, eps_I=eps_B=0 (no near-field regularization; nfft_interface.c:18-27).
   phi is even on the torus, so b is REAL; a second coefficient set holds the
   analytic dk/dl samples (the derivative kernels xx_gaussian /
   der_laplacian_rbf of nfft_interface.c:219-231).

3. Apply: K x ~= f^2 (Re[ NDFT2( b * NDFT1(x) ) ] + mu x)
   where NDFT1/NDFT2 are EXACT adjoint/forward nonequispaced DFTs realized
   as dense phase-table contractions — separable over dims, cost O(n N) for
   d=1, O(n N^2) for d=2, N * O(n N^2) for d=3, all GEMMs on the systolic
   array.  Unlike NFFT's windowed gridding there is NO window approximation
   error; accuracy matches fastsum's periodization + truncation error
   (TEST1 oracle).

   All arithmetic is REAL (complex numbers carried as (re, im) pairs): the
   axon TPU backend does not implement complex host transfers, and real
   pairs let XLA pick the minimal matmul set.

Additive kernels (nfft_interface.c:622-840): one plan per feature window,
vmapped within groups of equal window dimension; the per-window outputs are
averaged and the noise term added once.
"""

import functools
import itertools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass
from .kernels import KernelParams, _BASE_KERNELS


@pytree_dataclass(static_fields=("N", "d"))
class FastsumGeometry:
    """Per-dataset NDFT geometry: scaled points + FOLDED real phase tables.

    The operator only ever applies the symmetric form
    K_ij = sum_k b_k cos(2 pi k.(x_i - x_j)), so the mode space folds by
    k -> -k onto the quadrant p = |k| (p in 0..N/2; p = N/2 holds the
    unpaired -N/2 edge mode).  Tables store cos/sin(2 pi p x) CONCATENATED
    along the mode axis (Tcs[..., :P] = cos, Tcs[..., P:] = sin with
    P = N/2 + 1): per-dim width 2P = N+2 instead of the full 2N — half the
    HBM traffic of the unfolded layout, and the adjoint is still ONE
    (2P, n) x (n, 2P) contraction whose four blocks are the folded
    cc/cs/sc/ss products (measured 1.5x on v5e at n=2e5).
    """

    N: int
    d: int
    x: jnp.ndarray          # (n, d) centered+scaled points, radius <= 1/4
    scale: jnp.ndarray      # scalar coordinate scale
    Tcs: jnp.ndarray        # (d, n, 2P): [cos(2 pi p x) | sin(2 pi p x)]


def _nmodes(N: int) -> int:
    """Folded mode count per dim: p = 0..N/2 inclusive."""
    return N // 2 + 1


def fastsum_geometry(X, N: int = 32, *, table_dtype=None) -> FastsumGeometry:
    """Center/scale points and precompute folded phase tables.

    Ref: nfft_interface.c:150-213 (mean-centering, radius in [1/8, 1/4]).

    table_dtype: store the phase tables in a narrower dtype (jnp.bfloat16)
    for ~1.8x matvec throughput on TPU (halved HBM traffic + 4x MXU rate);
    accumulation stays float32.  Costs ~3 digits of matvec accuracy (bf16
    has an 8-bit mantissa) — use for preconditioned-solver speed modes, not
    for accuracy-parity paths.
    """
    n, d = X.shape
    if d > 3:
        raise ValueError(
            f"fastsum supports point dims 1..3 (got d={d}); for higher-"
            "dimensional data use additive windows of <=3 features "
            "(ref nfft_interface.c:622-674) or the dense operator"
        )
    center = jnp.mean(X, axis=0)
    xc = X - center[None, :]
    radius = jnp.max(jnp.sqrt(jnp.sum(xc * xc, axis=1)))
    need = (radius > 0.25) | (radius < 0.125)
    scale = jnp.where(need, 0.25 / radius, 1.0)
    x = xc * scale

    p = jnp.arange(_nmodes(N), dtype=X.dtype)                  # 0..N/2
    phase = 2.0 * jnp.pi * x[:, :, None] * p[None, None, :]    # (n, d, P)
    Tcs = jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=2)
    Tcs = jnp.moveaxis(Tcs, 1, 0)                              # (d, n, 2P)
    if table_dtype is not None:
        Tcs = Tcs.astype(table_dtype)
    return FastsumGeometry(N=N, d=d, x=x, scale=scale, Tcs=Tcs)


def _full_tables(x, N: int):
    """Unfolded (d, n, 2N) [cos|sin](-2 pi k x) tables, k in [-N/2, N/2).

    Reference layout for tests and the unfolded helpers below."""
    k = jnp.arange(-(N // 2), N - N // 2, dtype=x.dtype)
    phase = -2.0 * jnp.pi * x[:, :, None] * k[None, None, :]
    Ecs = jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=2)
    return jnp.moveaxis(Ecs, 1, 0)


@pytree_dataclass(static_fields=("N", "d", "kind", "nf_sym"))
class FastsumPlan:
    """Kernel-specific plan: geometry + real Fourier coefficient stacks.

    The fast matrix IS the plan (nfft_interface.c:258-259).  `b`/`db_l` are
    the full shifted-order coefficient tensors (kept for the Pallas path and
    external consumers); `w`/`dw_l` are their parity-folded forms used by the
    folded-table apply (see _fold_maps).

    nf_idx/nf_val/nf_dval: optional sparse NEAR-FIELD correction — the role
    of fastsum's eps_I interior regularization + nearfield sum (NFFT3
    fastsum.c; the reference interface runs with eps=0,
    nfft_interface.c:18-27, accepting O(1/N) error at kernel kinks).  Row i
    holds the lfil nearest preceding neighbors (+ self in the last slot) with
    values phi_exact - phi_fourier at the pair offsets, applied symmetrically
    in the matvec.  Cuts Matérn-1/2 matvec error ~6x at N=32 (the error is
    concentrated at small pair distances; see fastsum_coeffs docstring).
    """

    N: int
    d: int
    kind: str
    geom: FastsumGeometry
    b: jnp.ndarray          # (N,)*d kernel coefficients (shifted order, real)
    db_l: jnp.ndarray       # (N,)*d coefficients of dk/dl (real)
    w: jnp.ndarray          # (nS,) + (P,)*d folded weights of b
    dw_l: jnp.ndarray       # (nS,) + (P,)*d folded weights of db_l
    params: KernelParams
    nf_idx: Optional[jnp.ndarray] = None    # (n, lfil) int32, self in last slot
    nf_val: Optional[jnp.ndarray] = None    # (n, lfil) phi_exact - phi_fourier
    nf_dval: Optional[jnp.ndarray] = None   # (n, lfil) same for d/dl
    nf_sym: bool = False                    # True: nf pattern is SYMMETRIZED
    # (each undirected edge + self appear once per row) and the apply is ONE
    # gather-based ell_matvec — no scatter-add transpose product, which
    # serializes on the tunneled TPU backend.  Correction values depend only
    # on the pair distance, so the symmetrized matrix equals S + S' - diag
    # of the lower-tri form exactly.  See symmetrize_pattern.


# --- parity folding ---------------------------------------------------------
#
# K_ij = sum_k b_k cos(2 pi k.D), D = x_i - x_j.  Per quadrant cell
# p = |k| with sign pattern sigma:
#   cos(2 pi (sigma*p).D) = Re prod_d (C_d + i sigma_d S_d)
#                         = sum_{S even} (-1)^{|S|/2} (prod_{d in S} sigma_d)
#                           prod_{d in S} S_d prod_{d not in S} C_d
# with C_d = cos(2 pi p_d D_d), S_d = sin(2 pi p_d D_d).  Folding b over the
# sign patterns gives one weight tensor per even-parity set S:
#   w_S(p) = sum_sigma (prod_{d in S} sigma_d) b_{sigma*p}.
# Each C_d/S_d then expands into per-point products (cc+ss / sc-cs), which is
# what the folded adjoint/forward GEMMs below realize.

_EVEN_SETS = {1: [()], 2: [(), (0, 1)], 3: [(), (0, 1), (0, 2), (1, 2)]}


@functools.lru_cache(maxsize=None)
def _fold_maps(N: int, d: int):
    """Static scatter maps: full shifted (N,)^d modes -> quadrant (P,)^d.

    Returns (flat_idx (N^d,), signs (nS, N^d)) as numpy; mode k = m - N/2,
    p = |k| (k = -N/2 -> p = N/2), sigma = sign(k) (sign(0) = +1).
    """
    H = N // 2
    k = np.arange(N) - H
    p = np.abs(k)
    sgn = np.where(k >= 0, 1.0, -1.0)
    P = _nmodes(N)
    pg = np.meshgrid(*([p] * d), indexing="ij")
    sg = np.meshgrid(*([sgn] * d), indexing="ij")
    flat_idx = sum(pg[j].reshape(-1) * P ** (d - 1 - j) for j in range(d))
    signs = []
    for S in _EVEN_SETS[d]:
        s = np.ones(N**d)
        for j in S:
            s = s * sg[j].reshape(-1)
        signs.append(s)
    return flat_idx.astype(np.int32), np.stack(signs)


def fold_coeffs(b, N: int, d: int):
    """Fold a full shifted-order coefficient tensor to (nS,) + (P,)*d.

    The fold map is separable (p_j = |k_j|, sigma_j = sign(k_j)), so it is
    d tiny static (P, N) matmuls per sign set — NOT a scatter-add:
    gather/scatter lowering on the tunneled TPU backend has pathological
    compile times (see kernels._window_slice).  Each map row has at most
    two unit entries, so the contraction is exact in f32.
    """
    H = N // 2
    P = _nmodes(N)
    k = np.arange(N) - H
    p = np.abs(k)
    sgn = np.where(k >= 0, 1.0, -1.0)
    A0 = (np.arange(P)[:, None] == p[None, :]).astype(np.float64)
    A1 = A0 * sgn[None, :]
    outs = []
    for S in _EVEN_SETS[d]:
        t = b.reshape((N,) * d)
        for j in range(d):
            A = jnp.asarray(A1 if j in S else A0, b.dtype)
            tj = jnp.moveaxis(t, j, 0)
            tj = jnp.tensordot(A, tj, axes=([1], [0]), precision="highest")
            t = jnp.moveaxis(tj, 0, j)
        outs.append(t)
    return jnp.stack(outs)


def _torus_grid_r2(N: int, d: int, dtype):
    """Squared radii of the N^d torus grid [-1/2, 1/2)^d in fft order."""
    g = jnp.fft.fftfreq(N, d=1.0 / N).astype(dtype) / N  # j/N wrapped to [-1/2,1/2)
    grids = jnp.meshgrid(*([g] * d), indexing="ij")
    return sum(gi * gi for gi in grids)


def _central_modes(bs, N: int, d: int):
    """Central N modes per dim of an fftshifted oversampled tensor."""
    Nos = bs.shape[0]
    lo = Nos // 2 - N // 2
    sl = (slice(lo, lo + N),) * d
    return bs[sl]


def _trigpoly_eval_multi(bs, D):
    """Re sum_k b_k e^{2 pi i k.D} for SEVERAL coefficient sets at once.

    bs: list of (N,)*d real coefficient tensors (shifted mode order); D:
    (m, d) offsets.  The phase tables C/S are built once and shared across
    the sets (the near-field correction evaluates the kernel AND its dk/dl
    derivative at the same pair offsets)."""
    d = D.shape[1]
    N = bs[0].shape[0]
    k = jnp.arange(-(N // 2), N - N // 2, dtype=D.dtype)
    ph = 2.0 * jnp.pi * D[:, :, None] * k[None, None, :]   # (m, d, N)
    C = jnp.cos(ph)
    S = jnp.sin(ph)
    outs = []
    for b in bs:
        if d == 1:
            outs.append(C[:, 0, :] @ b)
        elif d == 2:
            cc = jnp.einsum("mk,kl,ml->m", C[:, 0], b, C[:, 1])
            ss = jnp.einsum("mk,kl,ml->m", S[:, 0], b, S[:, 1])
            outs.append(cc - ss)
        elif d == 3:
            def tri(A1, A2, A3):
                return jnp.einsum("mk,klr,ml,mr->m", A1, b, A2, A3)

            outs.append(
                tri(C[:, 0], C[:, 1], C[:, 2])
                - tri(C[:, 0], S[:, 1], S[:, 2])
                - tri(S[:, 0], C[:, 1], S[:, 2])
                - tri(S[:, 0], S[:, 1], C[:, 2])
            )
        else:
            raise NotImplementedError(f"trigpoly_eval supports d=1..3, got {d}")
    return outs


def trigpoly_eval(b, D):
    """Re sum_k b_k e^{2 pi i k.D} at arbitrary offsets D (m, d).

    b: (N,)*d real coefficients in shifted mode order.  Used by the
    near-field correction (values of the Fourier operator's kernel at pair
    offsets) and by tests.
    """
    return _trigpoly_eval_multi([b], D)[0]


def trigpoly_eval_multi_chunked(bs, D, *, chunk: int = 131072):
    """Chunked _trigpoly_eval_multi: a flat eval materializes (m, d, N)
    phase intermediates — tens of GB at near-field scale (m = n * lfil_r,
    N up to 256).  lax.map over pair chunks bounds the transient at
    ~chunk * d * N while each chunk is still a full batched GEMM."""
    m = D.shape[0]
    if m <= chunk:
        return _trigpoly_eval_multi(bs, D)
    nch = -(-m // chunk)
    Dp = jnp.zeros((nch * chunk, D.shape[1]), D.dtype).at[:m].set(D)
    parts = jax.lax.map(
        lambda Dc: tuple(_trigpoly_eval_multi(bs, Dc)),
        Dp.reshape(nch, chunk, D.shape[1]),
    )
    return [p.reshape(-1)[:m] for p in parts]


def nearfield_correction(kind: str, params: KernelParams, geom: FastsumGeometry,
                         b, db_l, lfil: int, pattern=None, taper: bool = True):
    """Sparse correction phi_exact - phi_fourier on a KNN pattern.

    The fastsum analog of NFFT3's eps_I nearfield sum: the Fourier operator's
    pointwise error is concentrated at small pair distances (kernel kinks),
    so correcting each point's lfil nearest preceding neighbors (+ the
    diagonal, slot lfil-1) recovers most of the truncation error for
    non-smooth kernels.  Returns (idx, val, dval); apply symmetrically with
    nearfield_matvec.

    taper (default True): weight the correction by (1 - r/r_max)^2 with
    r_max the pattern's largest valid pair distance.  The RAW correction is
    an indefinite sparse perturbation whose magnitude grows as neighbor
    distances shrink: measured lambda_min of the corrected operator at
    matern12 l=0.5 2-D is -0.042 at n=4e3 and -0.066 at n=8e3 (>> mu=0.01;
    .r5_m12_diag2_l05.log) — the root cause of the r4
    AFN_PCG_3e4_matern12_f64cpu divergence.  The smooth roll-off removes
    the hard pattern-edge truncation and restores PSD (+9.6e-4 at the same
    config) at unchanged max operator error.  r_max is a single global
    scalar so the tapered matrix stays exactly symmetric on both the
    lower-tri and symmetrized patterns.

    pattern: optional precomputed (idx, mask) from knn_pattern — the pattern
    is params-INDEPENDENT, so training loops should compute it once per
    dataset (see nearfield_patterns / additive_nearfield_patterns) instead
    of per loss eval.
    """
    from .knn import knn_pattern

    x = geom.x
    idx, mask = pattern if pattern is not None else knn_pattern(x, lfil)
    D = x[:, None, :] - x[idx]                       # (n, lfil, d)
    r2s = jnp.sum(D * D, axis=2)
    r2_true = r2s / (geom.scale * geom.scale)
    phi, dphi_l = _BASE_KERNELS[kind](r2_true, params.l)
    m = D.reshape(-1, D.shape[2])
    tp_f, dtp_f = trigpoly_eval_multi_chunked([b, db_l], m)
    tp = tp_f.reshape(r2s.shape)
    dtp = dtp_f.reshape(r2s.shape)
    val = jnp.where(mask, phi - tp, 0.0)
    dval = jnp.where(mask, dphi_l - dtp, 0.0)
    if taper:
        r = jnp.sqrt(r2s)
        r_max = jnp.max(jnp.where(mask, r, 0.0))
        w = jnp.square(jnp.maximum(1.0 - r / jnp.maximum(r_max, 1e-30), 0.0))
        val = val * w
        dval = dval * w
    return idx, val, dval


def nearfield_matvec(idx, val, x):
    """y = (S + S' - diag(S)) x for lower-tri padded-ELL S (self at slot -1)."""
    from .matops import ell_matvec, ell_rmatvec

    return (
        ell_matvec(idx, val, x)
        + ell_rmatvec(idx, val, x)
        - val[:, -1] * x
    )


def nearfield_apply(sym: bool, idx, val, x):
    """Near-field product: one ELL gather-matvec for symmetric patterns,
    the legacy S + S' - diag form for lower-tri in-jit patterns."""
    from .matops import ell_matvec

    if sym:
        return ell_matvec(idx, val, x)
    return nearfield_matvec(idx, val, x)


def nearfield_apply_batch(sym: bool, idx, val, Xb):
    """(nv, n) batched near-field products: the symmetric form shares ONE
    row-gather across all RHS (ops/matops.ell_matvec_batch) — the same
    multi-RHS economics as the packed-NDFT table stream."""
    from .matops import ell_matvec_batch

    if sym:
        return ell_matvec_batch(idx, val, Xb)
    return jax.vmap(lambda v: nearfield_matvec(idx, val, v))(Xb)


def symmetrize_pattern(idx, mask):
    """HOST-side symmetrization of a lower-tri KNN pattern (self at slot -1).

    Returns numpy (sym_idx, sym_mask) of shape (n, lfil_s) where row i lists
    each undirected neighbor edge once plus self once.  An ELL matrix built
    by evaluating a SYMMETRIC pair function on this pattern is symmetric,
    so the near-field apply is a single gather-based ell_matvec — the
    scatter-add transpose product of the lower-tri form serializes on the
    tunneled TPU backend (~15 ms at (1e5, 16), r4 profiling).
    """
    import numpy as _np

    idx = _np.asarray(idx)
    mask = _np.asarray(mask)
    n, lfil = idx.shape
    rows, slots = _np.nonzero(mask)
    cols = idx[rows, slots]
    keep = rows != cols                      # drop self edges; re-add once
    e_r = _np.concatenate([rows[keep], cols[keep], _np.arange(n)])
    e_c = _np.concatenate([cols[keep], rows[keep], _np.arange(n)])
    order = _np.argsort(e_r, kind="stable")
    e_r, e_c = e_r[order], e_c[order]
    starts = _np.searchsorted(e_r, _np.arange(n))
    counts = _np.searchsorted(e_r, _np.arange(n) + 1) - starts
    lfil_s = int(counts.max()) if counts.size else 1
    sym_idx = _np.zeros((n, lfil_s), _np.int32)
    sym_mask = _np.zeros((n, lfil_s), bool)
    rank = _np.arange(e_r.size) - starts[e_r]
    sym_idx[e_r, rank] = e_c
    sym_mask[e_r, rank] = True
    return sym_idx, sym_mask


def nearfield_patterns(kind: str, geom: FastsumGeometry,
                       nearfield_lfil=None, *, sym: bool = False):
    """Precompute the params-independent KNN pattern for a single plan.

    sym=True (host-side callers only): symmetrize the pattern so the
    near-field apply is one gather-matvec (see symmetrize_pattern)."""
    from .knn import knn_pattern

    lfil = _resolve_nf_lfil(kind, nearfield_lfil, geom.x.shape[0], geom.d)
    if lfil == 0:
        return None
    pat = knn_pattern(geom.x, lfil)
    if not sym:
        return pat
    sidx, smask = symmetrize_pattern(pat[0], pat[1])
    if sidx.shape[1] > max(4 * lfil, 64):   # skewed in-degree guard (above)
        return (pat[0], pat[1], False)
    return (jnp.asarray(sidx), jnp.asarray(smask), True)


def additive_nearfield_patterns(kind: str, geom, nearfield_lfil=None):
    """Per-group batched KNN patterns for an AdditiveFastsumGeometry.

    Returns a tuple (one entry per geometry group) of None or batched
    (idx, mask) arrays of shape (Wg, n, lfil) — pass to
    additive_fastsum_coeffs(nf_patterns=...) so training loops do the
    O(n^2)-blocked KNN once per dataset, not per loss eval.
    """
    from .knn import knn_pattern

    pats = []
    for dw, order, bg in geom.groups:
        n = bg.x.shape[1]
        d = bg.x.shape[2]
        lfil = _resolve_nf_lfil(kind, nearfield_lfil, n, d)
        if lfil == 0:
            pats.append(None)
        else:
            pats.append(jax.vmap(lambda xw: knn_pattern(xw, lfil))(bg.x))
    return tuple(pats)


def symmetrize_nearfield_patterns(pats):
    """HOST-side post-pass over additive_nearfield_patterns output: per
    window, symmetrize the lower-tri KNN pattern (symmetrize_pattern) so the
    near-field apply is one gather-matvec.  Per-group windows pad to a
    common lfil_s.  Returns per-group (idx, mask, True) triples.
    """
    import numpy as _np

    all_syms = []
    for pat in pats:
        if pat is None:
            all_syms.append(None)
            continue
        idxs, masks = _np.asarray(pat[0]), _np.asarray(pat[1])
        lfil = idxs.shape[2]
        syms = [symmetrize_pattern(idxs[w], masks[w]) for w in range(idxs.shape[0])]
        lf = max(si.shape[1] for si, _ in syms)
        # skewed in-degree guard: a point that is the nearest-preceding
        # neighbor of many later points blows the pad-to-max width (measured
        # lfil_s=465 for a 3-D window at n=13k -> a 24 GB gather transient);
        # beyond ~4x lfil the padded-symmetric form wastes more than the
        # scatter costs.  The decision is GLOBAL (all groups or none): the
        # packed apply carries ONE static nf_sym flag per plan.
        if lf > max(4 * lfil, 64):
            return tuple(
                None if pat is None else (pat[0], pat[1], False) for pat in pats
            )
        all_syms.append((idxs.shape, lf, syms))

    out = []
    for pat, info in zip(pats, all_syms):
        if pat is None:
            out.append(None)
            continue
        (Wg, n, _lfil), lf, syms = info
        sidx = _np.zeros((Wg, n, lf), _np.int32)
        smask = _np.zeros((Wg, n, lf), bool)
        for w, (si, sm) in enumerate(syms):
            sidx[w, :, : si.shape[1]] = si
            smask[w, :, : si.shape[1]] = sm
        out.append((jnp.asarray(sidx), jnp.asarray(smask), True))
    return tuple(out)


class NfStencilDirect(NamedTuple):
    """Radius near-field computed DIRECTLY in stencil layout (no ELL).

    The correction support is "all pairs within rho" — exactly the cell
    pitch — so the StencilMatrix values can be evaluated straight from the
    padded cell coordinates (pair offsets by shifted slices) instead of
    embedding ELL rows, whose one-hot pass blows up at radius-pattern
    widths (HBM OOM at nf~128, .r5_m12_1e5_chip2.log).  Host-built once
    per dataset; values refresh with params in packed_ndft_plan."""

    dev: object            # cellgrid.CellGridDev
    Xpad: jnp.ndarray      # (ncells, c, d) padded SCALED window coords
    nbmask: jnp.ndarray    # (ncells, 3^d c) neighbor-slot validity
    rho: float             # correction radius (= grid pitch)


def additive_nearfield_stencil_direct(geom, kind: str, nearfield_lfil=None,
                                      *, max_width_factor: int = 48):
    """HOST: per-group tuples of NfStencilDirect for d <= 2 windows.

    nearfield_lfil sizes the radius via the cell occupancy (occ ~ lfil/3
    so the in-radius degree ~ lfil).  Returns None when any window's grid
    degenerates (global decision).  d=3 groups get None entries (they ride
    the table path with ELL near-field)."""
    from . import cellgrid as cg

    out = []
    for dw, order, bg in geom.groups:
        n = bg.x.shape[1]
        d = bg.x.shape[2]
        lfil = _resolve_nf_lfil(kind, nearfield_lfil, n, d)
        if lfil == 0 or d == 3:
            out.append(None)
            continue
        entries = []
        for w in range(bg.x.shape[0]):
            x_np = np.asarray(bg.x[w])
            occ = max(4.0, lfil / 3.0)
            grid = cg.build_cell_grid(x_np, target_occupancy=occ)
            if grid is None or grid.noffs * grid.c > max_width_factor * max(lfil, 8):
                return None
            dev = cg.to_device(grid)
            Xpad = jnp.stack(
                [cg.pad_cells_user(dev, bg.x[w][:, j]) for j in range(d)],
                axis=-1,
            )
            nbmask = cg.stencil_neighbors(
                dev, dev.padmask.astype(jnp.float32)
            ) > 0.5
            entries.append(NfStencilDirect(dev=dev, Xpad=Xpad, nbmask=nbmask,
                                           rho=float(grid.h)))
        out.append(tuple(entries))
    return tuple(out)


def _nf_direct_values(sten: NfStencilDirect, kind: str, params, scale,
                      b, db_l, require_grad: bool,
                      cell_chunk: Optional[int] = None):
    """DEVICE (jit-safe): StencilMatrix value sets for a direct stencil.

    Per cell chunk: pair offsets from the padded coords via shifted slices,
    exact kernel minus the trigpoly (chunked phase tables), tapered by
    (1 - r/rho)^2 — the same formula as nearfield_correction on the radius
    support, with the ELL layout skipped entirely."""
    from . import cellgrid as cg

    dev = sten.dev
    c = dev.c
    w9 = dev.noffs * c
    d = sten.Xpad.shape[-1]
    ncells = dev.ncells
    nbr_x = cg.stencil_neighbors(dev, sten.Xpad)        # (ncells, 3^d c, d)
    rho = sten.rho
    if cell_chunk is None:
        # bound the trigpoly phase transient (pairs, d, N) at ~200 MB
        N = b.shape[0]
        pairs_budget = max(1, 50_000_000 // max(d * N, 1))
        cell_chunk = max(1, pairs_budget // max(c * w9, 1))

    def one_chunk(args):
        Xp_c, nb_c, nbm_c = args
        D = Xp_c[:, :, None, :] - nb_c[:, None, :, :]   # (cc, c, w9, d)
        r2s = jnp.sum(D * D, axis=3)
        r2_true = r2s / (scale * scale)
        phi, dphi_l = _BASE_KERNELS[kind](r2_true, params.l)
        sets = [b, db_l] if require_grad else [b]
        tps = _trigpoly_eval_multi(sets, D.reshape(-1, d))
        r = jnp.sqrt(r2s)
        w = jnp.square(jnp.maximum(1.0 - r / rho, 0.0))
        m = nbm_c[:, None, :] & (r2s <= rho * rho)
        outs = []
        for src, tp_f in zip([phi, dphi_l][: len(sets)], tps):
            v = jnp.where(m, (src - tp_f.reshape(r2s.shape)) * w, 0.0)
            outs.append(v)
        return tuple(outs)

    nch = -(-ncells // cell_chunk)
    padc = nch * cell_chunk
    Xp = jnp.zeros((padc, c, d), sten.Xpad.dtype).at[:ncells].set(sten.Xpad)
    Nb = jnp.zeros((padc, w9, d), nbr_x.dtype).at[:ncells].set(nbr_x)
    Nm = jnp.zeros((padc, w9), bool).at[:ncells].set(sten.nbmask)
    parts = jax.lax.map(
        one_chunk,
        (Xp.reshape(nch, cell_chunk, c, d),
         Nb.reshape(nch, cell_chunk, w9, d),
         Nm.reshape(nch, cell_chunk, w9)),
    )
    mats = []
    for p in parts:
        M = p.reshape(padc, c, w9)[:ncells]             # M[cell, i, t*c+j]
        mats.append(cg.StencilMatrix(A=M))              # canonical layout
    A_k = mats[0]
    A_l = mats[1] if len(mats) > 1 else None
    return NfStencilEntry(dev=dev, A_k=A_k, A_l=A_l,
                          exc_rows=jnp.zeros((1,), jnp.int32),
                          exc_cols=jnp.zeros((1,), jnp.int32),
                          exc_v_k=jnp.zeros((1,), A_k.A.dtype),
                          exc_v_l=(jnp.zeros((1,), A_k.A.dtype)
                                   if A_l is not None else None))


class NfStencilEntry(NamedTuple):
    """Per-window embedded near-field operator (lives in PackedNDFT.nf*).

    exc_*: the pattern's few out-of-stencil edges (cellgrid.StencilEmbed
    exception list) applied as a tiny symmetric COO side term."""

    dev: object            # cellgrid.CellGridDev
    A_k: object            # StencilMatrix of the kernel correction
    A_l: object            # StencilMatrix of the dk/dl correction (or None)
    exc_rows: object
    exc_cols: object
    exc_v_k: object        # (ne,) exception values (kernel set)
    exc_v_l: object        # (ne,) or None


def _nf_exc_apply(trip: NfStencilEntry, x, which: str):
    """Symmetric COO exception term: y += v * x[cols] at rows and mirrored."""
    v = trip.exc_v_k if which == "k" else trip.exc_v_l
    y = jnp.zeros_like(x)
    y = y.at[trip.exc_rows].add(v * x[trip.exc_cols])
    return y.at[trip.exc_cols].add(v * x[trip.exc_rows])


def _nf_trip_apply(nf_sym: bool, trip, x, which: str):
    """Apply one window's near-field correction (ELL triple or stencil)."""
    if isinstance(trip, NfStencilEntry):
        from .cellgrid import stencil_matvec

        A = trip.A_k if which == "k" else trip.A_l
        return stencil_matvec(trip.dev, A, x, user_order=True) + _nf_exc_apply(
            trip, x, which
        )
    idx, val, dval = trip
    return nearfield_apply(nf_sym, idx, val if which == "k" else dval, x)


def _nf_trip_apply_batch(nf_sym: bool, trip, Xb, which: str):
    """Batched (nv, n) variant sharing one pad/unpad across all RHS."""
    if isinstance(trip, NfStencilEntry):
        from .cellgrid import stencil_matvec

        y = stencil_matvec(trip.dev, A := (trip.A_k if which == "k" else trip.A_l),
                           Xb.T, user_order=True).T
        v = trip.exc_v_k if which == "k" else trip.exc_v_l
        y = y.at[:, trip.exc_rows].add(v[None, :] * Xb[:, trip.exc_cols])
        y = y.at[:, trip.exc_cols].add(v[None, :] * Xb[:, trip.exc_rows])
        return y
    idx, val, dval = trip
    return nearfield_apply_batch(nf_sym, idx, val if which == "k" else dval, Xb)


def _resolve_nf_lfil(kind: str, nearfield_lfil, n: int, d: int) -> int:
    """None = auto: near-field size for matern12, else 0.  The matern12 kink
    makes the pure Fourier operator ~4e-2 inaccurate at N=32; the reference's
    fastsum near-field regularization is always-on (nfft_interface.c:18-27),
    so the corrected operator is the DEFAULT for the non-smooth kernel.

    The kink-error width is ~1/N in scaled coordinates; in 1-D that radius
    holds ~4x more uniform neighbors than in 2-D/3-D at equal n (measured:
    d=1 needs lfil 64 where d=2 needs 16 to cross below 1e-2 rel error)."""
    if nearfield_lfil is None:
        nearfield_lfil = (64 if d == 1 else 16) if kind == "matern12" else 0
    return min(int(nearfield_lfil), n)


def fastsum_coeffs(kind: str, params: KernelParams, geom: FastsumGeometry,
                   *, psd_clip: bool = False, oversample: int = 2,
                   nearfield_lfil: Optional[int] = None,
                   nf_pattern=None) -> FastsumPlan:
    """Sample the (scaled) kernel on an OVERSAMPLED torus grid, FFT, and
    truncate to the central N modes — per params.

    oversample (default 2): the torus kernel is sampled on (oversample*N)^d
    points; the FFT's central N modes per dim are kept.  This is the
    anti-aliasing role of fastsum's NN = next-pow2(2N) grid
    (nfft_interface.c:18-27): a direct N-grid DFT folds all aliases
    c_{k+mN} into b_k, which for slowly-decaying spectra (Matérn-1/2,
    |c_k| ~ k^-2) costs ~1e-2 matvec accuracy; the 2N-grid quadrature
    recovers near-true periodized coefficients (matern12 matvec error
    6e-2 -> <5e-3 at N=32).  oversample=1 reproduces the round-1 aliased
    coefficients.

    phi is an even function on the torus so the DFT is real; the real part is
    kept (imag is roundoff), stored in shifted mode order (index m <-> mode
    k = m - N/2, matching the phase tables).

    psd_clip (default False): the true spectra of these kernels are positive;
    negative coefficients are truncation/aliasing artifacts, and clipping
    them to 0 projects the fast operator onto the PSD cone so PCG never
    breaks down (the reference's unclipped fastsum operator is only
    approximately SPD, which is why its loss path uses FGMRES,
    gp_loss.c:199-213).  Clipping costs pointwise accuracy at long
    lengthscales (the negative tail partially cancels periodization error),
    so it is opt-in: enable for PCG on the Fourier operator, leave off for
    FGMRES/SLQ paths and accuracy parity.  Derivative coefficients are never
    clipped.
    """
    N, d = geom.N, geom.d
    Nos = int(oversample) * N
    dtype = geom.x.dtype
    r2g = _torus_grid_r2(Nos, d, dtype)
    r2_true = r2g / (geom.scale * geom.scale)
    k_samp, dk_dl_samp = _BASE_KERNELS[kind](r2_true, params.l)

    def coeffs(samp):
        bs = jnp.real(jnp.fft.fftshift(jnp.fft.fftn(samp))).astype(dtype) / (Nos**d)
        return _central_modes(bs, N, d)

    b = coeffs(k_samp)
    if psd_clip:
        b = jnp.maximum(b, 0.0)
    db_l = coeffs(dk_dl_samp)
    nf_idx = nf_val = nf_dval = None
    nf_sym = False
    nearfield_lfil = _resolve_nf_lfil(kind, nearfield_lfil, geom.x.shape[0], geom.d)
    if nf_pattern is not None and len(nf_pattern) == 3:
        nf_pattern, nf_sym = nf_pattern[:2], bool(nf_pattern[2])
    if nearfield_lfil > 0 or nf_pattern is not None:
        nf_idx, nf_val, nf_dval = nearfield_correction(
            kind, params, geom, b, db_l, nearfield_lfil, pattern=nf_pattern
        )
    return FastsumPlan(
        N=N, d=d, kind=kind, geom=geom, b=b, db_l=db_l,
        w=fold_coeffs(b, N, d), dw_l=fold_coeffs(db_l, N, d), params=params,
        nf_idx=nf_idx, nf_val=nf_val, nf_dval=nf_dval, nf_sym=nf_sym,
    )


def fastsum_build(kind: str, params: KernelParams, X, N: int = 32,
                  *, psd_clip: bool = False, table_dtype=None,
                  oversample: int = 2,
                  nearfield_lfil: Optional[int] = None) -> FastsumPlan:
    return fastsum_coeffs(
        kind, params, fastsum_geometry(X, N, table_dtype=table_dtype),
        psd_clip=psd_clip, oversample=oversample, nearfield_lfil=nearfield_lfil,
    )


# --- exact separable NDFTs (real-pair arithmetic) --------------------------

def _hmat(a, b):
    """Matmul at highest precision (bf16 default degrades NDFT accuracy)."""
    return jnp.matmul(a, b, precision="highest")


def _ndft_adjoint(Ecs, alpha):
    """(re, im) of \\hat e_k = sum_i alpha_i prod_d E[d, i, k_d].

    Ecs: (d, n, 2N) concatenated cos|sin tables.  For d>=2 the four re/im
    cross products come out of ONE (2N x n)(n x 2N) contraction.
    """
    d = Ecs.shape[0]
    N = Ecs.shape[2] // 2
    if d == 1:
        v = _hmat(Ecs[0].T, alpha)
        return v[:N], v[N:]
    if d == 2:
        Acat = Ecs[0] * alpha[:, None]
        M = _hmat(Acat.T, Ecs[1])          # (2N, 2N) all four blocks
        re = M[:N, :N] - M[N:, N:]
        im = M[:N, N:] + M[N:, :N]
        return re, im
    if d == 3:
        # loop over the last dim's modes
        def one_mode(c3, s3):
            wr = alpha * c3
            wi = alpha * s3
            Acat = jnp.concatenate(
                [
                    Ecs[0, :, :N] * wr[:, None] - Ecs[0, :, N:] * wi[:, None],
                    Ecs[0, :, :N] * wi[:, None] + Ecs[0, :, N:] * wr[:, None],
                ],
                axis=1,
            )
            M = _hmat(Acat.T, Ecs[1])
            re = M[:N, :N] - M[N:, N:]
            im = M[:N, N:] + M[N:, :N]
            return re, im

        res, ims = jax.vmap(one_mode, in_axes=(1, 1), out_axes=2)(
            Ecs[2, :, :N], Ecs[2, :, N:]
        )
        return res, ims
    raise NotImplementedError(f"fastsum supports window dims 1..3, got {d}")


def _ndft_forward_real(Ecs, Cre, Cim):
    """f_i = Re[ sum_k C_k prod_d conj(E[d, i, k_d]) ] with conj(E) = Ec - i Es.

    One (n, 2N)(2N, 2N) GEMM produces [T_re | T_im]; the final reduction is
    a fused elementwise-multiply + rowsum against the second table.
    """
    d = Ecs.shape[0]
    N = Ecs.shape[2] // 2
    if d == 1:
        return _hmat(Ecs[0], jnp.concatenate([Cre, Cim]))
    if d == 2:
        RHS = jnp.concatenate(
            [
                jnp.concatenate([Cre, Cim], axis=1),
                jnp.concatenate([Cim, -Cre], axis=1),
            ],
            axis=0,
        )                                   # (2N, 2N)
        T = _hmat(Ecs[0], RHS)              # (n, 2N) = [T_re | T_im]
        return jnp.sum(T * Ecs[1], axis=1)
    if d == 3:
        def one_mode(C2re, C2im, c3, s3):
            RHS = jnp.concatenate(
                [
                    jnp.concatenate([C2re, C2im], axis=1),
                    jnp.concatenate([C2im, -C2re], axis=1),
                ],
                axis=0,
            )
            T = _hmat(Ecs[0], RHS)
            U_re = jnp.sum(T[:, :N] * Ecs[1, :, :N] + T[:, N:] * Ecs[1, :, N:], axis=1)
            U_im = jnp.sum(T[:, N:] * Ecs[1, :, :N] - T[:, :N] * Ecs[1, :, N:], axis=1)
            return U_re * c3 + U_im * s3

        parts = jax.vmap(one_mode, in_axes=(2, 2, 1, 1), out_axes=0)(
            Cre, Cim, Ecs[2, :, :N], Ecs[2, :, N:]
        )
        return jnp.sum(parts, axis=0)
    raise NotImplementedError


# --- folded apply (the default fast path) ----------------------------------

def _tmat(A, B, out_dtype):
    """Phase-table GEMM: full-precision f32, or table-dtype (bf16) operands
    with out_dtype (f32) MXU accumulation when the tables are narrow."""
    if A.dtype == out_dtype and B.dtype == out_dtype:
        return jnp.matmul(A, B, precision="highest")
    return jnp.matmul(A, B.astype(A.dtype), preferred_element_type=out_dtype)


def _folded_adjoint(Tcs, alpha):
    """Block tensor A_t[p] = sum_i alpha_i prod_d t_d(2 pi p_d x_id).

    Tcs: (d, n, 2P) folded tables (x-dtype, or narrow e.g. bf16).  Output
    shape (2P,)*d in alpha's dtype; block t (a {cos,sin}^d choice) lives at
    slice [t_1*P:(t_1+1)*P, ...]."""
    d = Tcs.shape[0]
    P = Tcs.shape[2] // 2
    out_dtype = alpha.dtype
    a = alpha.astype(Tcs.dtype)
    if d == 1:
        return _tmat(Tcs[0].T, a, out_dtype)
    if d == 2:
        return _tmat((Tcs[0] * a[:, None]).T, Tcs[1], out_dtype)
    if d == 3:
        def one_mode(c3, s3):
            Acat = jnp.concatenate(
                [Tcs[0] * (a * c3)[:, None], Tcs[0] * (a * s3)[:, None]],
                axis=1,
            )                                    # (n, 4P)
            return _tmat(Acat.T, Tcs[1], out_dtype)   # (4P, 2P)

        M3 = jax.vmap(one_mode, in_axes=(1, 1), out_axes=0)(
            Tcs[2, :, :P], Tcs[2, :, P:]
        )                                        # (P, 4P, 2P)
        Ac = jnp.moveaxis(M3[:, : 2 * P, :], 0, 2)   # (2P, 2P, P): t3 = cos
        As = jnp.moveaxis(M3[:, 2 * P :, :], 0, 2)   # t3 = sin
        return jnp.concatenate([Ac, As], axis=2)
    raise NotImplementedError(f"fastsum supports window dims 1..3, got {d}")


def _folded_combine(W, A, d: int):
    """B_t = sum_S (-1)^{|S|/2} sign_t(S) W_S A_{t xor S} over even sets S,
    sign_t(S) = prod_{j in S} (+1 if t_j = sin else -1)."""
    P = W.shape[-1]
    sets = _EVEN_SETS[d]

    def blk(T, t):
        return T[tuple(slice(P * tj, P * (tj + 1)) for tj in t)]

    blocks = {}
    for t in itertools.product((0, 1), repeat=d):
        B = W[0] * blk(A, t)
        for si, S in enumerate(sets[1:], start=1):   # |S| = 2 -> factor -1
            sign = 1
            for j in S:
                sign *= 1 if t[j] == 1 else -1
            t_flip = tuple(tj ^ (1 if j in S else 0) for j, tj in enumerate(t))
            B = B - sign * W[si] * blk(A, t_flip)
        blocks[t] = B

    def assemble(prefix):
        if len(prefix) == d:
            return blocks[prefix]
        ax = len(prefix)
        return jnp.concatenate(
            [assemble(prefix + (0,)), assemble(prefix + (1,))], axis=ax
        )

    return assemble(())


def _folded_forward(Tcs, B):
    """y_i = sum_t prod_d t_d(2 pi p_d x_id) B_t[p] from the block tensor."""
    d = Tcs.shape[0]
    P = Tcs.shape[2] // 2
    out_dtype = B.dtype
    if d == 1:
        return _tmat(Tcs[0], B, out_dtype)
    if d == 2:
        T = _tmat(Tcs[0], B, out_dtype)
        return jnp.sum(T * Tcs[1].astype(out_dtype), axis=1)
    if d == 3:
        def one_mode(Bc, Bs, c3, s3):
            Tt = _tmat(Tcs[0], jnp.concatenate([Bc, Bs], axis=1), out_dtype)
            T1f = Tcs[1].astype(out_dtype)                          # (n, 2P)
            yc = jnp.sum(Tt[:, : 2 * P] * T1f, axis=1)
            ys = jnp.sum(Tt[:, 2 * P :] * T1f, axis=1)
            return yc * c3.astype(out_dtype) + ys * s3.astype(out_dtype)

        parts = jax.vmap(one_mode, in_axes=(2, 2, 1, 1), out_axes=0)(
            B[:, :, :P], B[:, :, P:], Tcs[2, :, :P], Tcs[2, :, P:]
        )
        return jnp.sum(parts, axis=0)
    raise NotImplementedError


def _folded_adjoint_comp(Tcs, alpha, chunk: int = 8192):
    """Chunked-COMPENSATED folded adjoint (float-float combination).

    The adjoint is the matvec's only n-long reduction, so plain f32 MXU
    accumulation carries ~sqrt(n)*eps relative noise (~1e-4 at n=1e6) —
    the floor that stalls deep-tolerance PCG on chip (the reference runs
    f64 CPU, SRC/utils/utils.h:28-32).  Splitting the points axis into
    `chunk`-sized GEMMs and combining the per-chunk (2P,)^d mode tensors
    with an error-free TwoSum scan caps the accumulation error at
    ~sqrt(chunk)*eps (~5e-6), independent of n, for ~zero extra HBM
    traffic (the mode tensors are tiny) and full-size MXU chunk GEMMs.
    """
    from ..solvers.reductions import _two_sum

    d, n = Tcs.shape[0], Tcs.shape[1]
    if n <= chunk:
        return _folded_adjoint(Tcs, alpha)
    nb = -(-n // chunk)
    npad = nb * chunk
    Tp = jnp.zeros((d, npad, Tcs.shape[2]), Tcs.dtype).at[:, :n].set(Tcs)
    ap = jnp.zeros((npad,), alpha.dtype).at[:n].set(alpha)
    Tc = Tp.reshape(d, nb, chunk, Tcs.shape[2])
    ac = ap.reshape(nb, chunk)
    parts = jax.vmap(_folded_adjoint, in_axes=(1, 0))(Tc, ac)

    def step(carry, p):
        hi, lo = carry
        hi, e = _two_sum(hi, p)
        return (hi, lo + e), None

    z = jnp.zeros_like(parts[0])
    (hi, lo), _ = jax.lax.scan(step, (z, z), parts)
    return hi + lo


def _folded_apply_multi(Tcs, W_list, x, *, compensated: bool = False):
    """One adjoint, one forward per folded weight stack (shared NDFT1).

    compensated=True uses the chunked float-float adjoint (see
    _folded_adjoint_comp) — the deep-tolerance operator mode."""
    d = Tcs.shape[0]
    A = _folded_adjoint_comp(Tcs, x) if compensated else _folded_adjoint(Tcs, x)
    return [_folded_forward(Tcs, _folded_combine(W, A, d)) for W in W_list]


def fastsum_base_apply(plan: FastsumPlan, coeffs, x):
    """sum_j coeffs-kernel-sum — the pure kernel matvec (no f^2/mu).

    coeffs: full shifted-order (N,)*d tensor (e.g. plan.b / plan.db_l);
    folded on the fly (N^d elements — negligible next to the n-sized GEMMs).
    """
    W = fold_coeffs(coeffs, plan.N, plan.d)
    (y,) = _folded_apply_multi(plan.geom.Tcs, [W], x)
    return y


def fastsum_matvec(plan: FastsumPlan, x, *, compensated: bool = False):
    """y = f^2 (ksum(x) + mu x) — ref Nfft4GPNFFTMatSymv nfft_interface.c:400-497."""
    p = plan.params
    f2 = p.f * p.f
    (y,) = _folded_apply_multi(plan.geom.Tcs, [plan.w], x, compensated=compensated)
    if plan.nf_val is not None:
        y = y + nearfield_apply(plan.nf_sym, plan.nf_idx, plan.nf_val, x)
    return f2 * (y + p.mu * x)


def fastsum_grad_matvec(plan: FastsumPlan, x, *, compensated: bool = False):
    """(3, n) stacked dK_j x — ref nfft_interface.c:499-620."""
    p = plan.params
    f2 = p.f * p.f
    k_part, dl_part = _folded_apply_multi(plan.geom.Tcs, [plan.w, plan.dw_l], x,
                                          compensated=compensated)
    if plan.nf_val is not None:
        k_part = k_part + nearfield_apply(plan.nf_sym, plan.nf_idx, plan.nf_val, x)
        dl_part = dl_part + nearfield_apply(plan.nf_sym, plan.nf_idx, plan.nf_dval, x)
    y_f = 2.0 * p.f * (k_part + p.mu * x)
    y_l = f2 * dl_part
    y_mu = f2 * x
    return jnp.stack([y_f, y_l, y_mu])


# --- additive (windowed) fastsum ------------------------------------------

class AdditiveFastsumGeometry(NamedTuple):
    """Per-window geometries grouped by window dimensionality.

    groups: tuple of (dw, window_ids, batched FastsumGeometry) where the
    batched geometry stacks the phase tables as (Wg, dw, n, N).
    """

    n_windows: int
    groups: tuple


def additive_fastsum_geometry(X, windows, N: int = 32,
                              *, table_dtype=None) -> AdditiveFastsumGeometry:
    """One NDFT geometry per feature window (ref nfft_interface.c:622-674).

    windows: (W, dw_max) padded index array (-1 = padding).  Windows are
    grouped by effective dimension so each group vmaps as one batch.
    """
    windows = np.asarray(windows)
    W = windows.shape[0]
    by_dim = {}
    for w in range(W):
        feats = tuple(int(f) for f in windows[w] if f >= 0)
        by_dim.setdefault(len(feats), []).append((w, feats))

    groups = []
    for dw, members in sorted(by_dim.items()):
        # column selection as a one-hot matmul, not a gather: gather/scatter
        # lowering on the tunneled TPU backend has pathological compile
        # times (see kernels._window_slice)
        d = X.shape[1]
        geos = []
        for _, feats in members:
            S = np.zeros((d, len(feats)), np.float32)
            for j, f in enumerate(feats):
                S[f, j] = 1.0
            # highest precision: exact pass-through of the data columns
            Xw = jnp.matmul(X, jnp.asarray(S, X.dtype), precision="highest")
            geos.append(fastsum_geometry(Xw, N, table_dtype=table_dtype))
        batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *geos)
        order = tuple(w for w, _ in members)
        groups.append((dw, order, batched))
    return AdditiveFastsumGeometry(n_windows=W, groups=tuple(groups))


class AdditiveFastsumPlan(NamedTuple):
    n_windows: int
    groups: tuple           # tuple of (dw, window_ids, batched FastsumPlan)
    params: KernelParams


def additive_fastsum_coeffs(
    kind: str, params: KernelParams, geom: AdditiveFastsumGeometry,
    *, psd_clip: bool = False, oversample: int = 2,
    nearfield_lfil: Optional[int] = None,
    nf_patterns=None,
) -> AdditiveFastsumPlan:
    """nf_patterns: optional additive_nearfield_patterns() output — reuses
    the params-independent KNN patterns across loss evals."""
    plan_groups = []
    for gi, (dw, order, bg) in enumerate(geom.groups):
        pat = nf_patterns[gi] if nf_patterns is not None else None
        if pat is None:
            plans = jax.vmap(
                lambda g: fastsum_coeffs(kind, params, g, psd_clip=psd_clip,
                                         oversample=oversample,
                                         nearfield_lfil=nearfield_lfil)
            )(bg)
        else:
            sym = bool(pat[2]) if len(pat) == 3 else False
            plans = jax.vmap(
                lambda g, pi, pm: fastsum_coeffs(
                    kind, params, g, psd_clip=psd_clip, oversample=oversample,
                    nearfield_lfil=nearfield_lfil, nf_pattern=(pi, pm, sym),
                )
            )(bg, pat[0], pat[1])
        plan_groups.append((dw, order, plans))
    return AdditiveFastsumPlan(n_windows=geom.n_windows, groups=tuple(plan_groups), params=params)


def additive_fastsum_build(kind, params, X, windows, N: int = 32,
                           *, psd_clip: bool = False, table_dtype=None,
                           oversample: int = 2, nearfield_lfil=None):
    return additive_fastsum_coeffs(
        kind, params,
        additive_fastsum_geometry(X, windows, N, table_dtype=table_dtype),
        psd_clip=psd_clip, oversample=oversample, nearfield_lfil=nearfield_lfil,
    )


def _window_apply(pl, x, compensated: bool = False):
    """Single-window ksum(x) including the optional near-field correction."""
    (y,) = _folded_apply_multi(pl.geom.Tcs, [pl.w], x, compensated=compensated)
    if pl.nf_val is not None:
        y = y + nearfield_apply(pl.nf_sym, pl.nf_idx, pl.nf_val, x)
    return y


def additive_fastsum_matvec(plan: AdditiveFastsumPlan, x, *,
                            compensated: bool = False):
    """y = f^2 ( mean_w ksum_w(x) + mu x ) — ref nfft_interface.c:796-817."""
    p = plan.params
    acc = jnp.zeros_like(x)
    for dw, order, plans in plan.groups:
        contrib = jax.vmap(lambda pl: _window_apply(pl, x, compensated))(plans)
        acc = acc + jnp.sum(contrib, axis=0)
    f2 = p.f * p.f
    return f2 * (acc / plan.n_windows + p.mu * x)


def _packed_layout(plan: AdditiveFastsumPlan):
    """Flatten the d<=2 window groups into the packed-kernel layout.

    Returns (xT (Dtot, n), pairs, singles, w2, dw2, w1, dw1, nf2, nf1,
    rest_groups): per-2-D-window folded weights (and near-field triples) in
    `pairs` order, per-1-D-window in `singles` order; rest_groups = the d=3
    groups left on the table path.
    """
    rows = []
    pairs = []
    singles = []
    w2, dw2, nf2 = [], [], []
    w1, dw1, nf1 = [], [], []
    rest = []
    # the packed appliers carry ONE static nf_sym flag; enforce the global
    # symmetrization invariant here instead of silently mis-applying a
    # mixed-form plan (advisor r4)
    syms = {
        plans.nf_sym for _, _, plans in plan.groups if plans.nf_val is not None
    }
    if len(syms) > 1:
        raise ValueError(
            "mixed near-field pattern forms across window groups "
            "(nf_sym must be global — rebuild the plan with one policy)"
        )
    for _dw, order, plans in plan.groups:
        # NOTE: _dw is a pytree LEAF (traced when the plan crosses a jit
        # boundary); the static window dim comes from the geometry shape.
        dw = plans.geom.x.shape[2]
        if dw == 2:
            Wg = plans.w.shape[0]
            for k in range(Wg):
                r0 = len(rows)
                rows.append(plans.geom.x[k, :, 0])
                rows.append(plans.geom.x[k, :, 1])
                pairs.append((r0, r0 + 1))
                w2.append(plans.w[k])
                dw2.append(plans.dw_l[k])
                nf2.append(
                    None if plans.nf_val is None
                    else (plans.nf_idx[k], plans.nf_val[k], plans.nf_dval[k])
                )
        elif dw == 1:
            Wg = plans.w.shape[0]
            for k in range(Wg):
                rows.append(plans.geom.x[k, :, 0])
                singles.append(len(rows) - 1)
                w1.append(plans.w[k])
                dw1.append(plans.dw_l[k])
                nf1.append(
                    None if plans.nf_val is None
                    else (plans.nf_idx[k], plans.nf_val[k], plans.nf_dval[k])
                )
        else:
            rest.append((dw, order, plans))
    xT = jnp.stack(rows) if rows else None
    return xT, tuple(pairs), tuple(singles), w2, dw2, w1, dw1, nf2, nf1, rest


def _packed_apply(plan: AdditiveFastsumPlan, x, weight_sel, *, block: int,
                  interpret: bool, prec: str = "highest",
                  phase_gen: str = "doubling"):
    """Shared fused-path driver: one packed adjoint + one multi-weight packed
    forward over all d<=2 windows; d=3 windows on the table path.

    weight_sel: list of (w2_key, w1_key, nf_key) picking ('w'|'dw_l') weights
    per output set.  Returns list of accumulated ksum vectors (no f^2/mu).
    """
    from .pallas_ndft import packed_adjoint, packed_forward

    (xT, pairs, singles, w2, dw2, w1, dw1, nf2, nf1, rest) = _packed_layout(plan)
    P = None
    for _dw, order, plans in plan.groups:
        P = _nmodes(plans.N)
        break
    nsets = len(weight_sel)
    accs = [jnp.zeros_like(x) for _ in range(nsets)]

    if xT is not None:
        A2, A1 = packed_adjoint(
            xT, x, P=P, pairs=pairs, singles=singles, block=block,
            interpret=interpret, prec=prec, phase_gen=phase_gen,
        )
        G2_sets, G1_sets = [], []
        for sel, _ in weight_sel:
            wsel2 = w2 if sel == "w" else dw2
            wsel1 = w1 if sel == "w" else dw1
            G2_sets.append(
                [_folded_combine(wsel2[i], A2[i], 2) for i in range(len(pairs))]
            )
            G1_sets.append(
                [_folded_combine(wsel1[i], A1[i], 1) for i in range(len(singles))]
            )
        ys = packed_forward(
            xT, G2_sets, G1_sets, P=P, pairs=pairs, singles=singles,
            block=block, interpret=interpret, prec=prec, phase_gen=phase_gen,
        )
        for s in range(nsets):
            accs[s] = accs[s] + ys[s]
        # near-field corrections (sparse, tiny next to the NDFT)
        nf_sym = plan.groups[0][2].nf_sym
        for s, (sel, nfsel) in enumerate(weight_sel):
            for trip in list(nf2) + list(nf1):
                if trip is not None:
                    idx, val, dval = trip
                    accs[s] = accs[s] + nearfield_apply(
                        nf_sym, idx, val if nfsel == "nf_val" else dval, x
                    )

    for dw, order, plans in rest:
        for s, (sel, nfsel) in enumerate(weight_sel):
            contrib = jax.vmap(
                lambda pl_: _folded_apply_multi(
                    pl_.geom.Tcs, [pl_.w if sel == "w" else pl_.dw_l], x
                )[0]
                + (
                    nearfield_apply(
                        pl_.nf_sym,
                        pl_.nf_idx,
                        pl_.nf_val if nfsel == "nf_val" else pl_.nf_dval,
                        x,
                    )
                    if pl_.nf_val is not None
                    else 0.0
                )
            )(plans)
            accs[s] = accs[s] + jnp.sum(contrib, axis=0)
    return accs


def additive_fastsum_matvec_fused(plan: AdditiveFastsumPlan, x, *, block: int = 2048,
                                  interpret: bool = False,
                                  prec: str = "highest",
                                  phase_gen: str = "doubling"):
    """Additive matvec via the packed Pallas fused-phase NDFT kernels.

    Regenerates phases in VMEM instead of reading the (d, n, 2P) tables from
    HBM, packing 3 windows per 128-lane MXU tile (ops/pallas_ndft.py) — the
    speed-of-light path for 1-2D windows; 3D windows fall back to the table
    path.  Matches additive_fastsum_matvec to f32 roundoff.
    """
    p = plan.params
    (acc,) = _packed_apply(
        plan, x, [("w", "nf_val")], block=block, interpret=interpret,
        prec=prec, phase_gen=phase_gen,
    )
    f2 = p.f * p.f
    return f2 * (acc / plan.n_windows + p.mu * x)


def additive_fastsum_grad_matvec_fused(plan: AdditiveFastsumPlan, x, *,
                                       block: int = 2048,
                                       interpret: bool = False,
                                       prec: str = "highest",
                                       phase_gen: str = "doubling"):
    """(3, n) gradient matvec on the fused path — K and dK/dl share one
    phase generation per pass (ref nfft_interface.c:499-620 runs both
    fastsum plans on the same points)."""
    p = plan.params
    k_acc, l_acc = _packed_apply(
        plan, x, [("w", "nf_val"), ("dw_l", "nf_dval")], block=block,
        interpret=interpret, prec=prec, phase_gen=phase_gen,
    )
    W = plan.n_windows
    f2 = p.f * p.f
    y_f = 2.0 * p.f * (k_acc / W + p.mu * x)
    y_l = f2 * (l_acc / W)
    y_mu = f2 * x
    return jnp.stack([y_f, y_l, y_mu])


def additive_fastsum_grad_matvec(plan: AdditiveFastsumPlan, x, *,
                                 compensated: bool = False):
    """(3, n) — ref Nfft4GPAdditiveNFFTGradMatSymv nfft_interface.c:819-840."""
    p = plan.params
    k_acc = jnp.zeros_like(x)
    l_acc = jnp.zeros_like(x)
    for dw, order, plans in plan.groups:
        def one(pl):
            kp, lp = _folded_apply_multi(pl.geom.Tcs, [pl.w, pl.dw_l], x,
                                         compensated=compensated)
            if pl.nf_val is not None:
                kp = kp + nearfield_apply(pl.nf_sym, pl.nf_idx, pl.nf_val, x)
                lp = lp + nearfield_apply(pl.nf_sym, pl.nf_idx, pl.nf_dval, x)
            return kp, lp

        kps, lps = jax.vmap(one)(plans)
        k_acc = k_acc + jnp.sum(kps, axis=0)
        l_acc = l_acc + jnp.sum(lps, axis=0)
    W = plan.n_windows
    f2 = p.f * p.f
    y_f = 2.0 * p.f * (k_acc / W + p.mu * x)
    y_l = f2 * (l_acc / W)
    y_mu = f2 * x
    return jnp.stack([y_f, y_l, y_mu])


# --- streamed packed-NDFT plan (the round-3 speed-of-light path) ------------

@pytree_dataclass(static_fields=("P", "n", "block", "pairs", "singles", "nf_sym"))
class PackedNDFT:
    # NOTE: n_windows stays a LEAF (it arrives as a traced value when the
    # plan is built inside jit); P/n/block/pairs/singles derive from python
    # shapes and stay static.
    """Prebuilt streamed-table packed-kernel plan for the d<=2 windows.

    Built once per (dataset, params) from an AdditiveFastsumPlan by
    packed_ndft_plan().  The phase table Tp is stored in the kernels'
    native (Dtot, WR, npad) layout (ops/pallas_ndft.pack_phase_table) and
    STREAMED through VMEM per block — unlike the XLA table path there are
    no dot-operand / dot-result HBM materializations, so the matvec moves
    exactly the table bytes (ROOFLINE.md "next levers" #1).

    edge_trim (P = N/2 instead of N/2+1) drops the unpaired Nyquist mode:
    the layout becomes pad-free (WR = N rows, 4 windows per 128-lane MXU
    tile at N=32) at negligible accuracy cost (measured: gaussian matvec
    error unchanged at 8.7e-7; matern12 1.12e-2 -> 1.17e-2, absorbed by
    the near-field correction).
    """

    P: int                     # folded modes per dim kept (16 when trimmed)
    n: int
    n_windows: int
    block: int
    pairs: tuple
    singles: tuple
    Tp: jnp.ndarray            # (Dtot*WR, npad) packed phase table
    w2: tuple                  # per-2-D-window trimmed folded weights
    dw2: tuple
    w1: tuple
    dw1: tuple
    nf2: tuple                 # per-window near-field triples or None
    nf1: tuple
    rest: tuple                # d=3 window groups (table path)
    params: KernelParams
    nf_sym: bool = False       # symmetric nf patterns (see FastsumPlan.nf_sym)


def packed_ndft_plan(plan: AdditiveFastsumPlan, *, table_dtype=None,
                     edge_trim: bool = True, block: int = 2048,
                     nf_stencils=None, nf_require_grad: bool = True) -> PackedNDFT:
    """Build the streamed packed-kernel plan from an additive fastsum plan.

    nf_stencils: optional additive_nearfield_stencils() output — per-window
    cell-stencil plans.  Windows with a stencil get their near-field values
    embedded into symmetric StencilMatrix form here (jit-safe), replacing
    the gather-based ELL triple; nf_require_grad=False skips the dk/dl
    embed for solve-only plans."""
    from .pallas_ndft import pack_phase_table

    (xT, pairs, singles, w2, dw2, w1, dw1, nf2, nf1, rest) = _packed_layout(plan)

    if nf_stencils is not None:
        st2, st1, meta2, meta1 = [], [], [], []
        kind = None
        gi = 0
        for _dw, order, plans in plan.groups:
            dw = plans.geom.x.shape[2]
            kind = plans.kind
            group_st = nf_stencils[gi] if gi < len(nf_stencils) else None
            gi += 1
            if dw == 3:
                continue
            Wg = plans.w.shape[0]
            tgt, mtgt = (st2, meta2) if dw == 2 else (st1, meta1)
            for k in range(Wg):
                tgt.append(None if group_st is None else group_st[k])
                mtgt.append((plans.b[k], plans.db_l[k], plans.geom.scale[k]))
        def conv(trip, st, meta):
            if st is None:
                return trip
            b_w, db_w, sc_w = meta
            return _nf_direct_values(st, kind, plan.params, sc_w,
                                     b_w, db_w, nf_require_grad)

        nf2 = [conv(t, s, m) for t, s, m in zip(nf2, st2, meta2)]
        nf1 = [conv(t, s, m) for t, s, m in zip(nf1, st1, meta1)]
    P_full = None
    n = None
    for _dw, order, plans in plan.groups:
        P_full = _nmodes(plans.N)
        n = plans.geom.x.shape[1]
        break
    P = P_full - 1 if edge_trim else P_full

    # auto block: the stream kernels double-buffer (rows, block) table
    # slabs in VMEM.  At large P (matern12 quality mode N>=128) the default
    # 2048 block overflows the 16 MB scoped budget — halve until the slab
    # pair fits ~6 MB; conversely SMALL-P bf16 tables underfill it, and the
    # ~49 grid steps of a 2048 block at n=1e5 leave the multi-RHS matvec
    # scheduling-bound (ROOFLINE.md r4 addendum) — grow the block while the
    # slab pair stays under budget.
    # (growing the block for small-P bf16 configs was tried and OOMs VMEM:
    # the forward kernel's f32 upcast of the L0 operand doubles the slab —
    # ~25 MB at block 8192 / rows 320, .r5_loss_profile3.log)
    if xT is not None:
        # budget ~6 MB for the double-buffered slab pair: the kernels also
        # hold an f32 upcast of the streamed block, so a 9 MB budget put
        # the N=256 f32 config at 17 MB scoped VMEM (.r5_m12_1e5_final
        # first attempt)
        bytes_el = 2 if table_dtype == jnp.bfloat16 else 4
        rows = xT.shape[0] * 2 * P
        while block > 256 and rows * block * bytes_el * 2 > 6_000_000:
            block //= 2

    def trim2(W):
        return W[:, :P, :P] if edge_trim else W

    def trim1(W):
        return W[:, :P] if edge_trim else W

    Tp = (
        pack_phase_table(xT, P, block=block, table_dtype=table_dtype)
        if xT is not None
        else None
    )
    return PackedNDFT(
        P=P, n=n, n_windows=plan.n_windows, block=block,
        pairs=pairs, singles=singles, Tp=Tp,
        w2=tuple(trim2(W) for W in w2), dw2=tuple(trim2(W) for W in dw2),
        w1=tuple(trim1(W) for W in w1), dw1=tuple(trim1(W) for W in dw1),
        nf2=tuple(nf2), nf1=tuple(nf1), rest=tuple(rest), params=plan.params,
        nf_sym=plan.groups[0][2].nf_sym,
    )


def _packed_ndft_apply(pn: PackedNDFT, x, weight_sel, *, prec: str,
                       interpret: bool, upcast: bool = False):
    """Streamed-kernel analog of _packed_apply (weights pre-trimmed).

    upcast=True upcasts bf16 table blocks to f32 in VMEM before the dots
    (the accuracy mode); default streams them straight into the MXU as
    bf16 operands with f32 accumulation (measured faster, accuracy equal
    to the bf16 XLA table path)."""
    from .pallas_ndft import packed_adjoint, packed_forward

    gen = "table_f32" if upcast else "table"
    nsets = len(weight_sel)
    accs = [jnp.zeros_like(x) for _ in range(nsets)]

    if pn.Tp is not None:
        A2, A1 = packed_adjoint(
            pn.Tp, x, P=pn.P, pairs=pn.pairs, singles=pn.singles,
            block=pn.block, interpret=interpret, prec=prec, phase_gen=gen,
        )
        G2_sets, G1_sets = [], []
        for sel, _ in weight_sel:
            wsel2 = pn.w2 if sel == "w" else pn.dw2
            wsel1 = pn.w1 if sel == "w" else pn.dw1
            G2_sets.append(
                [_folded_combine(wsel2[i], A2[i], 2) for i in range(len(pn.pairs))]
            )
            G1_sets.append(
                [_folded_combine(wsel1[i], A1[i], 1) for i in range(len(pn.singles))]
            )
        ys = packed_forward(
            pn.Tp, G2_sets, G1_sets, P=pn.P, pairs=pn.pairs,
            singles=pn.singles, block=pn.block, interpret=interpret,
            prec=prec, phase_gen=gen, n_out=pn.n,
        )
        for s in range(nsets):
            accs[s] = accs[s] + ys[s]
        for s, (sel, nfsel) in enumerate(weight_sel):
            for trip in list(pn.nf2) + list(pn.nf1):
                if trip is not None:
                    accs[s] = accs[s] + _nf_trip_apply(
                        pn.nf_sym, trip, x, "k" if nfsel == "nf_val" else "l"
                    )

    for dw, order, plans in pn.rest:
        for s, (sel, nfsel) in enumerate(weight_sel):
            contrib = jax.vmap(
                lambda pl_: _folded_apply_multi(
                    pl_.geom.Tcs, [pl_.w if sel == "w" else pl_.dw_l], x
                )[0]
                + (
                    nearfield_apply(
                        pl_.nf_sym,
                        pl_.nf_idx,
                        pl_.nf_val if nfsel == "nf_val" else pl_.nf_dval,
                        x,
                    )
                    if pl_.nf_val is not None
                    else 0.0
                )
            )(plans)
            accs[s] = accs[s] + jnp.sum(contrib, axis=0)
    return accs


def packed_ndft_matvec(pn: PackedNDFT, x, *, prec: str = "highest",
                       interpret: bool = False, upcast: bool = False):
    """y = f^2 (mean_w ksum_w(x) + mu x) on the streamed packed kernels."""
    p = pn.params
    (acc,) = _packed_ndft_apply(pn, x, [("w", "nf_val")], prec=prec,
                                interpret=interpret, upcast=upcast)
    f2 = p.f * p.f
    return f2 * (acc / pn.n_windows + p.mu * x)


def packed_ndft_matvec_batch(pn: PackedNDFT, Xb, *, prec: str = "highest",
                             interpret: bool = False, upcast: bool = False):
    """Batched y = K @ x_r for nv RHS sharing ONE table stream per pass.

    Xb: (nv, n).  The adjoint kernel streams each table block once and runs
    all nv probe GEMMs on it in VMEM; the forward treats the nv combined
    mode tensors as nv weight sets of one pass (packed_forward nsets).
    HBM traffic is therefore ~1/nv of nv separate matvecs — the SLQ /
    trace-estimation probe batches (solvers/lanczos.py) are exactly this
    shape.  Ref: the reference runs probe loops serially
    (SRC/solvers/lanczos.c probe loop); on TPU the batch IS the kernel.
    """
    from .pallas_ndft import packed_adjoint, packed_forward

    p = pn.params
    nv, n = Xb.shape
    gen = "table_f32" if upcast else "table"
    acc = jnp.zeros_like(Xb)

    if pn.Tp is not None:
        A2, A1 = packed_adjoint(
            pn.Tp, Xb, P=pn.P, pairs=pn.pairs, singles=pn.singles,
            block=pn.block, interpret=interpret, prec=prec, phase_gen=gen,
        )
        # stacked form: ONE vmapped combine per window covers all probes
        # (the per-probe python loop emitted nv x nw tiny op groups that
        # left the SLQ loss step scheduling-bound, ROOFLINE.md r4)
        G2_sets = [
            jax.vmap(lambda A, i=i: _folded_combine(pn.w2[i], A, 2))(A2[i])
            for i in range(len(pn.pairs))
        ]
        G1_sets = [
            jax.vmap(lambda A, i=i: _folded_combine(pn.w1[i], A, 1))(A1[i])
            for i in range(len(pn.singles))
        ]
        ys = packed_forward(
            pn.Tp, G2_sets, G1_sets, P=pn.P, pairs=pn.pairs,
            singles=pn.singles, block=pn.block, interpret=interpret,
            prec=prec, phase_gen=gen, n_out=pn.n,
        )
        acc = acc + jnp.stack(ys)
        for trip in list(pn.nf2) + list(pn.nf1):
            if trip is not None:
                acc = acc + _nf_trip_apply_batch(pn.nf_sym, trip, Xb, "k")

    for dw, order, plans in pn.rest:
        # vmap over the probe axis (not a Python unroll): traced program
        # size stays independent of nv
        contrib = jax.vmap(
            lambda pl_: jax.vmap(
                lambda v: _folded_apply_multi(pl_.geom.Tcs, [pl_.w], v)[0]
            )(Xb)
            + (
                nearfield_apply_batch(pl_.nf_sym, pl_.nf_idx, pl_.nf_val, Xb)
                if pl_.nf_val is not None
                else 0.0
            )
        )(plans)
        acc = acc + jnp.sum(contrib, axis=0)

    f2 = p.f * p.f
    return f2 * (acc / pn.n_windows + p.mu * Xb)


def packed_ndft_grad_matvec_batch(pn: PackedNDFT, Xb, *, prec: str = "highest",
                                  interpret: bool = False,
                                  upcast: bool = False):
    """Batched (nv, 3, n) gradient matvecs sharing one table stream per pass.

    The forward runs 2*nv weight sets (K and dK/dl per probe) on one
    stream; f/mu rows are closed-form.  SLQ's dmatvec-per-probe
    (solvers/lanczos.py one_probe) is the caller.
    """
    from .pallas_ndft import packed_adjoint, packed_forward

    p = pn.params
    nv, n = Xb.shape
    gen = "table_f32" if upcast else "table"
    k_acc = jnp.zeros_like(Xb)
    l_acc = jnp.zeros_like(Xb)

    if pn.Tp is not None:
        A2, A1 = packed_adjoint(
            pn.Tp, Xb, P=pn.P, pairs=pn.pairs, singles=pn.singles,
            block=pn.block, interpret=interpret, prec=prec, phase_gen=gen,
        )
        # stacked sets in (probe0-K, probe0-dl, probe1-K, ...) order: one
        # vmapped combine per (window, weight family) covers all probes
        def _interleave2(i):
            GK = jax.vmap(lambda A: _folded_combine(pn.w2[i], A, 2))(A2[i])
            GL = jax.vmap(lambda A: _folded_combine(pn.dw2[i], A, 2))(A2[i])
            return jnp.stack([GK, GL], axis=1).reshape(2 * nv, *GK.shape[1:])

        def _interleave1(i):
            gK = jax.vmap(lambda A: _folded_combine(pn.w1[i], A, 1))(A1[i])
            gL = jax.vmap(lambda A: _folded_combine(pn.dw1[i], A, 1))(A1[i])
            return jnp.stack([gK, gL], axis=1).reshape(2 * nv, *gK.shape[1:])

        G2_sets = [_interleave2(i) for i in range(len(pn.pairs))]
        G1_sets = [_interleave1(i) for i in range(len(pn.singles))]
        ys = packed_forward(
            pn.Tp, G2_sets, G1_sets, P=pn.P, pairs=pn.pairs,
            singles=pn.singles, block=pn.block, interpret=interpret,
            prec=prec, phase_gen=gen, n_out=pn.n,
        )
        k_acc = k_acc + jnp.stack(ys[0::2])
        l_acc = l_acc + jnp.stack(ys[1::2])
        for trip in list(pn.nf2) + list(pn.nf1):
            if trip is not None:
                k_acc = k_acc + _nf_trip_apply_batch(pn.nf_sym, trip, Xb, "k")
                l_acc = l_acc + _nf_trip_apply_batch(pn.nf_sym, trip, Xb, "l")

    for dw, order, plans in pn.rest:
        # vmap over probes (outer) and windows (inner): traced program size
        # independent of nv; K and dK/dl share one adjoint per (probe, window)
        def both(pl_, x):
            kp, lp = _folded_apply_multi(pl_.geom.Tcs, [pl_.w, pl_.dw_l], x)
            if pl_.nf_val is not None:
                kp = kp + nearfield_apply(pl_.nf_sym, pl_.nf_idx, pl_.nf_val, x)
                lp = lp + nearfield_apply(pl_.nf_sym, pl_.nf_idx, pl_.nf_dval, x)
            return kp, lp

        kc, lc = jax.vmap(
            lambda x: jax.vmap(lambda pl_: both(pl_, x))(plans)
        )(Xb)                                        # (nv, Wg, n) each
        k_acc = k_acc + jnp.sum(kc, axis=1)
        l_acc = l_acc + jnp.sum(lc, axis=1)

    W = pn.n_windows
    f2 = p.f * p.f
    y_f = 2.0 * p.f * (k_acc / W + p.mu * Xb)
    y_l = f2 * (l_acc / W)
    y_mu = f2 * Xb
    return jnp.stack([y_f, y_l, y_mu], axis=1)          # (nv, 3, n)


def packed_ndft_grad_matvec(pn: PackedNDFT, x, *, prec: str = "highest",
                            interpret: bool = False, upcast: bool = False):
    """(3, n) gradient matvec; K and dK/dl share one table stream per pass."""
    p = pn.params
    k_acc, l_acc = _packed_ndft_apply(
        pn, x, [("w", "nf_val"), ("dw_l", "nf_dval")], prec=prec,
        interpret=interpret, upcast=upcast,
    )
    W = pn.n_windows
    f2 = p.f * p.f
    y_f = 2.0 * p.f * (k_acc / W + p.mu * x)
    y_l = f2 * (l_acc / W)
    y_mu = f2 * x
    return jnp.stack([y_f, y_l, y_mu])
