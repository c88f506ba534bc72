"""Cell-sorted stencil layout — gather-free sparse applies on TPU.

The r4 profiling measured this backend's irregular memory ops ~1000x off
the copy bound (11.3 ms for one (1e5, 16) padded-ELL element gather,
SETUP.md), which made every sparse apply (fastsum near-field, FSAI, AFN
Schur solves) dominate its solver.  This module replaces those gathers with
a regular layout the VPU/MXU can stream:

  1. points are binned to a uniform cell grid (pitch h) over their bounding
     box and SORTED cell-major (host side, params-independent);
  2. a sparse matrix whose pattern is cell-local (every entry's endpoints
     within one cell hop) is stored as a dense STENCIL tensor
     A[cell, t, i, j] = M[p = (cell, slot i), q = (cell + offset_t, slot j)]
     over the 3^d neighbor offsets;
  3. the apply is: pad the vector to the (ncells, c) cell layout (a
     shifted-slice stack + one tiny row gather of cell starts), build the
     3^d shifted neighbor views (pure slices), and contract — a batched
     dense product with NO per-element gathers;
  4. the transpose apply uses A's shifted-slice transpose (offset t -> -t,
     slots i <-> j) — no scatter-add anywhere.

Values produced in padded-ELL form (FSAI rows, near-field corrections) are
embedded into the stencil with a one-hot comparison contraction against a
host-precomputed slot map — O(n * lfil * 3^d c) VPU work per factorization,
zero gathers/scatters.

Host/device split: `build_cell_grid` returns the host-side CellGrid
(numpy); `to_device` derives the CellGridDev pytree whose index arrays are
passed into jits as ARGUMENTS (host arrays used inside a jit would inline
as MLIR constants — compile bloat + the tunnel's request-size cap,
SETUP.md).

This is the "cell-sorted stencil layout" SETUP.md:60-62 recorded as the fix
for the gather-bound applies (ref: the CSR applies it replaces are
fsai.c:106-124 and NFFT3's fastsum nearfield sum).  Dimensions d = 1, 2, 3.
"""

import itertools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass


class CellGrid(NamedTuple):
    """Host-side static cell decomposition of a point set (d <= 3).

    Sorted order: points sorted by row-major cell id; `perm[j]` = original
    index of the j-th sorted point.
    """

    shape: tuple            # cells per dim, e.g. (ncy, ncx)
    c: int                  # cell capacity (max occupancy)
    n: int
    d: int
    perm: np.ndarray        # (n,) sorted position -> original index
    inv_perm: np.ndarray    # (n,) original index -> sorted position
    cell_of: np.ndarray     # (n,) SORTED point -> flat cell id
    rank_of: np.ndarray     # (n,) SORTED point -> slot within cell
    starts: np.ndarray      # (ncells + 1,) cell start offsets in sorted order
    lo: np.ndarray          # (d,) box lower corner
    h: float                # cell pitch (uniform binning; nan for quantile)
    edges: Optional[tuple] = None   # per-axis bin edges (quantile binning)

    @property
    def ncells(self):
        return int(np.prod(self.shape))

    @property
    def noffs(self):
        return 3 ** self.d

    def identity_perm(self) -> bool:
        return bool(np.all(self.perm == np.arange(self.n)))


def build_cell_grid(x, h: Optional[float] = None, *,
                    target_occupancy: float = 12.0,
                    max_capacity_factor: float = 4.0,
                    min_h: Optional[float] = None,
                    binning: str = "uniform") -> Optional[CellGrid]:
    """Bin points (host numpy, (n, d), d <= 3) into a cell grid.

    binning='uniform': fixed pitch h (default sized for ~target_occupancy
    points/cell; min_h raises it, e.g. to a pattern's max edge length).
    binning='quantile': per-axis EQUAL-MASS bin edges — robust to
    nonuniform densities (e.g. PCA projections of high-d data concentrate
    ~8x above the uniform expectation, .r5 AFN d=10 probe); radius-based
    patterns are not supported on quantile grids.
    Returns None when the layout degenerates (capacity far above target —
    heavily clustered/duplicate data): callers fall back to padded-ELL.
    """
    x = np.asarray(x)
    n, d = x.shape
    if d > 3 or n == 0:
        return None
    lo = x.min(axis=0)
    hi = x.max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    edges = None
    if binning == "quantile":
        nb = max(1, int(round((n / target_occupancy) ** (1.0 / d))))
        shape = (nb,) * d
        idx = np.empty((n, d), np.int64)
        edges = []
        for j in range(d):
            e = np.quantile(x[:, j], np.linspace(0.0, 1.0, nb + 1))
            e = np.maximum.accumulate(e)
            edges.append(e)
            idx[:, j] = np.clip(np.searchsorted(e[1:-1], x[:, j], "right"),
                                0, nb - 1)
        edges = tuple(edges)
        h = float("nan")
    else:
        if h is None:
            vol = float(np.prod(ext))
            h = (vol * target_occupancy / n) ** (1.0 / d)
        if min_h is not None:
            h = max(h, float(min_h))
        h = float(max(h, 1e-12))
        shape = tuple(min(int(np.ceil(e / h)) + 1, 2 ** 15) for e in ext)
        idx = np.minimum((x - lo[None, :]) / h,
                         np.asarray(shape)[None, :] - 1).astype(np.int64)
    flat = idx[:, 0]
    for j in range(1, d):
        flat = flat * shape[j] + idx[:, j]
    order = np.argsort(flat, kind="stable")
    cell_sorted = flat[order]
    ncells = int(np.prod(shape))
    counts = np.bincount(cell_sorted, minlength=ncells)
    c = int(counts.max()) if counts.size else 1
    # capacity guard: clustered or duplicate-heavy data (integer features)
    # concentrates far above the target occupancy and the padded layout
    # degenerates -> caller falls back to ELL
    if binning == "quantile":
        if c > max_capacity_factor * max(target_occupancy, 1.0):
            return None
    else:
        expected_occ = n * h ** d / float(np.prod(ext))
        if c > max_capacity_factor * max(expected_occ, 1.0):
            return None
    starts = np.zeros(ncells + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    rank = np.arange(n) - starts[cell_sorted]
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    return CellGrid(
        shape=shape, c=c, n=n, d=d,
        perm=order.astype(np.int32), inv_perm=inv.astype(np.int32),
        cell_of=cell_sorted.astype(np.int32), rank_of=rank.astype(np.int32),
        starts=starts.astype(np.int32), lo=lo, h=h, edges=edges,
    )


@pytree_dataclass(static_fields=("shape", "c", "n", "d"))
class CellGridDev:
    """Device-side index arrays for the stencil layout (pass as jit args)."""

    shape: tuple
    c: int
    n: int
    d: int
    starts: jnp.ndarray        # (ncells,) int32 cell start offsets
    padmask: jnp.ndarray       # (ncells, c) bool valid-slot mask
    # unpad maps for sorted-order vectors
    cell_rows_s: jnp.ndarray   # (n,) int32 cell of sorted point
    rank_oh_s: jnp.ndarray     # (n, c) bool one-hot of rank
    # user-order maps (fused permutation)
    pad_src_u: jnp.ndarray     # (ncells, c) int32 user id feeding each slot
    cell_rows_u: jnp.ndarray   # (n,) int32 cell of USER point
    rank_oh_u: jnp.ndarray     # (n, c) bool

    @property
    def ncells(self):
        return self.starts.shape[0]

    @property
    def noffs(self):
        return 3 ** self.d


def to_device(grid: CellGrid) -> CellGridDev:
    n, c = grid.n, grid.c
    counts = grid.starts[1:] - grid.starts[:-1]
    padmask = np.arange(c)[None, :] < counts[:, None]
    rank_oh_s = np.zeros((n, c), np.bool_)
    rank_oh_s[np.arange(n), grid.rank_of] = True
    cell_u = grid.cell_of[grid.inv_perm]
    rank_u = grid.rank_of[grid.inv_perm]
    rank_oh_u = np.zeros((n, c), np.bool_)
    rank_oh_u[np.arange(n), rank_u] = True
    slot_src = np.minimum(
        grid.starts[:-1][:, None] + np.arange(c)[None, :], n - 1
    )
    pad_src_u = grid.perm[slot_src]
    return CellGridDev(
        shape=grid.shape, c=c, n=n, d=grid.d,
        starts=jnp.asarray(grid.starts[:-1]),
        padmask=jnp.asarray(padmask),
        cell_rows_s=jnp.asarray(grid.cell_of),
        rank_oh_s=jnp.asarray(rank_oh_s),
        pad_src_u=jnp.asarray(pad_src_u.astype(np.int32)),
        cell_rows_u=jnp.asarray(cell_u),
        rank_oh_u=jnp.asarray(rank_oh_u),
    )


# --- device-side layout ops -------------------------------------------------


def pad_cells(dev: CellGridDev, xs):
    """Sorted vector(s) (n[, nv]) -> padded (ncells, c[, nv]) cell layout.

    A (n+1, c) shifted-slice stack (V[i, j] = xs[i + j], pure dense copies)
    then ONE row gather of ncells rows at the cell starts — no per-element
    gathers.
    """
    c, n = dev.c, dev.n
    single = xs.ndim == 1
    if single:
        xs = xs[:, None]
    nv = xs.shape[1]
    ext = jnp.concatenate([xs, jnp.zeros((c, nv), xs.dtype)], axis=0)
    V = jnp.stack([ext[j : j + n + 1] for j in range(c)], axis=1)
    padded = V[dev.starts]                                 # (ncells, c, nv)
    padded = jnp.where(dev.padmask[:, :, None], padded, 0.0)
    return padded[..., 0] if single else padded


def pad_cells_user(dev: CellGridDev, x_user):
    """User-order vector(s) -> padded cell layout (fused sort permutation).

    ONE row gather with the precomputed (ncells, c) source map; the gather
    rides the broadcast-row path (ops/matops._gather_vec economics)."""
    from .matops import _gather_vec

    single = x_user.ndim == 1
    if single:
        padded = _gather_vec(x_user, dev.pad_src_u)      # (ncells, c)
        return jnp.where(dev.padmask, padded, 0.0)
    padded = x_user[dev.pad_src_u.reshape(-1)].reshape(
        dev.ncells, dev.c, x_user.shape[1]
    )
    return jnp.where(dev.padmask[:, :, None], padded, 0.0)


def unpad_cells(dev: CellGridDev, ypad, *, user_order: bool = False):
    """Padded (ncells, c[, nv]) -> (n[, nv]) vector.

    One row gather of n c-wide rows + a one-hot slot reduction.
    user_order=True emits the vector in ORIGINAL point order (the inverse
    sort permutation fuses into the same row gather)."""
    single = ypad.ndim == 2
    if single:
        ypad = ypad[..., None]
    cell_rows = dev.cell_rows_u if user_order else dev.cell_rows_s
    rank_oh = dev.rank_oh_u if user_order else dev.rank_oh_s
    rows = ypad[cell_rows]                                 # (n, c, nv)
    y = jnp.sum(jnp.where(rank_oh[:, :, None], rows, 0.0), axis=1)
    return y[..., 0] if single else y


def _offsets(d: int):
    """The 3^d stencil offsets in row-major order, each in {-1, 0, 1}^d."""
    return list(itertools.product((-1, 0, 1), repeat=d))


def stencil_neighbors(dev: CellGridDev, padded):
    """Padded cells (ncells, c[, nv]) -> (ncells, 3^d * c[, nv]) neighbors.

    Pure shifted slices of the spatially-reshaped tensor; out-of-grid
    neighbors read zero."""
    single = padded.ndim == 2
    if single:
        padded = padded[..., None]
    nv = padded.shape[-1]
    c = dev.c
    sp = padded.reshape(*dev.shape, c, nv)
    pads = [(1, 1)] * dev.d + [(0, 0), (0, 0)]
    xp = jnp.pad(sp, pads)
    views = []
    for off in _offsets(dev.d):
        sl = tuple(slice(1 + o, 1 + o + s) for o, s in zip(off, dev.shape))
        views.append(xp[sl])
    nbr = jnp.concatenate(views, axis=dev.d)               # (*shape, 3^d*c, nv)
    nbr = nbr.reshape(dev.ncells, dev.noffs * c, nv)
    return nbr[..., 0] if single else nbr


@pytree_dataclass
class StencilMatrix:
    """Dense stencil storage of a cell-local sparse matrix.

    Canonical layout is the APPLY layout A[cell, i, t*c + j] =
    M[p = (cell, slot i), q = (cell + offset_t, slot j)] with offset_t the
    t-th element of _offsets(d).  The logically-4-D (ncells, 3^d, c, c)
    form pads BOTH minor dims to the TPU tile (c=46 -> (48, 128): a
    measured 2.9x HBM expansion, 4.3 GB per factor at n=1e6 — the r5 OOM,
    .r5_g_1e6e.log); the flattened last axis pads ~1.2x instead and is
    exactly what the contraction reads.  Entries whose endpoints are pad
    slots or out of grid are zero."""

    A: jnp.ndarray          # (ncells, c, 3^d * c)


def stencil_matvec(dev: CellGridDev, sm: StencilMatrix, xs, *,
                   user_order: bool = False):
    """y = M x — two tiny row gathers + dense slices + one contraction.

    xs (n,) or (n, nv) in sorted order (user order with user_order=True);
    output in the same order."""
    padded = pad_cells_user(dev, xs) if user_order else pad_cells(dev, xs)
    nbr = stencil_neighbors(dev, padded)
    Ai = sm.A
    acc = jnp.promote_types(Ai.dtype, jnp.float32)
    if nbr.ndim == 2:
        # broadcast-multiply + reduce (VPU): measured 2x the einsum form on
        # v5e at this shape (.r5_stencil_probe.log: 0.71 vs 1.54 ms).
        # Accumulate at least f32 (A may be stored bf16 for footprint; a
        # bf16 reduction over 3^d*c terms would cost ~1e-1 relative)
        ypad = jnp.sum(Ai.astype(acc) * nbr[:, None, :].astype(acc), axis=2)
    else:
        ypad = jnp.einsum("nit,ntv->niv", Ai, nbr.astype(Ai.dtype),
                          preferred_element_type=acc)
    ypad = ypad.astype(xs.dtype)
    return unpad_cells(dev, ypad, user_order=user_order)


def stencil_transpose(dev: CellGridDev, sm: StencilMatrix) -> StencilMatrix:
    """A^T in stencil form via shifted slices (no scatter).

    (M')[q, p] = M[p, q]: A_T[cell, j, t*c + i] =
    A[cell + offset_t, i, rev(t)*c + j] where rev(t) indexes -offset_t
    (the offsets list is sign-symmetric, so rev(t) = 3^d - 1 - t).

    Runs as a SEQUENTIAL loop over the 3^d offsets writing lane blocks of
    one flat output buffer: materializing all per-offset (ncells, c, c)
    blocks at once re-creates the tile-padded 4-D footprint this layout
    exists to avoid (2.9x expansion — the r5 1e6 setup OOM,
    .r5_g_1e6i.log)."""
    c = dev.c
    noffs = dev.noffs
    ncells = dev.ncells
    offs = jnp.asarray(_offsets(dev.d), jnp.int32)     # (noffs, d)

    def body(t, AT):
        t_rev = noffs - 1 - t
        Bt = jax.lax.dynamic_slice(
            sm.A, (0, 0, t_rev * c), (ncells, c, c)
        )                                               # A[:, i, rev*c + j]
        BtT = jnp.swapaxes(Bt, 1, 2)                    # (ncells, c_j, c_i)
        sp = BtT.reshape(*dev.shape, c, c)
        xp = jnp.pad(sp, [(1, 1)] * dev.d + [(0, 0), (0, 0)])
        zero = jnp.asarray(0, jnp.int32)
        start = tuple(1 + offs[t, j] for j in range(dev.d)) + (zero, zero)
        blk = jax.lax.dynamic_slice(
            xp, start, (*dev.shape, c, c)
        ).reshape(ncells, c, c)
        return jax.lax.dynamic_update_slice(AT, blk, (0, 0, t * c))

    AT0 = jnp.zeros_like(sm.A)
    AT = jax.lax.fori_loop(0, noffs, body, AT0)
    return StencilMatrix(A=AT)


# --- ELL -> stencil embedding ----------------------------------------------


@pytree_dataclass(static_fields=("lfil",))
class StencilEmbed:
    """Precomputed map from a padded-ELL pattern to stencil slots.

    slots_p[cell, i, s] in [0, 3^d c] — the flat (offset, rank) slot of ELL
    entry s of the point in (cell, slot i); the value 3^d * c marks dead
    entries (pad slots, masked entries, or out-of-stencil neighbors).
    row_src[cell, i] = SORTED row id feeding slot (cell, i).

    exc_rows/exc_slot/exc_cols: the EXCEPTION list — valid ELL entries whose
    neighbor is farther than one cell hop (e.g. the first rows of a
    nearest-PRECEDING pattern, whose only predecessors are far away).  They
    are applied as a tiny COO side term (a few hundred entries) instead of
    inflating the cell pitch to the pattern's max distance, which would
    blow the capacity (ids in the ELL's own row order; padded entries have
    row 0 / slot pointing at a masked-zero value)."""

    lfil: int
    slots_p: jnp.ndarray       # (ncells, c, lfil) int32
    row_src: jnp.ndarray       # (ncells, c) int32
    exc_rows: jnp.ndarray      # (ne,) int32 ELL row ids
    exc_slot: jnp.ndarray      # (ne,) int32 ELL slot of the entry
    exc_cols: jnp.ndarray      # (ne,) int32 neighbor ids (ELL id space)
    exc_valid: jnp.ndarray     # (ne,) bool


def ell_stencil_embed_plan(grid: CellGrid, idx, mask, *,
                           sorted_idx: bool = True,
                           max_exceptions: Optional[int] = None,
                           ) -> Optional[StencilEmbed]:
    """HOST: build the StencilEmbed for an ELL pattern on this grid.

    idx/mask: (n, lfil) padded-ELL pattern with SORTED-order row ids and
    neighbor ids (sorted_idx=True) or user-order ids (False).  Entries
    farther than one cell hop land on the exception list; if there are more
    than max_exceptions (default max(1024, n//64)) the pattern is not
    stencil-compatible and None is returned (caller keeps the ELL apply)."""
    idx = np.asarray(idx)
    mask = np.asarray(mask)
    n, lfil = idx.shape
    d = grid.d
    shape = np.asarray(grid.shape)
    if max_exceptions is None:
        max_exceptions = max(1024, n // 64)

    if not sorted_idx:
        rows_sorted = grid.inv_perm                  # ELL row r -> sorted pos
        nb_sorted = grid.inv_perm[idx]
    else:
        rows_sorted = np.arange(n)
        nb_sorted = idx

    def coords(flat):
        cs = []
        f = flat.astype(np.int64)
        for j in range(d - 1, -1, -1):
            cs.append(f % shape[j])
            f = f // shape[j]
        return np.stack(cs[::-1], axis=1)

    cell_coords = coords(grid.cell_of)               # sorted id -> cell coords
    cp = cell_coords[rows_sorted]                    # (n, d) per ELL row
    cq = cell_coords[nb_sorted.reshape(-1)].reshape(n, lfil, d)
    dlt = cq - cp[:, None, :]
    inrange = np.all(np.abs(dlt) <= 1, axis=2)
    exc = mask & ~inrange
    ne = int(exc.sum())
    if ne > max_exceptions:
        return None
    t = np.zeros((n, lfil), np.int64)
    for j in range(d):
        t = t * 3 + (dlt[:, :, j] + 1)
    slot = t * grid.c + grid.rank_of[nb_sorted.reshape(-1)].reshape(n, lfil)
    width = grid.noffs * grid.c
    slot = np.where(mask & inrange, slot, width)

    # scatter rows into the padded cell layout (host side, cheap)
    c = grid.c
    slot_src = np.minimum(
        grid.starts[:-1][:, None] + np.arange(c)[None, :], n - 1
    )                                                # (ncells, c) sorted rows
    counts = grid.starts[1:] - grid.starts[:-1]
    rmask = np.arange(c)[None, :] < counts[:, None]
    # per padded slot: the ELL row (in the caller's row order) living there
    ell_row_of_sorted = np.empty(n, np.int64)
    ell_row_of_sorted[rows_sorted] = np.arange(n)
    src_rows = ell_row_of_sorted[slot_src]
    slots_p = slot[src_rows]                         # (ncells, c, lfil)
    slots_p = np.where(rmask[:, :, None], slots_p, width)

    ne_pad = max(1, ne)
    er = np.zeros(ne_pad, np.int32)
    es = np.zeros(ne_pad, np.int32)
    ec = np.zeros(ne_pad, np.int32)
    ev = np.zeros(ne_pad, bool)
    if ne:
        rr, ss = np.nonzero(exc)
        er[:ne] = rr
        es[:ne] = ss
        ec[:ne] = idx[rr, ss]
        ev[:ne] = True
    return StencilEmbed(
        lfil=lfil,
        slots_p=jnp.asarray(slots_p.astype(np.int32)),
        row_src=jnp.asarray(src_rows.astype(np.int32)),
        exc_rows=jnp.asarray(er), exc_slot=jnp.asarray(es),
        exc_cols=jnp.asarray(ec), exc_valid=jnp.asarray(ev),
    )


def stencil_embed(dev: CellGridDev, emb: StencilEmbed, val, *,
                  chunk: Optional[int] = None, out_dtype=None):
    """DEVICE (jit-safe): ELL values -> StencilMatrix(es).

    val: (n, lfil) -> one StencilMatrix; (m, n, lfil) -> list of m matrices
    SHARING one one-hot comparison pass (the k / dk-dl value sets of a
    near-field correction cost ~one embed).  Rows in the order the embed
    plan was built with.  One row gather pads the value rows into cells; a
    one-hot comparison contraction places them — no scatters."""
    c = dev.c
    width = dev.noffs * c
    ncells = dev.ncells
    if chunk is None:
        # bound the one-hot comparison transient (chunk, c, lfil, width+1)
        # at ~2e8 elements — a fixed 8192 chunk reached 4+ GB at n=1e6
        # stencil widths and OOM'd HBM (.r5_m12_1e6_a.log)
        chunk = max(256, int(2e8) // max(c * emb.lfil * (width + 1), 1))
    multi = val.ndim == 3
    if not multi:
        val = val[None]
    m = val.shape[0]
    odt = out_dtype or val.dtype
    val_p = jnp.moveaxis(val, 0, -1)[emb.row_src.reshape(-1)].reshape(
        ncells, c, emb.lfil, m
    )
    t_iota = jnp.arange(width, dtype=jnp.int32)

    def one_chunk(args):
        vc, sc = args                        # (chunk, c, lfil, m) / (.., lfil)
        oh = (sc[:, :, :, None] == t_iota[None, None, None, :]).astype(odt)
        return jnp.einsum("cisv,cist->citv", vc.astype(odt), oh)

    nch = -(-ncells // chunk)
    if nch <= 1:
        A2 = one_chunk((val_p, emb.slots_p))
    else:
        padc = nch * chunk
        vp = jnp.zeros((padc, c, emb.lfil, m), val_p.dtype).at[:ncells].set(val_p)
        sp = jnp.full((padc, c, emb.lfil), width, jnp.int32).at[:ncells].set(
            emb.slots_p
        )
        A2 = jax.lax.map(
            one_chunk,
            (vp.reshape(nch, chunk, c, emb.lfil, m),
             sp.reshape(nch, chunk, c, emb.lfil)),
        ).reshape(padc, c, width, m)[:ncells]
    # A2 is already the canonical apply layout (ncells, c, 3^d c)
    mats = [StencilMatrix(A=A2[..., j]) for j in range(m)]
    return mats if multi else mats[0]
