"""Pallas NDFT kernels with on-the-fly phase generation.

The table-based NDFT (ops/fastsum.py) is HBM-bound: the (d, n, N) cos/sin
tables are read twice per matvec (~2 GB at n=2e5, d=10).  These kernels
regenerate phases in VMEM from the raw points (n*d floats — 100x less
traffic), turning the matvec compute-bound: per point-block, the VPU computes
cos/sin(-2 pi k x) and the MXU contracts them.

adjoint (type 1):  e_hat[k] = sum_i alpha_i prod_d E[d,i,k_d]
forward (type 2):  f_i = Re[ sum_k C_k prod_d conj(E[d,i,k_d]) ]

Grid: 1-D over point blocks.  The adjoint accumulates the (N, N) mode tensor
across grid steps (same output block each step); the forward writes disjoint
point blocks.  Window dims 1 and 2 are native; dim 3 falls back to the
table-based path (TODO: k3-mode loop in-kernel).

Ref: this replaces NFFT3's window-function gridding (fastsum.c) — the
separable-NDFT formulation needs no scatter, so the TPU kernel is GEMM-shaped
rather than gridding-shaped (SURVEY.md §2.16).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 6.283185307179586


def _phases(xcol, kvec):
    """cos/sin(-2 pi * x * k) for a point-block column: (B, N)."""
    ph = (-TWO_PI) * xcol[:, None] * kvec[None, :]
    return jnp.cos(ph), jnp.sin(ph)


# --- adjoint, d == 2 --------------------------------------------------------

def _adjoint2_kernel(x_ref, a_ref, k_ref, out_re_ref, out_im_ref):
    i = pl.program_id(0)
    kvec = k_ref[0, :]
    c0, s0 = _phases(x_ref[:, 0], kvec)
    c1, s1 = _phases(x_ref[:, 1], kvec)
    a = a_ref[:, 0][:, None]
    A_re = c0 * a
    A_im = s0 * a
    re = jnp.dot(A_re.T, c1, preferred_element_type=jnp.float32) - jnp.dot(
        A_im.T, s1, preferred_element_type=jnp.float32
    )
    im = jnp.dot(A_re.T, s1, preferred_element_type=jnp.float32) + jnp.dot(
        A_im.T, c1, preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _():
        out_re_ref[:, :] = jnp.zeros_like(out_re_ref)
        out_im_ref[:, :] = jnp.zeros_like(out_im_ref)

    out_re_ref[:, :] += re.astype(out_re_ref.dtype)
    out_im_ref[:, :] += im.astype(out_im_ref.dtype)


def ndft_adjoint2(x, alpha, N: int, *, block: int = 2048, interpret: bool = False):
    """(re, im) (N, N) mode tensor for a 2-D window."""
    n = x.shape[0]
    dtype = x.dtype
    nb = -(-n // block)
    npad = nb * block
    xpad = jnp.zeros((npad, 2), dtype).at[:n].set(x)
    apad = jnp.zeros((npad, 1), dtype).at[:n, 0].set(alpha)
    kvec = jnp.arange(-(N // 2), N - N // 2, dtype=dtype)[None, :]

    out_re, out_im = pl.pallas_call(
        _adjoint2_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 2), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, N), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((N, N), lambda i: (0, 0)),
            pl.BlockSpec((N, N), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, N), dtype),
            jax.ShapeDtypeStruct((N, N), dtype),
        ),
        interpret=interpret,
    )(xpad, apad, kvec)
    return out_re, out_im


def _forward2_kernel(x_ref, cre_ref, cim_ref, k_ref, f_ref):
    kvec = k_ref[0, :]
    c0, s0 = _phases(x_ref[:, 0], kvec)
    c1, s1 = _phases(x_ref[:, 1], kvec)
    Cre = cre_ref[:, :]
    Cim = cim_ref[:, :]
    T_re = jnp.dot(c0, Cre, preferred_element_type=jnp.float32) + jnp.dot(
        s0, Cim, preferred_element_type=jnp.float32
    )
    T_im = jnp.dot(c0, Cim, preferred_element_type=jnp.float32) - jnp.dot(
        s0, Cre, preferred_element_type=jnp.float32
    )
    f = jnp.sum(T_re * c1 + T_im * s1, axis=1, keepdims=True)
    f_ref[:, :] = f.astype(f_ref.dtype)


def ndft_forward2(x, Cre, Cim, *, block: int = 2048, interpret: bool = False):
    """f_i (real) for a 2-D window from the (N, N) coefficient tensor."""
    n = x.shape[0]
    N = Cre.shape[0]
    dtype = x.dtype
    nb = -(-n // block)
    npad = nb * block
    xpad = jnp.zeros((npad, 2), dtype).at[:n].set(x)
    kvec = jnp.arange(-(N // 2), N - N // 2, dtype=dtype)[None, :]

    f = pl.pallas_call(
        _forward2_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 2), lambda i: (i, 0)),
            pl.BlockSpec((N, N), lambda i: (0, 0)),
            pl.BlockSpec((N, N), lambda i: (0, 0)),
            pl.BlockSpec((1, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, 1), dtype),
        interpret=interpret,
    )(xpad, Cre, Cim, kvec)
    return f[:n, 0]


# --- adjoint/forward, d == 1 ------------------------------------------------

def _adjoint1_kernel(x_ref, a_ref, k_ref, out_ref):
    i = pl.program_id(0)
    kvec = k_ref[0, :]
    c0, s0 = _phases(x_ref[:, 0], kvec)
    a = a_ref[:, 0][:, None]
    re = jnp.sum(c0 * a, axis=0, keepdims=True)
    im = jnp.sum(s0 * a, axis=0, keepdims=True)
    out = jnp.concatenate([re, im], axis=0)

    @pl.when(i == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += out.astype(out_ref.dtype)


def ndft_adjoint1(x, alpha, N: int, *, block: int = 2048, interpret: bool = False):
    """(re, im) (N,) mode vectors for a 1-D window (stacked as (2, N))."""
    n = x.shape[0]
    dtype = x.dtype
    nb = -(-n // block)
    npad = nb * block
    xpad = jnp.zeros((npad, 1), dtype).at[:n, 0].set(x[:, 0] if x.ndim == 2 else x)
    apad = jnp.zeros((npad, 1), dtype).at[:n, 0].set(alpha)
    kvec = jnp.arange(-(N // 2), N - N // 2, dtype=dtype)[None, :]

    out = pl.pallas_call(
        _adjoint1_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((2, N), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, N), dtype),
        interpret=interpret,
    )(xpad, apad, kvec)
    return out[0], out[1]


def _forward1_kernel(x_ref, c_ref, k_ref, f_ref):
    kvec = k_ref[0, :]
    c0, s0 = _phases(x_ref[:, 0], kvec)
    Cre = c_ref[0, :][None, :]
    Cim = c_ref[1, :][None, :]
    f = jnp.sum(c0 * Cre + s0 * Cim, axis=1, keepdims=True)
    f_ref[:, :] = f.astype(f_ref.dtype)


def ndft_forward1(x, Cre, Cim, *, block: int = 2048, interpret: bool = False):
    n = x.shape[0]
    N = Cre.shape[0]
    dtype = Cre.dtype
    nb = -(-n // block)
    npad = nb * block
    xcol = x[:, 0] if x.ndim == 2 else x
    xpad = jnp.zeros((npad, 1), dtype).at[:n, 0].set(xcol)
    C = jnp.stack([Cre, Cim])
    kvec = jnp.arange(-(N // 2), N - N // 2, dtype=dtype)[None, :]

    f = pl.pallas_call(
        _forward1_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((2, N), lambda i: (0, 0)),
            pl.BlockSpec((1, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, 1), dtype),
        interpret=interpret,
    )(xpad, C, kvec)
    return f[:n, 0]


# --- fused window apply -----------------------------------------------------

def fused_window_apply(x, alpha, coeffs, N: int, *, block: int = 2048,
                       interpret: bool = False):
    """Re[NDFT2(coeffs * NDFT1(alpha))] for one window of dim 1 or 2.

    coeffs: real (N,) or (N, N) tensor (shifted mode order).
    """
    d = x.shape[1]
    if d == 1:
        er, ei = ndft_adjoint1(x, alpha, N, block=block, interpret=interpret)
        return ndft_forward1(x, coeffs * er, coeffs * ei, block=block, interpret=interpret)
    if d == 2:
        er, ei = ndft_adjoint2(x, alpha, N, block=block, interpret=interpret)
        return ndft_forward2(x, coeffs * er, coeffs * ei, block=block, interpret=interpret)
    raise NotImplementedError("fused NDFT supports window dims 1-2; use the table path for 3")
