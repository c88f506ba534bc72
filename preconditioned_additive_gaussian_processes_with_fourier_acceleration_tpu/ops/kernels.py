"""Kernel matrices with analytic hyperparameter gradients.

TPU-native rebuild of the reference kernel layer (ref: SRC/linearalg/kernels.c,
formula conventions at kernels.h:44-95):

  K      = f^2 * (k(r) + mu * I)                   (noise only on the diagonal
                                                    of same-set evaluations;
                                                    rectangular blocks carry no
                                                    noise, kernels.c:839-915)
  dK/df  = 2 K / f = 2 f (k(r) + mu I)
  dK/dl  = f^2 * dk/dl
  dK/dmu = f^2 * I

with base kernels
  gaussian  : k = exp(-r^2 / (2 l^2)),   dk/dl = (r^2 / l^3) k
  matern32  : k = (1 + sqrt(3) r / l) exp(-sqrt(3) r / l),
              dk/dl = (3 r^2 / l^3) exp(-sqrt(3) r / l)
  matern12  : k = exp(-r / l),           dk/dl = (r / l^2) k

Gradients are returned stacked as dK[3, n, m] ordered (df, dl, dmu), mirroring
the reference's 3 contiguous n^2 blocks (kernels.h:44-46).

Additive kernels (ref: kernels.c:3046-3495): K_add = (1/W) sum_w K_base over
feature windows; windows are a padded (W, dw) int array with -1 padding, and
the whole sum is a vmap over the window axis — embarrassingly parallel on TPU.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .distances import sq_distance

SQRT3 = 1.7320508075688772935


@pytree_dataclass
class KernelParams:
    """Hyperparameters (f, l, mu) — ref: nfft4gp_kernel struct kernels.h:65-95."""

    f: jnp.ndarray
    l: jnp.ndarray
    mu: jnp.ndarray

    @staticmethod
    def make(f=1.0, l=1.0, mu=0.01, dtype=None):
        dtype = dtype or jnp.result_type(float)
        return KernelParams(
            f=jnp.asarray(f, dtype), l=jnp.asarray(l, dtype), mu=jnp.asarray(mu, dtype)
        )


# --- base kernels on squared distance -------------------------------------
# Each returns (k, dk_dl) given squared distances r2 (no f/mu scaling).

def _gaussian_base(r2, l):
    k = jnp.exp(-r2 / (2.0 * l * l))
    dk_dl = (r2 / (l * l * l)) * k
    return k, dk_dl


def _matern32_base(r2, l):
    r = jnp.sqrt(r2)
    e = jnp.exp(-SQRT3 * r / l)
    k = (1.0 + SQRT3 * r / l) * e
    dk_dl = (3.0 * r2 / (l * l * l)) * e
    return k, dk_dl


def _matern12_base(r2, l):
    r = jnp.sqrt(r2)
    k = jnp.exp(-r / l)
    dk_dl = (r / (l * l)) * k
    return k, dk_dl


_BASE_KERNELS = {
    "gaussian": _gaussian_base,
    "matern32": _matern32_base,
    "matern12": _matern12_base,
}


def base_kernel(name: str):
    return _BASE_KERNELS[name]


# --- full kernel matrices --------------------------------------------------

def _assemble(kind, params, r2, same_points: bool):
    base = _BASE_KERNELS[kind]
    k, _ = base(r2, params.l)
    f2 = params.f * params.f
    K = f2 * k
    if same_points:
        n = r2.shape[0]
        K = K + (f2 * params.mu) * jnp.eye(n, dtype=K.dtype)
    return K


def _assemble_grad(kind, params, r2, same_points: bool):
    base = _BASE_KERNELS[kind]
    k, dk_dl = base(r2, params.l)
    f2 = params.f * params.f
    n, m = r2.shape
    eye = jnp.eye(n, m, dtype=r2.dtype) if same_points else jnp.zeros((n, m), r2.dtype)
    kmu = k + params.mu * eye
    K = f2 * kmu
    dK = jnp.stack(
        [
            2.0 * params.f * kmu,  # dK/df
            f2 * dk_dl,            # dK/dl
            f2 * eye,              # dK/dmu
        ]
    )
    return K, dK


def kernel_matrix(kind: str, params: KernelParams, X, Y=None):
    """Dense kernel matrix K(X, Y). Noise on the diagonal only when Y is None.

    Ref: func_kernel with permr=NULL (kernels.c:680-1290 for Gaussian).
    """
    same = Y is None
    r2 = sq_distance(X, Y)
    return _assemble(kind, params, r2, same)


def kernel_matrix_with_grad(kind: str, params: KernelParams, X, Y=None):
    """(K, dK[3]) — gradients stacked (df, dl, dmu)."""
    same = Y is None
    r2 = sq_distance(X, Y)
    return _assemble_grad(kind, params, r2, same)


def gaussian_kernel(params, X, Y=None):
    return kernel_matrix("gaussian", params, X, Y)


def matern32_kernel(params, X, Y=None):
    return kernel_matrix("matern32", params, X, Y)


def matern12_kernel(params, X, Y=None):
    return kernel_matrix("matern12", params, X, Y)


# --- additive kernels over feature windows ---------------------------------

def make_windows(window_list, dtype=jnp.int32):
    """Pad a list of per-window feature-index lists to a (W, dw_max) array.

    -1 marks padding, matching the reference window-file convention
    (ref: TESTS/TEST4/foo.cpp:83-120, skip logic kernels.c:3054-3060).
    """
    import numpy as np

    W = len(window_list)
    dw = max(len(w) for w in window_list)
    arr = np.full((W, dw), -1, dtype=np.int32)
    for i, w in enumerate(window_list):
        arr[i, : len(w)] = w
    return jnp.asarray(arr, dtype=dtype)


def _window_slice(X, window):
    """Select window features of X with -1 padding zeroed out.

    A padded column contributes 0 to every squared distance, so zeroing the
    selected feature reproduces the reference's skip logic
    (kernels.c:3054-3060) with static shapes.  The selection is a one-hot
    matmul (n,d)@(d,dw) rather than a gather: d and dw are tiny, the MXU
    does it for free, and gather/scatter lowering on the tunneled TPU
    backend has pathological compile times (measured 48 s for a (256,4)
    column gather vs <1 s for the equivalent matmul).
    """
    mask = (window >= 0).astype(X.dtype)
    idx = jnp.maximum(window, 0)
    d = X.shape[1]
    S = (idx[None, :] == jnp.arange(d)[:, None]).astype(X.dtype)  # (d, dw)
    # highest precision: S is one-hot, so the product must pass X through
    # EXACTLY (default TPU precision would round the data to bf16)
    return jnp.matmul(X, S * mask[None, :], precision="highest")


def _additive_r2(X, Y, windows):
    """Per-window squared distances, shape (W, n, m)."""

    def one(window):
        Xw = _window_slice(X, window)
        Yw = _window_slice(Y, window) if Y is not None else None
        return sq_distance(Xw, Yw)

    return jax.vmap(one)(windows)


def additive_kernel_matrix(kind: str, params: KernelParams, X, windows, Y=None):
    """K_add = (1/W) sum_w K_base(X[:, window_w]) — ref: kernels.c:3099-3495.

    Shared (f, l, mu) across windows; the noise term is added once (each
    window adds f^2 mu / W on the diagonal, summing to f^2 mu).
    """
    same = Y is None
    r2 = _additive_r2(X, Y, windows)  # (W, n, m)
    base = _BASE_KERNELS[kind]
    k, _ = base(r2, params.l)
    f2 = params.f * params.f
    K = f2 * jnp.mean(k, axis=0)
    if same:
        n = X.shape[0]
        K = K + (f2 * params.mu) * jnp.eye(n, dtype=K.dtype)
    return K


def additive_kernel_matrix_with_grad(kind: str, params: KernelParams, X, windows, Y=None):
    same = Y is None
    r2 = _additive_r2(X, Y, windows)
    base = _BASE_KERNELS[kind]
    k, dk_dl = base(r2, params.l)
    f2 = params.f * params.f
    kbar = jnp.mean(k, axis=0)
    dkbar_dl = jnp.mean(dk_dl, axis=0)
    n, m = kbar.shape
    eye = jnp.eye(n, m, dtype=kbar.dtype) if same else jnp.zeros((n, m), kbar.dtype)
    kmu = kbar + params.mu * eye
    K = f2 * kmu
    dK = jnp.stack([2.0 * params.f * kmu, f2 * dkbar_dl, f2 * eye])
    return K, dK


# --- matvec-style closures -------------------------------------------------

def dense_symv(K):
    """y = K @ x closure — ref: Nfft4GPDenseMatSymv (matops.c:3-14)."""

    def mv(x):
        return K @ x

    return mv


def dense_grad_symv(dK):
    """y[3, n] = dK[i] @ x — ref: Nfft4GPDenseGradMatSymv (matops.c:15-30)."""

    def mv(x):
        return jnp.einsum("knm,m->kn", dK, x)

    return mv
