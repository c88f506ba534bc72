"""Exact multi-class GP (one-vs-all) with fixed per-point noise.

Rebuild of the MATLAB prototype's classification stack
(MATLAB/+nfftgp/+kernels/+optimization/exact_class_gp_loss.m,
exact_class_gp_prediction.m, with the fixed-noise kernel
gaussianKernelFixedNoise.m):

  K_c = f_c^2 k(X; l_c) + mu_c I + diag(mu2[:, c])
  loss = sum_c 0.5 (y_c' K_c^{-1} y_c + logdet K_c + n log 2pi) / n
  dK/df = 2 f k,  dK/dl = f^2 dk/dl,  dK/dmu = I   (noise NOT f^2-scaled
  in this variant, unlike the regression kernel — kernels match the MATLAB)

Per-class solves are a vmapped batched Cholesky; prediction is the argmax of
the per-class posterior means.
"""

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.distances import sq_distance
from ..ops.kernels import _BASE_KERNELS
from .transforms import transform_forward

LOG_2PI = math.log(2.0 * math.pi)


def fixed_noise_kernel(kind, f, l, mu, mu2, X, Y=None, grad=False):
    """K = f^2 k(r; l) + mu I + diag(mu2); mu2 only on same-set diagonals."""
    same = Y is None
    r2 = sq_distance(X, Y)
    k, dk_dl = _BASE_KERNELS[kind](r2, l)
    K = f * f * k
    if same:
        K = K + mu * jnp.eye(r2.shape[0], dtype=K.dtype) + jnp.diag(mu2)
    if not grad:
        return K
    n, m = r2.shape
    eye = jnp.eye(n, m, dtype=K.dtype) if same else jnp.zeros((n, m), K.dtype)
    dK = jnp.stack([2.0 * f * k, f * f * dk_dl, eye])
    return K, dK


class ClassGPLossResult(NamedTuple):
    loss: jnp.ndarray
    grad: jnp.ndarray     # (3*C,) ordered [f_1..f_C, l_1..l_C, mu_1..mu_C]
    per_class: jnp.ndarray


def exact_class_gp_loss(
    raw, X, Ys, mu2, *, kind="gaussian", transform="softplus", masks=None
):
    """raw: (3C,) [fs; ls; mus] untransformed; Ys, mu2: (n, C)."""
    n, C = Ys.shape
    fs_raw, ls_raw, mus_raw = raw[:C], raw[C : 2 * C], raw[2 * C :]
    fs, dfs = transform_forward(transform, fs_raw)
    ls, dls = transform_forward(transform, ls_raw)
    mus, dmus = transform_forward(transform, mus_raw)

    def one_class(f, l, mu, m2, y):
        K, dK = fixed_noise_kernel(kind, f, l, mu, m2, X, grad=True)
        L = jnp.linalg.cholesky(K)
        iKY = jax.scipy.linalg.cho_solve((L, True), y)
        L1 = jnp.vdot(y, iKY)
        L2 = 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
        iKdK = jax.vmap(lambda M: jax.scipy.linalg.cho_solve((L, True), M))(dK)
        L1_grad = jnp.einsum("n,knm,m->k", iKY, dK, iKY)
        L2_grad = jnp.trace(iKdK, axis1=1, axis2=2)
        loss = 0.5 * (L1 + L2 + n * LOG_2PI) / n
        grad = 0.5 * (-L1_grad + L2_grad) / n
        return loss, grad

    losses, grads = jax.vmap(one_class)(fs, ls, mus, mu2.T, Ys.T)
    dtr = jnp.stack([dfs, dls, dmus], axis=1)           # (C, 3)
    grads = grads * dtr                                  # chain rule
    if masks is not None:
        grads = grads * jnp.asarray(masks, grads.dtype)[None, :]
    total = jnp.sum(losses)
    grad_flat = jnp.concatenate([grads[:, 0], grads[:, 1], grads[:, 2]])
    return ClassGPLossResult(loss=total, grad=grad_flat, per_class=losses)


class ClassGPPredictResult(NamedTuple):
    labels: jnp.ndarray     # (n2,) argmax class indices
    means: jnp.ndarray      # (n2, C)
    std: Optional[jnp.ndarray]


def exact_class_gp_predict(
    raw, X1, Ys, mu2, X2, *, kind="gaussian", transform="softplus", with_std=False
):
    """One-vs-all prediction: argmax_c of per-class posterior means
    (exact_class_gp_prediction.m:25-72)."""
    n1, C = Ys.shape
    fs, _ = transform_forward(transform, raw[:C])
    ls, _ = transform_forward(transform, raw[C : 2 * C])
    mus, _ = transform_forward(transform, raw[2 * C :])

    def one_class(f, l, mu, m2, y):
        K11 = fixed_noise_kernel(kind, f, l, mu, m2, X1)
        K12 = fixed_noise_kernel(kind, f, l, mu, m2, X1, X2)
        L = jnp.linalg.cholesky(K11)
        iKY = jax.scipy.linalg.cho_solve((L, True), y)
        mean = K12.T @ iKY
        if not with_std:
            return mean, jnp.zeros_like(mean)
        # test-block diagonal carries only the learnable noise (mu2 is a
        # train-point property; the prediction kernel extends it with zeros,
        # exact_class_gp_prediction.m:31-32)
        K22d = f * f + mu
        iK_K12 = jax.scipy.linalg.cho_solve((L, True), K12)
        var = K22d - jnp.sum(K12 * iK_K12, axis=0)
        return mean, jnp.sqrt(jnp.abs(var))

    means, stds = jax.vmap(one_class)(fs, ls, mus, mu2.T, Ys.T)
    means = means.T
    labels = jnp.argmax(means, axis=1)
    return ClassGPPredictResult(
        labels=labels, means=means, std=stds.T if with_std else None
    )
