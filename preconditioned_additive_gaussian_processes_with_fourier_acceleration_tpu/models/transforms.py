"""Hyperparameter transforms.

Rebuild of Nfft4GPTransform (ref: SRC/optimizer/transform.c:4-89): softplus
(with the pytorch threshold 20), sigmoid, exp, identity; forward returns
(value, derivative) for the chain rule in the loss; inverse maps a
constrained value back to raw space.
"""

import jax.numpy as jnp

_SOFTPLUS_HI = 20.0
_SOFTPLUS_LO = -20.0


def _softplus_fwd(x):
    mid = jnp.log1p(jnp.exp(jnp.clip(x, _SOFTPLUS_LO, _SOFTPLUS_HI)))
    val = jnp.where(x > _SOFTPLUS_HI, x, jnp.where(x < _SOFTPLUS_LO, jnp.exp(x), mid))
    sig = 1.0 / (1.0 + jnp.exp(-jnp.clip(x, _SOFTPLUS_LO, _SOFTPLUS_HI)))
    dval = jnp.where(x > _SOFTPLUS_HI, 1.0, jnp.where(x < _SOFTPLUS_LO, jnp.exp(x), sig))
    return val, dval


def _softplus_inv(v):
    # ref transform.c:44-53 (threshold exp(-20) ~ 2.061e-9)
    small = 2.06115362243856e-09
    mid = jnp.log(jnp.expm1(jnp.maximum(v, small)))
    return jnp.where(v > _SOFTPLUS_HI, v, jnp.where(v < small, jnp.log(v), mid))


def _sigmoid_fwd(x):
    s = 1.0 / (1.0 + jnp.exp(-x))
    return s, s * (1.0 - s)


def _sigmoid_inv(v):
    return jnp.log(v / (1.0 - v))


def _exp_fwd(x):
    e = jnp.exp(x)
    return e, e


def _identity_fwd(x):
    return x, jnp.ones_like(x)


_FWD = {
    "softplus": _softplus_fwd,
    "sigmoid": _sigmoid_fwd,
    "exp": _exp_fwd,
    "identity": _identity_fwd,
}
_INV = {
    "softplus": _softplus_inv,
    "sigmoid": _sigmoid_inv,
    "exp": jnp.log,
    "identity": lambda v: v,
}


def transform_forward(kind: str, x):
    """(transformed value, d transformed / d raw), elementwise."""
    return _FWD[kind](jnp.asarray(x))


def transform_inverse(kind: str, v):
    return _INV[kind](jnp.asarray(v))
