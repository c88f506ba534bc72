"""Global numeric configuration.

The reference library is double precision by default with a float32 build
switch (ref: SRC/utils/utils.h:28-32).  Here precision follows the input
arrays; these helpers pick sensible defaults per backend: float64 when x64 is
enabled (CPU parity tests), float32 otherwise (TPU speed-of-light path).
"""

import jax
import jax.numpy as jnp


def x64_enabled() -> bool:
    return jax.config.read("jax_enable_x64")


def default_real_dtype():
    return jnp.float64 if x64_enabled() else jnp.float32


def default_complex_dtype():
    return jnp.complex128 if x64_enabled() else jnp.complex64


def finfo_eps(dtype) -> float:
    return float(jnp.finfo(dtype).eps)
