"""Small helper for registering dataclasses as JAX pytrees.

The reference composes everything through C function-pointer structs
(ref: SRC/solvers/solvers.h:21-79, SRC/optimizer/gp_problem.h:40-49).  The
TPU-native analog is a frozen dataclass pytree whose array fields trace
through jit and whose static fields (sizes, flags) are hashable aux data.
"""

import dataclasses
from typing import Any

import jax


def pytree_dataclass(cls=None, *, static_fields: tuple = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields named in ``static_fields`` become aux (static) data; all other
    fields are children (traced arrays / sub-pytrees).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in static_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(static_fields)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj: Any, **kwargs) -> Any:
    return dataclasses.replace(obj, **kwargs)
