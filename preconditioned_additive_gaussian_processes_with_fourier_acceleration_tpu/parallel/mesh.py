"""Device mesh + sharding helpers — the framework's communication layer.

The reference has NO distributed backend (SURVEY.md §2.15); this layer is the
TPU-native addition: one Mesh with a "points" axis, NamedShardings on data
rows, and XLA-inserted collectives (every Krylov dot product becomes a psum,
the NDFT mode tensors are the natural all-reduce quantity).  Solvers stay
backend-agnostic exactly like the reference's function-pointer design —
they never mention the mesh; shardings on the inputs are enough.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POINTS_AXIS = "points"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = POINTS_AXIS) -> Mesh:
    """1-D mesh over the first n_devices devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def points_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0,
                    axis_name: str = POINTS_AXIS) -> NamedSharding:
    """Shard dimension `axis` of an ndim-array over the points axis."""
    spec = [None] * ndim
    spec[axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
