"""Sharded GP training: the multi-chip loss/train-step factory.

The scaling design (SURVEY.md §2.15): one Mesh with a "points" axis; X, y and
the probe matrix row-sharded; the NDFT geometry inherits the row sharding
(phase tables are per-point); Krylov dot products become psums and the small
(N, N) mode tensors are the all-reduce quantity — all inserted by XLA from
the input shardings, so the solvers/loss code is exactly the single-chip
code.  This module only (a) places the data and (b) jits the step.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.adam import AdamState, adam_init, adam_step
from ..models.gp import GPConfig, gp_loss
from ..ops import fastsum as fs
from ..ops.kernels import KernelParams
from ..preconds.nystrom import nystrom_setup
from ..solvers.lanczos import rademacher_probes
from ..utils.datasets import expand_perm
from .mesh import make_mesh, POINTS_AXIS


def shard_training_data(mesh, X, y, probes):
    """Place (X, y, probes) with their points dimension sharded."""
    row = NamedSharding(mesh, P(POINTS_AXIS))
    return (
        jax.device_put(X, NamedSharding(mesh, P(POINTS_AXIS, None))),
        jax.device_put(y, row),
        jax.device_put(probes, NamedSharding(mesh, P(None, POINTS_AXIS))),
    )


def make_sharded_train_step(
    windows,
    *,
    kernel: str = "gaussian",
    nys_rank: int = 64,
    slq_its: int = 10,
    nvecs: int = 10,
    fastsum_N: int = 32,
    tol: float = 1e-6,
    adam_alpha: float = 0.01,
):
    """Returns train_step(state, X, y, probes) -> (state, loss, grad), jitted.

    All arrays are explicit arguments; shard them with shard_training_data
    and XLA propagates the layout through geometry build, fastsum matvecs,
    Krylov loops and the Nyström setup.
    """
    cfg = GPConfig(kind=kernel, maxits=slq_its, nvecs=nvecs, tol=tol)

    def loss_step(raw, X, y, probes):
        n = X.shape[0]
        geom = fs.additive_fastsum_geometry(X, windows, N=fastsum_N)
        perm = jnp.arange(nys_rank)

        def build_ops(params):
            plan = fs.additive_fastsum_coeffs(kernel, params, geom)
            return (
                lambda v: fs.additive_fastsum_matvec(plan, v),
                lambda v: fs.additive_fastsum_grad_matvec(plan, v),
            )

        def precond_setup(params):
            return nystrom_setup(
                kernel, params, X, perm, nys_rank, require_grad=True,
                windows=windows,
            )

        res = gp_loss(raw, y, build_ops, probes, cfg, precond_setup)
        return res.loss, res.grad

    @jax.jit
    def train_step(state: AdamState, X, y, probes):
        loss, grad = loss_step(state.x, X, y, probes)
        return adam_step(state, grad, alpha=adam_alpha), loss, grad

    return train_step


def train_sharded(
    X, y, *, windows, n_devices: Optional[int] = None, init=(1.0, 1.0, 0.1),
    adam_maxits: int = 100, seed: int = 0, **step_kwargs,
):
    """Convenience loop: mesh + sharding + Adam iterations."""
    from ..models.transforms import transform_inverse

    mesh = make_mesh(n_devices)
    nvecs = step_kwargs.get("nvecs", 10)
    probes = rademacher_probes(jax.random.PRNGKey(seed), nvecs, X.shape[0], X.dtype)
    X, y, probes = shard_training_data(mesh, jnp.asarray(X), jnp.asarray(y), probes)
    step = make_sharded_train_step(windows, **step_kwargs)
    state = adam_init(transform_inverse("softplus", jnp.asarray(init, X.dtype)))
    losses = []
    for _ in range(adam_maxits):
        state, loss, grad = step(state, X, y, probes)
        losses.append(float(loss))
    return state, losses
