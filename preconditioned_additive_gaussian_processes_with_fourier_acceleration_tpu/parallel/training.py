"""Sharded GP training: the multi-chip loss/train-step factory.

The scaling design (SURVEY.md §2.15): one Mesh with a "points" axis; X, y and
the probe matrix row-sharded; the NDFT geometry inherits the row sharding
(phase tables are per-point); Krylov dot products become psums and the small
(N, N) mode tensors are the all-reduce quantity.

Two operator engines:
  'table'  — the XLA folded-NDFT GEMMs; GSPMD inserts every collective from
             the input shardings (the solvers/loss code is exactly the
             single-chip code).
  'stream' — the streamed packed-table Pallas kernels under explicit
             shard_map (parallel/sharded.sharded_stream_ops): per-shard
             table streams + one mode-tensor psum per pass.  Pallas kernels
             do not auto-partition under GSPMD, so this is the multi-chip
             form of the single-chip training default
             (models/problem._stream_ops).
  'auto'   — 'stream' on TPU backends, 'table' on CPU meshes (tests).

The operator options mirror the single-chip GPProblem defaults: oversampled
coefficients (NN = 2N anti-aliasing), auto near-field correction for
matern12 (cross-shard ELL apply), and REAL random landmarks for the Nyström
preconditioner (ref TEST4/foo.cpp:261-266 srand(807) random perm — not a
first-k prefix).
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
from ..preconds.afn import afn_setup_from_plan
from ..solvers.lanczos import rademacher_probes
from ..utils.datasets import rand_perm
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
    precond: str = "nystrom",
    nys_rank: int = 64,
    slq_its: int = 10,
    nvecs: int = 10,
    fastsum_N: int = 32,
    oversample: int = 2,
    nearfield_lfil: Optional[int] = None,
    engine: str = "auto",
    table_dtype=None,
    tol: float = 1e-6,
    adam_alpha: float = 0.01,
    seed: int = 0,
    mesh=None,
    afn_plan=None,
):
    """Returns train_step(state, X, y, probes) -> (state, loss, grad), jitted.

    All arrays are explicit arguments; shard them with shard_training_data.
    precond: 'nystrom' (random landmarks, rand_perm(seed)) or 'afn' (pass the
    host-built afn_plan from preconds.afn.afn_plan).  engine='stream'
    requires `mesh` (the explicit shard_map needs it); 'table' works with or
    without a mesh (GSPMD propagates shardings from the inputs).
    """
    cfg = GPConfig(kind=kernel, maxits=slq_its, nvecs=nvecs, tol=tol)
    use_stream = engine == "stream" or (
        engine == "auto" and mesh is not None
        and jax.default_backend() not in ("cpu",)
    )
    if use_stream and mesh is None:
        raise ValueError("engine='stream' needs the mesh argument")
    if precond == "afn" and afn_plan is None:
        raise ValueError("precond='afn' needs afn_plan (preconds.afn.afn_plan)")

    def loss_step(raw, X, y, probes):
        n = X.shape[0]
        geom = fs.additive_fastsum_geometry(X, windows, N=fastsum_N)
        # per-group lfil resolution: additive_nearfield_patterns derives
        # each window's dimension itself (a hardcoded d=2 sized 1-D/3-D
        # window corrections wrongly — advisor r4); groups whose resolved
        # lfil is 0 keep pattern None, and nearfield_lfil=0 below stops
        # coeffs from re-adding an auto pattern for them
        nf_pats = fs.additive_nearfield_patterns(kernel, geom, nearfield_lfil)
        if all(p is None for p in nf_pats):
            nf_pats = None
        # real random landmarks (ref TEST4/foo.cpp:261-266), not first-k
        perm = rand_perm(jax.random.PRNGKey(seed), n, nys_rank)

        def build_ops(params):
            plan = fs.additive_fastsum_coeffs(
                kernel, params, geom, oversample=oversample,
                nearfield_lfil=0, nf_patterns=nf_pats,
            )
            if use_stream:
                from .sharded import sharded_stream_ops

                return sharded_stream_ops(mesh, plan, table_dtype=table_dtype)
            return (
                lambda v: fs.additive_fastsum_matvec(plan, v),
                lambda v: fs.additive_fastsum_grad_matvec(plan, v),
            )

        def precond_setup(params):
            if precond == "afn":
                return afn_setup_from_plan(
                    kernel, params, X, afn_plan, require_grad=True,
                    windows=windows,
                )
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
    adam_maxits: int = 100, seed: int = 0, precond: str = "nystrom",
    **step_kwargs,
):
    """Convenience loop: mesh + sharding + Adam iterations."""
    from ..models.transforms import transform_inverse

    mesh = make_mesh(n_devices)
    nvecs = step_kwargs.get("nvecs", 10)
    probes = rademacher_probes(jax.random.PRNGKey(seed), nvecs, X.shape[0], X.dtype)
    afn_pl = None
    if precond == "afn":
        from ..preconds.afn import afn_plan as build_afn_plan

        afn_pl = build_afn_plan(
            step_kwargs.get("kernel", "gaussian"),
            KernelParams.make(*init, dtype=jnp.asarray(X).dtype),
            jnp.asarray(X),
            maxrank=step_kwargs.get("nys_rank", 64),
            key=jax.random.PRNGKey(seed),
        )
    X, y, probes = shard_training_data(mesh, jnp.asarray(X), jnp.asarray(y), probes)
    step = make_sharded_train_step(
        windows, mesh=mesh, precond=precond, afn_plan=afn_pl, seed=seed,
        **step_kwargs,
    )
    state = adam_init(transform_inverse("softplus", jnp.asarray(init, X.dtype)))
    losses = []
    for _ in range(adam_maxits):
        state, loss, grad = step(state, X, y, probes)
        losses.append(float(loss))
    return state, losses
