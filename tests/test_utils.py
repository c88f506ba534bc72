"""Utility modules: timers, debug dumps, pytree helper, solver edge cases."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nfft4gp_tpu.utils.timers import StageTimers, timed_block_until_ready
from nfft4gp_tpu.utils.debug import print_matrix, dump_points, dump_ell_pattern
from nfft4gp_tpu.utils.pytree import pytree_dataclass, replace
from nfft4gp_tpu.solvers.pcg import pcg
from nfft4gp_tpu.solvers.fgmres import fgmres


def test_stage_timers():
    t = StageTimers()
    with t("setup"):
        x = jnp.ones((10,)) * 2
    with t("setup"):
        y = x + 1
    assert t.counts["setup"] == 2
    assert "setup" in t.summary()
    t.reset()
    assert not t.totals


def test_timed_block():
    out, dt = timed_block_until_ready(lambda v: v * 2, jnp.ones((5,)))
    assert dt >= 0 and float(out[0]) == 2.0


def test_debug_dumps(tmp_path, capsys):
    print_matrix(np.eye(3), "I")
    assert "I (3 x 3)" in capsys.readouterr().out
    dump_points(tmp_path / "pts.txt", np.random.rand(5, 2), np.random.rand(5))
    assert (tmp_path / "pts.txt").exists()
    dump_ell_pattern(
        tmp_path / "pat.txt", np.asarray([[0, 0], [0, 1]]),
        np.asarray([[False, True], [True, True]]),
    )
    assert len(open(tmp_path / "pat.txt").read().splitlines()) == 3


def test_pytree_dataclass_static_fields():
    @pytree_dataclass(static_fields=("name",))
    class Thing:
        name: str
        val: jnp.ndarray

    t = Thing(name="a", val=jnp.ones((3,)))
    leaves, treedef = jax.tree_util.tree_flatten(t)
    assert len(leaves) == 1
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert t2.name == "a"
    t3 = replace(t, val=jnp.zeros((3,)))
    assert float(t3.val.sum()) == 0.0

    # static field participates in jit cache key, array field traces
    @jax.jit
    def f(thing):
        return thing.val * 2

    np.testing.assert_allclose(np.asarray(f(t)), 2.0)


def test_pcg_absolute_tolerance():
    A = jnp.eye(8) * 4.0
    b = jnp.ones((8,))
    res = pcg(lambda x: A @ x, b, tol=1e-10, atol=True, maxits=50)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), 0.25, rtol=1e-8)


def test_fgmres_zero_rhs():
    A = jnp.eye(6) * 2.0
    b = jnp.zeros((6,))
    res = fgmres(lambda x: A @ x, b, kdim=6, tol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x), 0.0)


def test_pcg_identity_one_step():
    b = jnp.asarray(np.random.default_rng(0).normal(size=12))
    res = pcg(lambda x: x, b, tol=1e-12, maxits=10)
    assert int(res.niter) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b), rtol=1e-12)
