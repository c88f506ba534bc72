"""FPS, KNN pattern, rank estimation, dataset helpers, IO readers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfft4gp_tpu.ops.fps import fps, fps_full_perm
from nfft4gp_tpu.ops.knn import knn_pattern
from nfft4gp_tpu.ops.rankest import estimate_rank, RankestConfig
from nfft4gp_tpu.ops.kernels import KernelParams
from nfft4gp_tpu.utils.datasets import expand_perm, rand_perm, generate_grid2d
from nfft4gp_tpu.io import read_features, read_labels, read_windows


def test_fps_properties():
    rng = np.random.default_rng(71)
    X = jnp.asarray(rng.uniform(size=(200, 2)))
    k = 20
    res = fps(X, k)
    perm = np.asarray(res.perm)
    assert len(set(perm.tolist())) == k  # distinct
    # first point is the one nearest the mean (ordering.c:110-143)
    mean = np.asarray(X).mean(axis=0)
    d2 = ((np.asarray(X) - mean) ** 2).sum(axis=1)
    assert perm[0] == int(np.argmin(d2))
    # cover radii decrease (non-strictly)
    d = np.asarray(res.dists)[1:]
    assert (np.diff(d) <= 1e-12).all()
    # each selected point is the true farthest from the previous selection
    Xn = np.asarray(X)
    for i in [3, 10]:
        sel = Xn[perm[:i]]
        dist = np.min(((Xn[:, None, :] - sel[None, :, :]) ** 2).sum(-1), axis=1)
        assert dist[perm[i]] == pytest.approx(dist.max())


def test_expand_perm():
    pre = jnp.asarray([5, 2, 9])
    full = np.asarray(expand_perm(pre, 10))
    assert full[:3].tolist() == [5, 2, 9]
    assert sorted(full.tolist()) == list(range(10))


def test_knn_pattern_matches_bruteforce():
    rng = np.random.default_rng(73)
    X = jnp.asarray(rng.uniform(size=(120, 2)))
    lfil = 6
    idx, mask = knn_pattern(X, lfil, block=32)
    Xn = np.asarray(X)
    for i in [0, 1, 5, 40, 119]:
        J = np.asarray(idx[i])[np.asarray(mask[i])]
        assert J[-1] == i  # diagonal last
        prev = J[:-1]
        if i == 0:
            assert len(prev) == 0
            continue
        d2 = ((Xn[:i] - Xn[i]) ** 2).sum(axis=1)
        want = set(np.argsort(d2)[: min(i, lfil - 1)].tolist())
        assert set(prev.tolist()) == want
        assert sorted(prev.tolist()) == prev.tolist()  # ascending


def test_rankest_returns_reasonable_rank():
    rng = np.random.default_rng(79)
    X = jnp.asarray(rng.uniform(size=(400, 2)))
    # long lengthscale -> smooth kernel -> low rank
    p_smooth = KernelParams.make(1.0, 1.0, 0.01)
    k_smooth = estimate_rank("gaussian", p_smooth, X, jax.random.PRNGKey(0),
                             RankestConfig(nsample=200, nsample_r=2))
    # short lengthscale -> high rank
    p_rough = KernelParams.make(1.0, 0.02, 0.01)
    k_rough = estimate_rank("gaussian", p_rough, X, jax.random.PRNGKey(0),
                            RankestConfig(nsample=200, nsample_r=2))
    assert 1 <= k_smooth < k_rough


def test_grid2d():
    g = generate_grid2d(4, 5)
    assert g.shape == (20, 2)
    assert float(g.min()) == 0.0 and float(g.max()) == 1.0


def test_io_readers(tmp_path):
    fpath = tmp_path / "feat.txt"
    fpath.write_text("3 2\n1 2 3\n4 5 6\n")
    F = read_features(fpath)
    np.testing.assert_allclose(F, [[1, 4], [2, 5], [3, 6]])

    lpath = tmp_path / "lab.txt"
    lpath.write_text("3\n7 8 9\n")
    np.testing.assert_allclose(read_labels(lpath), [7, 8, 9])

    wpath = tmp_path / "win.txt"
    wpath.write_text("2 2\n0 1\n2 -1\n")
    W = read_windows(wpath)
    np.testing.assert_allclose(W, [[0, 2], [1, -1]])


def test_rankest_default_fill_distance_stage():
    """The full RankestDefault pipeline (rankest.c:133-179): eigen count +
    fill-distance knee on subsamples, then full-set FPS with the learned
    tolerance.  Fast-decay spectra must get smaller ranks than flat ones."""
    import jax.numpy as jnp
    from nfft4gp_tpu.ops.kernels import KernelParams
    from nfft4gp_tpu.ops.rankest import rankest_default, fill_distance_estimate

    rng = np.random.default_rng(19)
    n = 400
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    cfg = RankestConfig(nsample=120, nsample_r=2)

    p_smooth = KernelParams.make(1.0, 0.8, 0.05)   # fast eigen decay
    p_rough = KernelParams.make(1.0, 0.05, 1e-4)   # near-flat spectrum

    k_s, perm_s = rankest_default("gaussian", p_smooth, X, jax.random.PRNGKey(1),
                                  cfg, maxrank=200)
    k_r, perm_r = rankest_default("gaussian", p_rough, X, jax.random.PRNGKey(1),
                                  cfg, maxrank=200)
    assert 1 <= k_s < k_r <= 200
    # perm prefixes are valid distinct landmark ids
    assert len(set(perm_s.tolist())) == len(perm_s)

    est, h = fill_distance_estimate("gaussian", p_smooth, X, jax.random.PRNGKey(2),
                                    nsample=120)
    assert est >= 1 and h > 0.0
    # flat spectrum -> "not low rank" branch returns maxrank
    assert k_r == 200 or k_r > 3 * k_s


def test_afn_plan_uses_fill_distance_rank():
    """afn_plan's refinement path goes through rankest_default now."""
    import jax.numpy as jnp
    from nfft4gp_tpu.ops.kernels import KernelParams
    from nfft4gp_tpu.preconds.afn import afn_plan

    rng = np.random.default_rng(23)
    n = 300
    X = jnp.asarray(rng.uniform(size=(n, 2)))
    p = KernelParams.make(1.0, 0.6, 0.05)
    plan = afn_plan("gaussian", p, X, maxrank=150, lfil=8)
    assert 1 <= plan.k <= 150
    assert plan.use_ran  # smooth kernel at n=300 is low rank
    assert sorted(plan.perm.tolist()) == list(range(n))


def test_fps_host_matches_device():
    """Host numpy FPS must select the same landmark set as the device fps
    (same start rule + farthest-point relaxation; ties may reorder)."""
    import numpy as np
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.fps import fps, fps_host

    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.uniform(size=(500, 3)))
    k = 40
    dev = np.asarray(fps(X, k).perm)
    host, dists = fps_host(np.asarray(X), k)
    assert set(dev.tolist()) == set(host.tolist())
    assert dists[1:].max() <= dists[1] + 1e-12  # distances non-increasing


def test_knn_pattern_host_matches_device():
    """cKDTree preceding-KNN agrees with the blocked-GEMM device pattern."""
    import numpy as np
    from preconditioned_additive_gaussian_processes_with_fourier_acceleration_tpu.ops.knn import (
        knn_pattern, knn_pattern_host,
    )

    rng = np.random.default_rng(3)
    X = rng.uniform(size=(400, 2))
    lfil = 8
    di, dm = knn_pattern(jnp.asarray(X), lfil)
    hi, hm = knn_pattern_host(X, lfil)
    di, dm = np.asarray(di), np.asarray(dm)
    assert (dm == hm).all()
    # rows are index-sorted on both sides; identical sets expected except
    # distance ties — compare as sets per row
    same = sum(set(di[i][dm[i]]) == set(hi[i][hm[i]]) for i in range(400))
    assert same >= 398  # allow <=2 tie-order rows
