"""L7 distributed tests on the 8-device host-CPU mesh (SURVEY §4):
the sharded Schur solve must equal the single-device solve."""

import jax
import numpy as np
import pytest

from pysfm_tpu import dist
from pysfm_tpu.pipeline import synthetic
from pysfm_tpu.problem import cost
from pysfm_tpu.solver import LMConfig, solve


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return dist.make_mesh(8)


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_matches_single_device(mesh8, n_shards):
    """SURVEY §4 invariant: sharded Schur solve == single-device solve."""
    mesh = dist.make_mesh(n_shards)
    sc = synthetic.make_scene(8, 100, noise_px=0.4, visibility=0.8, seed=31)
    p = sc.problem
    cfg = LMConfig(max_iters=20)
    sp = dist.device_put_sharded(dist.shard_problem(p, n_shards), mesh)
    solved_sp, stats_n = dist.solve_sharded(sp, mesh, cfg)
    solved_1, stats_1 = solve(p, cfg)
    np.testing.assert_allclose(
        np.asarray(stats_n.costs), np.asarray(stats_1.costs), rtol=1e-9
    )
    assert int(stats_n.n_iters) == int(stats_1.n_iters)
    # Unsharded problem evaluates to the same cost as the sharded log.
    pb = dist.unshard_problem(solved_sp, p)
    np.testing.assert_allclose(
        float(cost(pb)), float(np.asarray(stats_n.costs)[-1]), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(pb.X), np.asarray(solved_1.X), atol=1e-8
    )


def test_sharded_robust_kernel(mesh8):
    sc = synthetic.make_scene(
        6, 64, noise_px=0.3, outlier_frac=0.1, robust="huber",
        robust_scale=2.0, seed=32,
    )
    cfg = LMConfig(max_iters=15)
    sp = dist.device_put_sharded(dist.shard_problem(sc.problem, 8), mesh8)
    _, stats_n = dist.solve_sharded(sp, mesh8, cfg)
    _, stats_1 = solve(sc.problem, cfg)
    np.testing.assert_allclose(
        np.asarray(stats_n.costs), np.asarray(stats_1.costs), rtol=1e-9
    )


def test_sharded_pcg_matches_single_device(mesh8):
    """The BAL-scale path under shard_map: chunked scatter-free build +
    gathered-domain PCG with psum'd matvecs == single-device PCG solve."""
    import dataclasses

    sc = synthetic.make_scene(
        10, 120, noise_px=0.4, visibility=0.7, robust="huber",
        robust_scale=2.0, seed=35,
    )
    cfg = LMConfig(
        max_iters=15, solver="pcg", cg_tol=1e-10, cg_iters=300,
        obs_chunk=128,
    )
    sp = dist.device_put_sharded(dist.shard_problem(sc.problem, 8), mesh8)
    _, stats_n = dist.solve_sharded(sp, mesh8, cfg)
    _, stats_1 = solve(sc.problem, dataclasses.replace(cfg, obs_chunk=0))
    np.testing.assert_allclose(
        np.asarray(stats_n.costs), np.asarray(stats_1.costs), rtol=1e-7
    )
    _, stats_d = solve(sc.problem, LMConfig(max_iters=15))
    np.testing.assert_allclose(
        float(np.asarray(stats_n.costs)[-1]),
        float(np.asarray(stats_d.costs)[-1]), rtol=1e-6,
    )


def test_uneven_point_count(mesh8):
    """101 points over 8 shards — padding points must not perturb the solve."""
    sc = synthetic.make_scene(4, 101, noise_px=0.2, seed=33)
    cfg = LMConfig(max_iters=10)
    sp = dist.device_put_sharded(dist.shard_problem(sc.problem, 8), mesh8)
    _, stats_n = dist.solve_sharded(sp, mesh8, cfg)
    _, stats_1 = solve(sc.problem, cfg)
    np.testing.assert_allclose(
        np.asarray(stats_n.costs), np.asarray(stats_1.costs), rtol=1e-9
    )


def test_shard_problem_roundtrip():
    sc = synthetic.make_scene(3, 37, noise_px=0.1, seed=34)
    p = sc.problem
    sp = dist.shard_problem(p, 4)
    X_back = dist.unshard_points(sp)
    np.testing.assert_array_equal(np.asarray(X_back), np.asarray(p.X))
    # Every observation present exactly once with matching cameras.
    w = np.asarray(sp.obs_w)
    assert int((w > 0).sum()) == p.n_obs
