"""L2 solver tests: convergence on synthetic ground truth + oracle parity
(SURVEY §4.2, BASELINE configs 1 and 3)."""

import numpy as np
import pytest

from pysfm_tpu.pipeline import synthetic
from pysfm_tpu.problem import cost, residuals
from pysfm_tpu.solver import LMConfig, solve
from tests.oracle_numpy import Oracle


def rmse_px(p):
    r = np.asarray(residuals(p))
    w = np.asarray(p.obs_w) > 0
    return float(np.sqrt(np.mean(np.sum(r[w] ** 2, axis=-1))))


def test_two_view_exact_recovery():
    """BASELINE config 1: 2 cameras, ~100 points, zero noise -> noise floor."""
    sc = synthetic.make_scene(2, 100, noise_px=0.0, seed=1)
    solved, stats = solve(sc.problem, LMConfig(max_iters=50))
    assert rmse_px(solved) < 1e-8
    costs = np.asarray(stats.costs)
    assert costs[-1] < 1e-16 * max(1.0, costs[0])


def test_multiview_noise_floor():
    sc = synthetic.make_scene(6, 80, noise_px=0.5, visibility=0.8, seed=2)
    solved, stats = solve(sc.problem, LMConfig(max_iters=60))
    # Final RMSE should be at the noise floor (slightly below sigma since we
    # also fit the noise), and strictly better than the ground-truth params'
    # residual under the same noisy measurements.
    assert rmse_px(solved) < 0.6
    assert float(cost(solved)) <= float(cost(sc.truth)) + 1e-9


def test_cost_monotone_and_logged():
    sc = synthetic.make_scene(4, 40, noise_px=0.3, seed=3)
    solved, stats = solve(sc.problem, LMConfig(max_iters=30))
    costs = np.asarray(stats.costs)
    assert np.all(np.isfinite(costs))
    assert np.all(np.diff(costs) <= 1e-12)  # monotone non-increasing log
    assert int(stats.n_iters) >= 1
    lams = np.asarray(stats.lams)[: int(stats.n_iters)]
    assert np.all(np.isfinite(lams))


@pytest.mark.parametrize("model", ["pose", "pose_k", "bal"])
def test_camera_models_converge(model):
    sc = synthetic.make_scene(4, 50, camera_model=model, noise_px=0.0, seed=4,
                              perturb_rot=0.01, perturb_trans=0.02,
                              perturb_point=0.02)
    solved, _ = solve(sc.problem, LMConfig(max_iters=60))
    assert rmse_px(solved) < 1e-6


def test_gauge_fixed_camera_untouched():
    sc = synthetic.make_scene(3, 30, noise_px=0.2, seed=5)
    p = sc.problem
    solved, _ = solve(p, LMConfig(max_iters=20))
    np.testing.assert_array_equal(np.asarray(solved.R[0]), np.asarray(p.R[0]))
    np.testing.assert_array_equal(np.asarray(solved.t[0]), np.asarray(p.t[0]))


def test_robust_outlier_rejection():
    """BASELINE config 3 (scaled down): outlier matches + Huber/Cauchy."""
    base = dict(n_cameras=5, n_points=60, noise_px=0.3, outlier_frac=0.1,
                outlier_px=40.0, visibility=0.9, seed=6)
    sc_g = synthetic.make_scene(robust="gaussian", **base)
    sc_h = synthetic.make_scene(robust="huber", robust_scale=2.0, **base)
    sc_c = synthetic.make_scene(robust="cauchy", robust_scale=2.0, **base)
    inlier = np.asarray(sc_g.problem.obs_w) > 0  # all obs; outliers unknown
    solved_g, _ = solve(sc_g.problem, LMConfig(max_iters=40))
    solved_h, _ = solve(sc_h.problem, LMConfig(max_iters=40))
    solved_c, _ = solve(sc_c.problem, LMConfig(max_iters=40))

    def truth_err(p, truth):
        # Median point error vs ground truth (robust to the outliers).
        return float(np.median(np.linalg.norm(
            np.asarray(p.X) - np.asarray(truth.X), axis=-1)))

    eg = truth_err(solved_g, sc_g.truth)
    eh = truth_err(solved_h, sc_h.truth)
    ec = truth_err(solved_c, sc_c.truth)
    # Robust kernels must beat plain least squares under outliers.
    assert eh < eg
    assert ec < eg


@pytest.mark.parametrize("robust", ["gaussian", "cauchy"])
def test_oracle_parity(robust):
    """BASELINE north star: same final cost as the (oracle) reference solver
    to ~1e-6 relative on its test scenes (SURVEY §4 'NumPy oracle')."""
    sc = synthetic.make_scene(3, 20, noise_px=0.4, visibility=0.85,
                              robust=robust, robust_scale=2.0, seed=7)
    p = sc.problem
    solved, stats = solve(p, LMConfig(max_iters=25))
    oracle = Oracle(
        p.camera_model,
        np.asarray(p.R), np.asarray(p.t), np.asarray(p.intr), np.asarray(p.X),
        np.asarray(p.obs_cam), np.asarray(p.obs_pt), np.asarray(p.obs_uv),
        robust=p.robust, robust_scale=float(p.robust_scale),
    )
    oc = oracle.optimize(max_iters=25)
    costs = np.asarray(stats.costs)
    # Initial costs identical; trajectories close (oracle uses FD Jacobians);
    # final converged costs match to 1e-6 relative.
    np.testing.assert_allclose(costs[0], oc[0], rtol=1e-10)
    np.testing.assert_allclose(costs[-1], oc[-1], rtol=1e-6)


def test_windowed_ba_via_fixed_mask():
    """Windowed BA (SURVEY §3.3): freeze all but the last 2 cameras."""
    sc = synthetic.make_scene(6, 40, noise_px=0.0, seed=8)
    p = sc.problem
    fixed = np.ones(6, bool)
    fixed[-2:] = False
    # Reset frozen cameras to ground truth; only the free ones are perturbed.
    import jax.numpy as jnp

    p = p.replace(
        cam_fixed=jnp.asarray(fixed),
        R=sc.truth.R.at[-2:].set(p.R[-2:]),
        t=sc.truth.t.at[-2:].set(p.t[-2:]),
        X=sc.truth.X,
    )
    solved, _ = solve(p, LMConfig(max_iters=30))
    assert rmse_px(solved) < 1e-6
    np.testing.assert_array_equal(np.asarray(solved.R[:4]), np.asarray(p.R[:4]))


def test_solve_segmented_matches_monolithic():
    """Segmented dispatch (lam/nu carried across segments) == one
    while_loop dispatch, bit-for-bit in f64."""
    from pysfm_tpu.pipeline import synthetic as _syn
    from pysfm_tpu.solver.lm import solve_segmented

    sc = _syn.make_scene(6, 200, noise_px=0.5, visibility=0.7, seed=21)
    cfg = LMConfig(
        max_iters=13, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0
    )
    _, st_mono = solve(sc.problem, cfg)
    _, st_seg = solve_segmented(sc.problem, cfg, iters_per_dispatch=5)
    np.testing.assert_allclose(
        np.asarray(st_seg.costs), np.asarray(st_mono.costs), rtol=1e-14
    )
    np.testing.assert_array_equal(
        np.asarray(st_seg.accepted), np.asarray(st_mono.accepted)
    )
    np.testing.assert_allclose(
        np.asarray(st_seg.lams), np.asarray(st_mono.lams), rtol=1e-14
    )


def test_trace_capture_smoke(tmp_path):
    """utils.trace writes a loadable trace of a dispatched solve."""
    import os

    import numpy as np

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.utils import trace

    sc = synthetic.make_scene(3, 50, noise_px=0.3, seed=2,
                              dtype=np.float32)
    d = str(tmp_path / "trace")
    with trace.capture(d):
        with trace.annotate("solve_region"):
            solve(sc.problem, LMConfig(max_iters=2))
    found = []
    for root, _, files in os.walk(d):
        found += [f for f in files if f.endswith((".pb", ".json.gz",
                                                  ".trace.json.gz"))]
    assert found, f"no trace events written under {d}"
