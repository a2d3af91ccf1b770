"""L4 pipeline tests (BASELINE config 2: 10 keyframes, 1k points,
incremental pose init + windowed BA; ATE vs ground truth)."""

import numpy as np
import pytest

from pysfm_tpu.pipeline import IncrementalConfig, run_incremental, synthetic
from pysfm_tpu.utils import metrics


def _tracks_from_scene(sc):
    """Convert a synthetic scene's observation list to a dense track table."""
    p = sc.truth
    F, T = p.n_cameras, p.n_points
    uv = np.zeros((F, T, 2))
    vis = np.zeros((F, T), bool)
    for m in range(p.n_obs):
        f, tr = int(p.obs_cam[m]), int(p.obs_pt[m])
        uv[f, tr] = np.asarray(p.obs_uv[m])
        vis[f, tr] = True
    return uv, vis, np.asarray(p.intr)


@pytest.mark.parametrize("noise", [0.0, 0.5])
def test_incremental_ten_keyframes(noise):
    sc = synthetic.make_scene(
        10, 200, noise_px=noise, visibility=0.85, seed=13, radius=10.0
    )
    uv, vis, intr = _tracks_from_scene(sc)
    rec = run_incremental(uv, vis, intr, "pose", IncrementalConfig(seed=2))
    assert rec.registered.all()
    assert rec.has_point.mean() > 0.9
    # ATE vs ground-truth camera centers (Sim(3)-aligned).
    C_gt = np.asarray(metrics.camera_centers(sc.truth.R, sc.truth.t))
    C_est = np.asarray(metrics.camera_centers(rec.problem.R, rec.problem.t))
    ate = float(metrics.ate_rmse(np.asarray(C_est), C_gt))
    # Scene radius is 10; demand mm-level ATE noiseless, cm-level noisy.
    assert ate < (1e-5 if noise == 0 else 2e-2)
    rmse = metrics.reprojection_rmse(rec.problem)
    assert rmse < (1e-6 if noise == 0 else 1.0)


def test_incremental_with_outliers():
    sc = synthetic.make_scene(
        8, 150, noise_px=0.3, outlier_frac=0.05, outlier_px=40.0,
        visibility=0.9, seed=14,
    )
    uv, vis, intr = _tracks_from_scene(sc)
    rec = run_incremental(
        uv, vis, intr, "pose",
        IncrementalConfig(seed=3, robust="cauchy", robust_scale=2.0),
    )
    assert rec.registered.all()
    C_gt = np.asarray(metrics.camera_centers(sc.truth.R, sc.truth.t))
    C_est = np.asarray(metrics.camera_centers(rec.problem.R, rec.problem.t))
    ate = float(metrics.ate_rmse(np.asarray(C_est), C_gt))
    assert ate < 5e-2


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(40, 3))
    from pysfm_tpu.geometry import so3
    import jax.numpy as jnp

    R = np.asarray(so3.exp(jnp.asarray([0.3, -0.2, 0.5])))
    s, t = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    s_e, R_e, t_e = metrics.umeyama(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(float(s_e), s, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-10)
    np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-9)
    assert float(metrics.ate_rmse(jnp.asarray(src), jnp.asarray(dst))) < 1e-9
