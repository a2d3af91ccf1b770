"""L1 tests: SoA problem evaluation vs the per-measurement oracle (SURVEY §4.1)."""

import numpy as np
import pytest

from pysfm_tpu.pipeline import synthetic
from pysfm_tpu.problem import (
    cost,
    make_problem,
    residuals,
    residuals_and_jacobians,
)
from tests.oracle_numpy import Oracle, robust_rho_weight


def _scene(model="pose", robust="gaussian", **kw):
    kw.setdefault("n_cameras", 3)
    kw.setdefault("n_points", 15)
    kw.setdefault("noise_px", 0.5)
    kw.setdefault("visibility", 0.8)
    return synthetic.make_scene(camera_model=model, robust=robust,
                                robust_scale=2.0, seed=3, **kw)


def _oracle_of(p):
    return Oracle(
        p.camera_model,
        np.asarray(p.R), np.asarray(p.t), np.asarray(p.intr), np.asarray(p.X),
        np.asarray(p.obs_cam), np.asarray(p.obs_pt), np.asarray(p.obs_uv),
        obs_w=np.asarray(p.obs_w), cam_fixed=np.asarray(p.cam_fixed),
        robust=p.robust, robust_scale=float(p.robust_scale),
    )


@pytest.mark.parametrize("model", ["pose", "pose_k", "bal"])
@pytest.mark.parametrize("robust", ["gaussian", "huber", "cauchy"])
def test_residuals_and_cost_match_oracle(model, robust):
    sc = _scene(model=model, robust=robust)
    p = sc.problem
    oracle = _oracle_of(p)
    r = np.asarray(residuals(p))
    for m in range(p.n_obs):
        np.testing.assert_allclose(r[m], oracle.residual(m), atol=1e-9)
    np.testing.assert_allclose(float(cost(p)), oracle.cost(), rtol=1e-12)


@pytest.mark.parametrize("model", ["pose", "bal"])
def test_jacobians_match_oracle_fd(model):
    """Batched analytic J vs the oracle's finite differences (SURVEY §3.4)."""
    sc = _scene(model=model)
    p = sc.problem
    oracle = _oracle_of(p)
    _, Jc, Jp, w = residuals_and_jacobians(p)
    Jc, Jp = np.asarray(Jc), np.asarray(Jp)
    for m in range(0, p.n_obs, 7):
        Jc_o, Jp_o = oracle.jac(m)
        np.testing.assert_allclose(Jc[m], Jc_o, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(Jp[m], Jp_o, rtol=1e-5, atol=1e-4)


def test_fixed_camera_jacobian_zeroed():
    p = _scene().problem
    _, Jc, _, _ = residuals_and_jacobians(p)
    fixed_obs = np.asarray(p.cam_fixed)[np.asarray(p.obs_cam)]
    assert np.all(np.asarray(Jc)[fixed_obs] == 0)
    assert np.any(np.asarray(Jc)[~fixed_obs] != 0)


def test_robust_weight_matches_oracle():
    sc = _scene(robust="cauchy")
    p = sc.problem
    r, _, _, w = residuals_and_jacobians(p)
    r, w = np.asarray(r), np.asarray(w)
    for m in range(0, p.n_obs, 5):
        s = r[m] @ r[m]
        _, wo = robust_rho_weight("cauchy", s, float(p.robust_scale))
        np.testing.assert_allclose(w[m], wo * np.asarray(p.obs_w)[m], rtol=1e-12)


def test_point_obs_table_covers_all_obs():
    p = _scene().problem
    table, mask = np.asarray(p.pt_obs), np.asarray(p.pt_obs_mask)
    obs_pt = np.asarray(p.obs_pt)
    seen = table[mask]
    assert len(seen) == p.n_obs
    assert sorted(seen.tolist()) == list(range(p.n_obs))
    # Every table entry indexes an observation of that point.
    for j in range(p.n_points):
        assert np.all(obs_pt[table[j][mask[j]]] == j)


def test_make_problem_validates():
    sc = _scene()
    p = sc.problem
    with pytest.raises(ValueError, match="camera model"):
        make_problem(
            np.asarray(p.R), np.asarray(p.t), np.asarray(p.intr),
            np.asarray(p.X), np.asarray(p.obs_cam), np.asarray(p.obs_pt),
            np.asarray(p.obs_uv), camera_model="nope",
        )
    with pytest.raises(ValueError, match="intr"):
        make_problem(
            np.asarray(p.R), np.asarray(p.t), np.asarray(p.intr)[:, :2],
            np.asarray(p.X), np.asarray(p.obs_cam), np.asarray(p.obs_pt),
            np.asarray(p.obs_uv), camera_model="pose",
        )
