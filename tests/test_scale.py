"""BAL-scale build path tests (SURVEY §5 "obs-chunked accumulation",
BASELINE config 4).

Discipline: the small-problem builders are the oracle — the chunked,
scatter-free scale builder must reproduce
:func:`pysfm_tpu.solver.schur.build_normal_equations` exactly (same
per-observation products; f64 tolerances cover the differing summation
order), and the gathered-domain PCG operator must match the materialized
dense S.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pysfm_tpu.pipeline import synthetic
from pysfm_tpu.problem import problem as problem_mod
from pysfm_tpu.solver import LMConfig, pcg, scale, schur, solve


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(
        20, 800, noise_px=0.5, visibility=0.4, robust="huber",
        robust_scale=2.0, seed=7,
    )


def _reference_eqs(p):
    r, J_cam, J_pt, w = problem_mod.residuals_and_jacobians(p)
    return schur.build_normal_equations(
        r, J_cam, J_pt, w, p.obs_cam, p.obs_pt, p.n_cameras, p.n_points
    )


@pytest.mark.parametrize("obs_chunk", [0, 256, 1000])
def test_scale_build_matches_reference(scene, obs_chunk):
    """Chunked + table-domain component-major build == segment_sum build
    (f64 exact-ish).  obs_chunk=1000 does not divide M, exercising the
    padding tail."""
    p = scene.problem
    ref = _reference_eqs(p)
    got = scale.build_normal_equations_scale(p, obs_chunk)
    cp = p.cam_dof
    M = p.n_obs
    ref_hpp6 = np.stack(
        [np.asarray(ref.Hpp)[:, d, e] for d, e in scale.TRI3]
    )
    ref_b_cm = np.transpose(np.asarray(ref.B), (2, 1, 0)).reshape(3 * cp, M)
    for name, want in (
        ("Hcc", np.asarray(ref.Hcc)),
        ("g_c", np.asarray(ref.g_c)),
        ("hpp6", ref_hpp6),
        ("g_p", np.asarray(ref.g_p).T),
        ("B_cm", ref_b_cm),
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), want,
            rtol=1e-9, atol=1e-9, err_msg=name,
        )


def test_pcg_tables_matvec_matches_dense_s(scene):
    """S x through the gathered-domain operator == materialized dense S x."""
    p = scene.problem
    ref = _reference_eqs(p)
    eqs = scale.build_normal_equations_scale(p, 0)
    lam = jnp.asarray(1e-2, p.X.dtype)
    sys_d = schur.reduce_dense(ref, lam, p.obs_cam, p.obs_pt)
    sys_t = pcg.build_pcg_system(
        eqs, lam, p.obs_cam, p.obs_pt,
        pt_obsT=p.pt_obs.T, pt_obs_maskT=p.pt_obs_mask.T,
        cam_obs=p.cam_obs, cam_obs_mask=p.cam_obs_mask,
    )
    assert sys_t.Bp is not None and sys_t.B_cm is None  # table path taken
    C, CP, _ = ref.Hcc.shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C, CP)))
    y_dense = (sys_d.S @ x.reshape(-1)).reshape(C, CP)
    y_tab = pcg.schur_matvec(sys_t, x.T)               # component-major
    np.testing.assert_allclose(
        np.asarray(y_tab), np.asarray(y_dense).T, rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sys_t.rhs).T.reshape(-1), np.asarray(sys_d.rhs),
        rtol=1e-9, atol=1e-9,
    )


def test_pcg_tables_matches_segment_sum_system(scene):
    """Table path and segment_sum fallback build the identical system."""
    p = scene.problem
    eqs = _reference_eqs(p)
    lam = jnp.asarray(1e-3, p.X.dtype)
    sys_f = pcg.build_pcg_system(eqs, lam, p.obs_cam, p.obs_pt)
    sys_t = pcg.build_pcg_system(
        eqs, lam, p.obs_cam, p.obs_pt,
        pt_obsT=p.pt_obs.T, pt_obs_maskT=p.pt_obs_mask.T,
        cam_obs=p.cam_obs, cam_obs_mask=p.cam_obs_mask,
    )
    np.testing.assert_allclose(
        np.asarray(sys_t.rhs), np.asarray(sys_f.rhs), rtol=1e-11, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(sys_t.M_inv), np.asarray(sys_f.M_inv),
        rtol=1e-9, atol=1e-11,
    )
    dc_f = pcg.pcg_solve(sys_f, tol=1e-12, max_iters=400)
    dc_t = pcg.pcg_solve(sys_t, tol=1e-12, max_iters=400)
    np.testing.assert_allclose(
        np.asarray(dc_t), np.asarray(dc_f), rtol=1e-7, atol=1e-10
    )
    dp_f = pcg.back_substitute(sys_f, dc_f)
    dp_t = pcg.back_substitute(sys_t, dc_t)
    np.testing.assert_allclose(
        np.asarray(dp_t), np.asarray(dp_f), rtol=1e-7, atol=1e-10
    )


def test_lm_pcg_chunked_matches_dense(scene):
    cfg_d = LMConfig(max_iters=12)
    cfg_p = dataclasses.replace(
        cfg_d, solver="pcg", cg_tol=1e-10, cg_iters=300, obs_chunk=777
    )
    _, st_d = solve(scene.problem, cfg_d)
    _, st_p = solve(scene.problem, cfg_p)
    c_d = float(np.asarray(st_d.costs)[-1])
    c_p = float(np.asarray(st_p.costs)[-1])
    assert c_p < float(np.asarray(st_p.costs)[0]) * 0.05  # near noise floor
    np.testing.assert_allclose(c_p, c_d, rtol=1e-5)


def test_mini_bal_scene_solves():
    """A shrunk BASELINE-config-4 shape through the full scale path: window
    visibility, Poisson tracks, PCG + obs-chunking, f32."""
    sc = synthetic.make_bal_scene(
        60, 4000, mean_track=5.0, max_track=9, noise_px=0.5,
        seed=3, dtype=np.float32,
    )
    p = sc.problem
    assert p.n_obs >= 2 * p.n_points
    cfg = LMConfig(
        max_iters=10, solver="pcg", cg_tol=1e-6, cg_iters=100,
        obs_chunk=4096,
    )
    solved, st = solve(p, cfg)
    costs = np.asarray(st.costs)
    assert np.isfinite(costs[-1])
    assert costs[-1] < costs[0] * 0.05


@pytest.mark.parametrize("obs_chunk", [0, 777])
def test_cost_scale_matches_plain(scene, obs_chunk):
    """Obs-chunked cost == plain cost (f64; differing summation order)."""
    p = scene.problem
    c_plain = float(problem_mod.cost(p))
    c_chunk = float(scale.cost_scale(p, obs_chunk))
    np.testing.assert_allclose(c_chunk, c_plain, rtol=1e-12)
