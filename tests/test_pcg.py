"""Matrix-free PCG Schur solver tests (SURVEY §7 step 6, BASELINE config 4).

Discipline: the dense Schur path is the oracle — the PCG step must
reproduce it to CG tolerance on problems where both exist, and the full LM
loop must reach the same cost either way.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pysfm_tpu.pipeline import synthetic
from pysfm_tpu.problem import problem as problem_mod
from pysfm_tpu.solver import LMConfig, pcg, schur, solve


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(
        20, 800, noise_px=0.5, visibility=0.4, seed=5
    )


def _normal_eqs(p):
    r, J_cam, J_pt, w = problem_mod.residuals_and_jacobians(p)
    return schur.build_normal_equations(
        r, J_cam, J_pt, w, p.obs_cam, p.obs_pt, p.n_cameras, p.n_points
    )


def test_pcg_matches_dense_step(scene):
    p = scene.problem
    eqs = _normal_eqs(p)
    lam = jnp.asarray(1e-3, p.X.dtype)
    dc_d, dp_d = schur.solve_step_dense(eqs, lam, p.obs_cam, p.obs_pt)
    dc_p, dp_p = pcg.solve_step_pcg(
        eqs, lam, p.obs_cam, p.obs_pt, tol=1e-12, max_iters=400
    )
    np.testing.assert_allclose(
        np.asarray(dc_p), np.asarray(dc_d), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(dp_p), np.asarray(dp_d), rtol=1e-6, atol=1e-9
    )


def test_matvec_against_materialized_s(scene):
    """S x via the implicit chain == S x via the materialized dense S."""
    p = scene.problem
    eqs = _normal_eqs(p)
    lam = jnp.asarray(1e-2, p.X.dtype)
    sys_d = schur.reduce_dense(eqs, lam, p.obs_cam, p.obs_pt)
    sys_p = pcg.build_pcg_system(eqs, lam, p.obs_cam, p.obs_pt)
    C, CP, _ = eqs.Hcc.shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C, CP)))
    y_dense = (sys_d.S @ x.reshape(-1)).reshape(C, CP)
    y_imp = pcg.schur_matvec(sys_p, x.T)               # component-major
    np.testing.assert_allclose(
        np.asarray(y_imp), np.asarray(y_dense).T, rtol=1e-9, atol=1e-9
    )
    # rhs agrees too (dense path keeps it flat, cm path [CP, C]).
    np.testing.assert_allclose(
        np.asarray(sys_p.rhs).T.reshape(-1), np.asarray(sys_d.rhs),
        rtol=1e-9, atol=1e-9,
    )


def test_lm_with_pcg_converges_like_dense(scene):
    cfg_d = LMConfig(max_iters=15)
    cfg_p = dataclasses.replace(cfg_d, solver="pcg", cg_tol=1e-10, cg_iters=300)
    _, st_d = solve(scene.problem, cfg_d)
    _, st_p = solve(scene.problem, cfg_p)
    c_d = float(np.asarray(st_d.costs)[-1])
    c_p = float(np.asarray(st_p.costs)[-1])
    assert c_p < float(np.asarray(st_p.costs)[0]) * 1e-2
    np.testing.assert_allclose(c_p, c_d, rtol=1e-5)


def test_pcg_large_smoke():
    """A shape the dense-W path could not hold at real scale (here scaled
    down for CPU CI): 100 cams, 10k pts, robust kernel, f32."""
    sc = synthetic.make_scene(
        100, 10_000, noise_px=0.5, visibility=0.05, robust="huber",
        robust_scale=2.0, seed=9, dtype=np.float32,
    )
    cfg = LMConfig(max_iters=8, solver="pcg", cg_tol=1e-6, cg_iters=80)
    solved, st = solve(sc.problem, cfg)
    costs = np.asarray(st.costs)
    assert np.isfinite(costs[-1])
    assert costs[-1] < costs[0] * 0.05


def test_adaptive_forcing_same_cost_fewer_matvecs():
    """Eisenstat-Walker forcing + Q-stagnation termination must reach the
    fixed-budget final cost while spending materially fewer total CG
    iterations (VERDICT r4 next-round #1)."""
    cmp = synthetic.make_bal_scene(
        16, 1500, mean_track=5.0, max_track=10, noise_px=0.5, seed=7,
        with_truth=False, layout="cm",
    ).problem
    base = LMConfig(
        max_iters=15, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
        solver="pcg", cg_iters=25, cg_tol=1e-2,
    )
    ew = dataclasses.replace(base, cg_forcing="ew", cg_q_tol=0.1)
    _, st_f = solve(cmp, base)
    _, st_e = solve(cmp, ew)
    c_f = float(np.asarray(st_f.costs)[-1])
    c_e = float(np.asarray(st_e.costs)[-1])
    np.testing.assert_allclose(c_e, c_f, rtol=1e-4)
    cg_f = int(np.asarray(st_f.cg_iters).sum())
    cg_e = int(np.asarray(st_e.cg_iters).sum())
    assert cg_e < 0.7 * cg_f, (cg_e, cg_f)
    # The stats record real per-iteration counts bounded by the budget.
    per = np.asarray(st_e.cg_iters)
    assert per.max() <= base.cg_iters and per.min() >= 0


def test_q_termination_bounds_polish_iterations():
    """With LM nearly converged, Q-stagnation exits CG in O(1) iterations:
    the warm-started step barely changes the quadratic model."""
    cmp = synthetic.make_bal_scene(
        12, 800, mean_track=4.0, max_track=8, noise_px=0.5, seed=3,
        with_truth=False, layout="cm",
    ).problem
    cfg = LMConfig(
        max_iters=20, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
        solver="pcg", cg_iters=50, cg_tol=1e-8, cg_q_tol=0.1,
    )
    _, st = solve(cmp, cfg)
    per = np.asarray(st.cg_iters)
    # Tail iterations (LM converged: cost plateaued) must be cheap.
    assert per[-3:].max() <= 10, list(per)


def test_power_series_preconditioner_matches_jacobi_solution(scene):
    """precond_terms=2 changes the preconditioner, not the solution: the
    tightly-converged step equals the block-Jacobi one."""
    p = scene.problem
    eqs = _normal_eqs(p)
    lam = jnp.asarray(1e-3, p.X.dtype)
    dc1, dp1, n1 = pcg.solve_step_pcg_cm3(
        eqs, lam, p.obs_cam, p.obs_pt, tol=1e-12, max_iters=400,
    )
    dc2, dp2, n2 = pcg.solve_step_pcg_cm3(
        eqs, lam, p.obs_cam, p.obs_pt, tol=1e-12, max_iters=400,
        precond_terms=2,
    )
    np.testing.assert_allclose(
        np.asarray(dc2), np.asarray(dc1), rtol=1e-6, atol=1e-9
    )
    # The stronger preconditioner must not need MORE iterations.
    assert int(n2) <= int(n1), (int(n2), int(n1))


def test_sharded_pcg_matches_single_device(scene):
    import jax

    from pysfm_tpu import dist

    n_dev = min(8, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    mesh = dist.make_mesh(n_dev)
    cfg = LMConfig(max_iters=6, solver="pcg", cg_tol=1e-10, cg_iters=300)
    _, st_single = solve(scene.problem, cfg)
    sp = dist.device_put_sharded(
        dist.shard_problem(scene.problem, n_dev), mesh
    )
    _, st_shard = dist.solve_sharded(sp, mesh, cfg)
    np.testing.assert_allclose(
        np.asarray(st_shard.costs)[-1], np.asarray(st_single.costs)[-1],
        rtol=1e-6,
    )


def test_reject_reuses_linearization_bitwise():
    """A rejected LM step leaves the parameters unchanged, so the loop may
    carry (eqs, b_rows) across the reject instead of rebuilding
    (LMConfig.reuse_linearization).  The trajectory must be BITWISE the
    no-carry one — the rebuild is deterministic, so any deviation means the
    carry is reusing a stale linearization."""
    from pysfm_tpu.problem import cm

    sc = synthetic.make_scene(
        12, 600, noise_px=1.0, outlier_frac=0.1, outlier_px=60.0,
        visibility=0.5, robust="cauchy", robust_scale=2.0,
        perturb_rot=0.15, perturb_trans=0.3, perturb_point=0.3, seed=3,
        dtype=np.float32,  # f32: LM hits its accept plateau -> real rejects
    )
    cmp = cm.from_problem(sc.problem)
    cfg = LMConfig(
        max_iters=40, solver="pcg", cg_iters=30, cg_tol=1e-2,
        cg_forcing="ew", cg_q_tol=0.3,
        tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
    )
    _, st_reuse = solve(cmp, cfg)
    _, st_rebuild = solve(
        cmp, dataclasses.replace(cfg, reuse_linearization=False)
    )
    acc = np.asarray(st_reuse.accepted)
    assert (~acc).any(), "scene produced no rejects; test exercises nothing"
    np.testing.assert_array_equal(
        np.asarray(st_reuse.costs), np.asarray(st_rebuild.costs)
    )
    np.testing.assert_array_equal(
        np.asarray(st_reuse.cg_iters), np.asarray(st_rebuild.cg_iters)
    )
