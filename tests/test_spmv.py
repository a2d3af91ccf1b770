"""Grouped-layout Pallas S-matvec kernels vs a direct NumPy reference.

Covers pysfm_tpu/problem/grouped.py (static layout build) and
pysfm_tpu/solver/kernels/pallas_spmv.py (K_A/K_B/K_C/K_D/K_E/K_H) in
interpret mode on CPU; compiled-on-TPU equality is
tests/test_tpu_hw.py::test_grouped_kernels_compiled_on_tpu.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pysfm_tpu.problem import grouped
from pysfm_tpu.solver.kernels import pallas_spmv


def _random_incidence(rng, C, P, mean_track=4, cp=9):
    """Random BA-like visibility: every point sees >= 2 cameras."""
    cams, pts = [], []
    for p in range(P):
        k = 2 + rng.poisson(mean_track - 2)
        k = min(k, C)
        for c in rng.choice(C, size=k, replace=False):
            cams.append(c)
            pts.append(p)
    obs_cam = np.asarray(cams, np.int32)
    obs_pt = np.asarray(pts, np.int32)
    # point-sorted, like the CM problem layout
    o = np.argsort(obs_pt, kind="stable")
    obs_cam, obs_pt = obs_cam[o], obs_pt[o]
    M = obs_cam.shape[0]
    B = rng.standard_normal((3 * cp, M)).astype(np.float32)
    return obs_cam, obs_pt, B


def _make_ops(obs_cam, obs_pt, B, C, P):
    meta = grouped.build_grouped(obs_cam, obs_pt, C, P)
    M_B = meta.order.shape[0]
    NB = M_B // grouped.BLK
    b_B = np.zeros((B.shape[0], M_B), np.float32)
    real = meta.order >= 0
    b_B[:, real] = B[:, meta.order[real]]
    b_rows = jnp.asarray(
        b_B.reshape(B.shape[0], NB, grouped.BLK // 128, 128)
    )
    return meta, pallas_spmv.device_grouped(meta, b_rows)


@pytest.mark.parametrize("C,P", [(5, 40), (300, 700), (130, 3000)])
def test_hcpT_x_grouped(rng, C, P):
    cp = 9
    obs_cam, obs_pt, B = _random_incidence(rng, C, P, cp=cp)
    meta, ops = _make_ops(obs_cam, obs_pt, B, C, P)
    x = rng.standard_normal((cp, C)).astype(np.float32)

    # reference: u[s, p] = sum_{m in p} sum_d B[s*cp+d, m] x[d, cam(m)]
    Bd = B.astype(np.float64)
    xg = x.astype(np.float64)[:, obs_cam]                 # [cp, M]
    u_ref = np.zeros((3, P))
    for s in range(3):
        q = np.einsum("dm,dm->m", Bd[s * cp:(s + 1) * cp], xg)
        np.add.at(u_ref[s], obs_pt, q)

    u = pallas_spmv.hcpT_x_grouped(
        ops, jnp.asarray(x), cp=cp, interpret=True
    )
    u = np.asarray(u)[:, :P]
    np.testing.assert_allclose(u, u_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("C,P", [(5, 40), (300, 700), (130, 3000)])
def test_hcp_w_grouped(rng, C, P):
    cp = 9
    obs_cam, obs_pt, B = _random_incidence(rng, C, P, cp=cp)
    meta, ops = _make_ops(obs_cam, obs_pt, B, C, P)
    w3 = rng.standard_normal((3, P)).astype(np.float32)

    # reference: y[d, c] = sum_{m in c} sum_s B[s*cp+d, m] w[s, pt(m)]
    Bd = B.astype(np.float64)
    wg = w3.astype(np.float64)[:, obs_pt]                 # [3, M]
    y_ref = np.zeros((cp, C))
    for d in range(cp):
        z = sum(Bd[s * cp + d] * wg[s] for s in range(3))
        np.add.at(y_ref[d], obs_cam, z)

    y = pallas_spmv.hcp_w_grouped(
        ops, jnp.asarray(w3), C, cp=cp, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("C,P", [(5, 40), (300, 700), (130, 3000)])
@pytest.mark.parametrize("T", [2, 4])
def test_two_phase_matvec_matches_single_block(rng, C, P, T):
    """K_A2/K_B2 (superstep two-phase schedule) == K_A/K_B on the same
    stream padded to a block-count multiple of the superstep."""
    cp = 9
    obs_cam, obs_pt, B = _random_incidence(rng, C, P, cp=cp)
    meta0 = grouped.build_grouped(obs_cam, obs_pt, C, P)
    NB0 = meta0.block_group.shape[0]
    NB = -(-NB0 // T) * T
    meta = (
        grouped._append_pad_blocks(meta0, NB) if NB > NB0 else meta0
    )
    M_B = meta.order.shape[0]
    b_B = np.zeros((B.shape[0], M_B), np.float32)
    real = meta.order >= 0
    b_B[:, real] = B[:, meta.order[real]]
    b_rows = jnp.asarray(
        b_B.reshape(B.shape[0], NB, grouped.BLK // 128, 128)
    )
    ops = pallas_spmv.device_grouped(meta, b_rows)
    ops2 = ops.replace(superstep=T)

    x = jnp.asarray(rng.standard_normal((cp, C)).astype(np.float32))
    u1 = pallas_spmv.hcpT_x_grouped(ops, x, cp=cp, interpret=True)
    u2 = pallas_spmv.hcpT_x_grouped2(ops2, x, cp=cp, interpret=True)
    np.testing.assert_allclose(
        np.asarray(u2)[:, :P], np.asarray(u1)[:, :P], rtol=2e-4, atol=2e-4
    )

    w3 = jnp.asarray(rng.standard_normal((3, P)).astype(np.float32))
    y1 = pallas_spmv.hcp_w_grouped(ops, w3, C, cp=cp, interpret=True)
    y2 = pallas_spmv.hcp_w_grouped2(ops2, w3, C, cp=cp, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(y1), rtol=2e-4, atol=2e-4
    )


def test_solve_cm_with_grouped_kernels(rng):
    """Full LM solve: grouped-kernel matvecs == XLA-table matvecs."""
    import dataclasses

    import numpy as np

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.solver import LMConfig
    from pysfm_tpu.solver.lm import make_grouped_ops, solve

    sc = synthetic.make_bal_scene(
        8, 500, mean_track=4.0, max_track=8, noise_px=0.5, seed=3,
        dtype=np.float32, with_truth=False, layout="cm",
    )
    cfg = LMConfig(
        max_iters=3, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
        solver="pcg", cg_iters=20, cg_tol=1e-6,
    )
    p_ref, st_ref = solve(sc.problem, cfg)
    gops = make_grouped_ops(sc.problem)
    p_k, st_k = solve(sc.problem, cfg, gops=gops)
    c_ref = np.asarray(st_ref.costs)
    c_k = np.asarray(st_k.costs)
    np.testing.assert_allclose(c_k, c_ref, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(p_k.X3), np.asarray(p_ref.X3), rtol=2e-2, atol=2e-3
    )


def test_payload_b_grouped_matches_scale_build(rng):
    """K_D-built coupling rows == the scale.py payload's B rows permuted."""
    import numpy as np

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.problem import cm
    from pysfm_tpu.solver import scale
    from pysfm_tpu.solver.kernels import pallas_spmv
    from pysfm_tpu.solver.lm import make_grouped_ops

    sc = synthetic.make_bal_scene(
        6, 400, mean_track=4.0, max_track=8, noise_px=0.5, seed=5,
        robust="huber", robust_scale=2.0, dtype=np.float32,
        with_truth=False, layout="cm",
    )
    p = sc.problem
    gops = make_grouped_ops(p)
    b_k = np.asarray(pallas_spmv.payload_b_grouped(
        gops, cm.cam_table(p), p.X3, p.robust_scale,
        cp=p.cam_dof, model=p.camera_model, robust=p.robust,
        interpret=True,
    ))
    eqs = scale.build_normal_equations_scale_cm(p, 0)
    b_ref = np.asarray(pallas_spmv.permute_b_rows(
        jnp.asarray(np.asarray(eqs.B_cm)), gops.order
    ))
    np.testing.assert_allclose(b_k, b_ref, rtol=2e-4, atol=1e-5)


def test_grouped_meta_consistency(rng):
    C, P = 50, 300
    obs_cam, obs_pt, _ = _random_incidence(rng, C, P)
    meta = grouped.build_grouped(obs_cam, obs_pt, C, P)
    M_B = meta.order.shape[0]
    assert M_B % grouped.BLK == 0
    real = meta.order >= 0
    assert real.sum() == obs_cam.shape[0]
    # each original obs appears exactly once
    assert np.array_equal(
        np.sort(meta.order[real]), np.arange(obs_cam.shape[0])
    )
    # local ids reconstruct global ids
    NB = M_B // grouped.BLK
    grp = np.repeat(meta.block_group, grouped.BLK)
    chk = np.repeat(meta.block_chunk, grouped.BLK)
    cam_g = grp * grouped.CGRP + meta.lcam
    pt_g = chk.astype(np.int64) * grouped.PCH + meta.lpt
    np.testing.assert_array_equal(cam_g[real], obs_cam[meta.order[real]])
    np.testing.assert_array_equal(pt_g[real], obs_pt[meta.order[real]])
    # every block's cameras share one group, points one chunk
    assert (meta.lcam >= 0).all() and (meta.lcam < grouped.CGRP).all()
    assert (meta.lpt >= 0).all() and (meta.lpt < grouped.PCH).all()


def test_build_eqs_grouped_matches_scale_build(rng):
    """K_E fused build (b_rows + Hcc/g_c + hpp6/g_p) == scale.py's XLA
    build, and K_H's block-Jacobi diagonal == the table-domain one."""
    import numpy as np

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.problem import cm
    from pysfm_tpu.solver import pcg, scale
    from pysfm_tpu.solver.kernels import pallas_spmv
    from pysfm_tpu.solver.lm import make_grouped_ops

    sc = synthetic.make_bal_scene(
        6, 400, mean_track=4.0, max_track=8, noise_px=0.5, seed=5,
        robust="huber", robust_scale=2.0, dtype=np.float32,
        with_truth=False, layout="cm",
    )
    p = sc.problem
    gops = make_grouped_ops(p)
    eqs_k, b_k = pallas_spmv.build_eqs_grouped(
        gops, cm.cam_table(p), p.X3, p.robust_scale,
        cp=p.cam_dof, model=p.camera_model, robust=p.robust,
        n_cameras=p.n_cameras, n_points=p.n_points, interpret=True,
    )
    eqs = scale.build_normal_equations_scale_cm(p, 0)
    b_ref = np.asarray(pallas_spmv.permute_b_rows(
        jnp.asarray(np.asarray(eqs.B_cm)), gops.order
    ))
    np.testing.assert_allclose(np.asarray(b_k), b_ref, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(eqs_k.Hcc), np.asarray(eqs.Hcc), rtol=2e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(eqs_k.g_c), np.asarray(eqs.g_c), rtol=2e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(eqs_k.hpp6), np.asarray(eqs.hpp6), rtol=2e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(eqs_k.g_p), np.asarray(eqs.g_p), rtol=2e-4, atol=1e-4
    )
    assert eqs_k.B_cm is None

    # K_H: preconditioner diagonal from grouped rows vs the table domain.
    lam = jnp.asarray(1e-3, jnp.float32)
    hinv6 = scale.sym6_inv(scale.augment6(eqs.hpp6, lam))
    gops_it = gops.replace(b_rows=jnp.asarray(b_ref))
    D_k = np.asarray(pallas_spmv.precond_diag_grouped(
        gops_it, hinv6, p.n_cameras, cp=p.cam_dof, interpret=True
    ))
    # Reference: same contraction from the camera-major gathered table.
    cp3 = p.cam_dof
    Bg = np.asarray(eqs.B_cm)[:, np.asarray(p.cam_obs)]
    Bg *= np.asarray(p.cam_obs_mask, np.float32)[None]
    Bg4 = Bg.reshape(3, cp3, p.n_cameras, -1)
    hv = np.asarray(hinv6)[:, np.asarray(p.obs_pt)[np.asarray(p.cam_obs)]]
    a, b, c_, d_, e, f = hv
    B0, B1, B2 = Bg4[0], Bg4[1], Bg4[2]
    BH0 = a * B0 + b * B1 + d_ * B2
    BH1 = b * B0 + c_ * B1 + e * B2
    BH2 = d_ * B0 + e * B1 + f * B2
    D_ref = (
        np.einsum("dck,eck->cde", BH0, B0)
        + np.einsum("dck,eck->cde", BH1, B1)
        + np.einsum("dck,eck->cde", BH2, B2)
    )
    np.testing.assert_allclose(D_k, D_ref, rtol=3e-4, atol=1e-4)


def test_solve_cm_fully_grouped(rng):
    """End-to-end LM with the fully grouped path (K_E build + K_H
    preconditioner + K_A/K_B matvecs) == the XLA path."""
    import numpy as np

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.solver import LMConfig
    from pysfm_tpu.solver.lm import make_grouped_ops, solve

    sc = synthetic.make_bal_scene(
        8, 500, mean_track=4.0, max_track=8, noise_px=0.5, seed=3,
        dtype=np.float32, with_truth=False, layout="cm",
    )
    cfg = LMConfig(
        max_iters=3, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
        solver="pcg", cg_iters=20, cg_tol=1e-6,
    )
    p_ref, st_ref = solve(sc.problem, cfg)
    gops = make_grouped_ops(sc.problem)
    p_k, st_k = solve(sc.problem, cfg, gops=gops)
    np.testing.assert_allclose(
        np.asarray(st_k.costs), np.asarray(st_ref.costs), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(p_k.X3), np.asarray(p_ref.X3), rtol=2e-2, atol=2e-3
    )


def test_cost_grouped_matches_scale_cost(rng):
    """K_C grouped robust cost == the obs-chunked XLA cost."""
    import numpy as np

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.problem import cm
    from pysfm_tpu.solver import scale
    from pysfm_tpu.solver.kernels import pallas_spmv
    from pysfm_tpu.solver.lm import make_grouped_ops

    sc = synthetic.make_bal_scene(
        6, 400, mean_track=4.0, max_track=8, noise_px=0.5, seed=5,
        robust="huber", robust_scale=2.0, dtype=np.float32,
        with_truth=False, layout="cm",
    )
    p = sc.problem
    gops = make_grouped_ops(p)
    c_k = float(pallas_spmv.cost_grouped(
        gops, cm.cam_table(p), p.X3, p.robust_scale,
        model=p.camera_model, robust=p.robust, interpret=True,
    ))
    c_ref = float(scale.cost_scale_cm(p, 0))
    np.testing.assert_allclose(c_k, c_ref, rtol=2e-5)


def test_bf16_rows_solve_tracks_f32():
    """Opt-in bf16 coupling rows (make_grouped_ops rows_dtype): storage is
    bf16, kernel arithmetic f32 — the CG operator is a fixed bf16-rounded
    S whose ~4e-3 relative rounding sits inside the cg_tol=1e-2 forcing
    tolerance.  The LM trajectory must track the f32-rows one; measured on
    hardware the final costs agree to ~5e-6 relative (BF16_ROWS_r05.json).
    Memory: halves the dominant per-iteration buffer (b_rows)."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.problem import cm
    from pysfm_tpu.solver import LMConfig, solve
    from pysfm_tpu.solver.lm import make_grouped_ops

    sc = synthetic.make_scene(
        10, 400, noise_px=0.5, visibility=0.5, robust="huber",
        robust_scale=2.0, seed=3, dtype=np.float32,
    )
    cmp = cm.from_problem(sc.problem)
    g32 = make_grouped_ops(cmp)
    g16 = make_grouped_ops(cmp, rows_dtype=jnp.bfloat16)
    assert g16.b_rows.dtype == jnp.bfloat16
    assert g16.b_rows.nbytes == g32.b_rows.nbytes // 2
    cfg = LMConfig(
        max_iters=12, solver="pcg", cg_iters=20, cg_tol=1e-2,
        cg_forcing="ew", cg_q_tol=0.3,
        tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
    )
    _, s32 = solve(cmp, cfg, gops=g32)
    _, s16 = solve(cmp, cfg, gops=g16)
    c32 = np.asarray(s32.costs, np.float64)
    c16 = np.asarray(s16.costs, np.float64)
    rel = np.abs(c16 - c32) / np.maximum(np.abs(c32), 1.0)
    assert rel.max() < 5e-3, rel.max()     # whole-trajectory tracking
    assert rel[-1] < 1e-4, rel[-1]         # same converged cost
