"""On-hardware test tier (VERDICT r1 item 5): runs ONLY on the real TPU.

Invoke once per round with

    PALLAS_AXON_POOL_IPS unset-untouched (TPU tunnel live)
    PYSFM_TEST_PLATFORM=axon,cpu python3 -m pytest tests/test_tpu_hw.py -q -s

and commit the captured output (``TPU_PARITY_r{N}.txt``).  The whole suite
skips on any non-TPU backend, so CI on the CPU mesh is unaffected.

What it converts from comment to evidence (SURVEY §7 "f64 parity on TPU" —
the top schedule risk; BASELINE north-star "final reprojection RMSE ±1e-6"):

1. compiled Pallas projection kernel == jax path ON DEVICE (the CPU suite
   only checks interpret mode);
2. the f32 TPU full solve on BASELINE config 1 (two-view) reaches the same
   final cost/RMSE as the f64 oracle (pure-NumPy, reference-style LM);
3. the f32 TPU full solve on BASELINE config 3 (50 cams / 10k pts robust +
   outliers) matches the f64 CPU solve of this framework (same code, CPU
   backend in-process via JAX_PLATFORMS=axon,cpu).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    pytest.skip(
        "on-hardware tier: requires the real TPU "
        "(PYSFM_TEST_PLATFORM=axon,cpu)",
        allow_module_level=True,
    )

from pysfm_tpu.pipeline import synthetic
from pysfm_tpu.problem import problem as problem_mod
from pysfm_tpu.solver import LMConfig, solve
from pysfm_tpu.solver.kernels import pallas_proj
from pysfm_tpu.utils import metrics


def _f32_scene(*args, **kw):
    kw.setdefault("dtype", np.float32)
    return synthetic.make_scene(*args, **kw)


def test_pallas_equals_jax_compiled_on_tpu():
    """Compiled (not interpret-mode) Pallas kernel vs the jax projection
    path, on device, f32 — row layout and the component-major layout."""
    sc = _f32_scene(8, 500, noise_px=0.5, visibility=0.5,
                    robust="huber", robust_scale=2.0, seed=3)
    p = sc.problem
    a = jax.jit(problem_mod.residuals_and_jacobians)(p)
    b = jax.jit(pallas_proj.residuals_and_jacobians_pallas)(p)
    scale = float(jnp.max(jnp.abs(p.obs_uv))) + 1.0
    for x, y, name in zip(a, b, ("r", "J_cam", "J_pt", "w")):
        err = float(jnp.max(jnp.abs(x - y)))
        print(f"  pallas-vs-jax {name}: max abs err {err:.3e}")
        assert err < 1e-3 * scale, (name, err)

    rt, Jct, Jpt, wt = jax.jit(
        pallas_proj.residuals_and_jacobians_pallas_cm
    )(p)
    r, J_cam, J_pt, w = a
    M = r.shape[0]
    for x, y, name in zip(
        (rt, Jct, Jpt, wt),
        (r.T, J_cam.reshape(M, -1).T, J_pt.reshape(M, 6).T, w),
        ("r_cm", "J_cam_cm", "J_pt_cm", "w_cm"),
    ):
        err = float(jnp.max(jnp.abs(x - y)))
        print(f"  pallas-cm-vs-jax {name}: max abs err {err:.3e}")
        assert err < 1e-3 * scale, (name, err)


def test_two_view_f32_tpu_matches_f64_oracle():
    """BASELINE config 1: the f32 TPU solve lands on the oracle's optimum.

    Tolerance note: BASELINE's ±1e-6 parity bound is an f64 statement (the
    CPU suite asserts it at 1e-6 rel in tests/test_lm.py).  In f32 the cost
    itself only carries ~1e-7 relative resolution and the iterates take a
    different rounding path, so the achieved-optimum comparison is bounded
    at 1e-4 relative on final cost and 1e-3 px on final RMSE — both far
    below the 0.5 px noise floor the solve converges to.
    """
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from oracle_numpy import Oracle

    sc = _f32_scene(2, 100, noise_px=0.5, seed=1)
    p = sc.problem
    cfg = LMConfig(max_iters=40)
    solved, stats = solve(p, cfg)
    cost_tpu = float(np.asarray(stats.costs)[int(stats.n_iters)])
    rmse_tpu = float(metrics.reprojection_rmse(solved))

    oracle = Oracle(
        p.camera_model,
        np.asarray(p.R, np.float64), np.asarray(p.t, np.float64),
        np.asarray(p.intr, np.float64), np.asarray(p.X, np.float64),
        np.asarray(p.obs_cam), np.asarray(p.obs_pt),
        np.asarray(p.obs_uv, np.float64),
    )
    costs = oracle.optimize(max_iters=40)
    cost_ref = float(costs[-1])
    rel = abs(cost_tpu - cost_ref) / cost_ref
    print(f"  two-view final cost: tpu-f32 {cost_tpu:.8g} "
          f"oracle-f64 {cost_ref:.8g} rel {rel:.2e}; rmse {rmse_tpu:.6f} px")
    assert rel < 1e-4
    assert rmse_tpu < 0.6  # 0.5 px injected noise floor


def test_robust_ba_f32_tpu_matches_cpu():
    """BASELINE config 3 at f32 on TPU vs the identical f32 solve on the
    CPU backend (in-process, JAX_PLATFORMS=axon,cpu).

    This is the check that caught the round-1 TPU matmul-precision bug
    (bf16-accumulated matmuls): same code, same dtype, different backend —
    any divergence is a TPU-specific numeric issue (the f64 parity story
    is carried by the two-view oracle test above; this tier runs with x64
    off because f64/i64 in the Pallas kernels fail Mosaic legalization)."""
    import dataclasses

    cpu = jax.devices("cpu")[0]
    cfg = LMConfig(max_iters=30, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0)

    sc32 = _f32_scene(
        50, 10_000, noise_px=0.5, outlier_frac=0.05, outlier_px=40.0,
        visibility=0.3, robust="huber", robust_scale=2.0, seed=42,
    )
    solved32, st32 = solve(sc32.problem, cfg)
    cost32 = float(np.asarray(st32.costs)[-1])

    # jac_backend="jax" explicitly: "auto" keys off the PROCESS default
    # backend (tpu), but this solve runs on the cpu device where the
    # compiled Pallas kernel cannot lower.
    cfg_cpu = dataclasses.replace(cfg, jac_backend="jax")
    with jax.default_device(cpu):
        p_cpu = jax.device_put(sc32.problem, cpu)
        solved_cpu, st_cpu = solve(p_cpu, cfg_cpu)
    cost_cpu = float(np.asarray(st_cpu.costs)[-1])
    rel = abs(cost32 - cost_cpu) / cost_cpu
    acc32 = int(np.asarray(st32.accepted).sum())
    acc_cpu = int(np.asarray(st_cpu.accepted).sum())
    print(f"  robust-BA final cost: tpu-f32 {cost32:.8g} cpu-f32 "
          f"{cost_cpu:.8g} rel {rel:.2e} (accepted {acc32}/{acc_cpu})")
    assert rel < 5e-3


def test_grouped_kernels_compiled_on_tpu():
    """Compiled (not interpret-mode) grouped spmv kernel suite
    (K_A/K_B/K_C/K_D/K_E/K_H, solver/kernels/pallas_spmv.py) vs f64 NumPy
    references on a mid-size BAL problem, on device.

    The CPU suite (tests/test_spmv.py) checks these kernels in interpret
    mode only; this is the Mosaic-compilation evidence (VERDICT r3 weak #2
    — this repo has hit two silent axon-compiler miscompiles before)."""
    from pysfm_tpu.problem import cm
    from pysfm_tpu.solver import scale
    from pysfm_tpu.solver.kernels import pallas_spmv
    from pysfm_tpu.solver.lm import make_grouped_ops

    sc = synthetic.make_bal_scene(
        60, 20_000, mean_track=5.0, max_track=10, noise_px=0.5, seed=9,
        robust="huber", robust_scale=2.0, dtype=np.float32,
        with_truth=False, layout="cm",
    )
    p = sc.problem
    C, P, cp = p.n_cameras, p.n_points, p.cam_dof
    gops = make_grouped_ops(p)
    ctab = cm.cam_table(p)

    # K_E fused build vs the XLA scale build (both compiled on TPU).
    eqs_k, b_rows = pallas_spmv.build_eqs_grouped(
        gops, ctab, p.X3, p.robust_scale,
        cp=cp, model=p.camera_model, robust=p.robust,
        n_cameras=C, n_points=P,
    )
    eqs = scale.build_normal_equations_scale_cm(p, 1 << 17)
    for name, a, b in (
        ("Hcc", eqs_k.Hcc, eqs.Hcc), ("g_c", eqs_k.g_c, eqs.g_c),
        ("hpp6", eqs_k.hpp6, eqs.hpp6), ("g_p", eqs_k.g_p, eqs.g_p),
    ):
        a = np.asarray(a)
        b = np.asarray(b)
        scale_ref = np.max(np.abs(b)) + 1.0
        err = np.max(np.abs(a - b)) / scale_ref
        print(f"  K_E {name}: rel err {err:.3e}")
        assert err < 1e-4, (name, err)

    # K_D standalone payload == K_E's b_rows (and both == permuted B_cm).
    b_kd = pallas_spmv.payload_b_grouped(
        gops, ctab, p.X3, p.robust_scale,
        cp=cp, model=p.camera_model, robust=p.robust,
    )
    b_ref = pallas_spmv.permute_b_rows(eqs.B_cm, gops.order)
    sc_b = float(jnp.max(jnp.abs(b_ref))) + 1.0
    err_kd = float(jnp.max(jnp.abs(b_kd - b_ref))) / sc_b
    err_ke = float(jnp.max(jnp.abs(b_rows - b_ref))) / sc_b
    print(f"  K_D b_rows rel err {err_kd:.3e}; K_E b_rows {err_ke:.3e}")
    assert err_kd < 1e-5 and err_ke < 1e-5

    # K_A / K_B matvecs vs f64 NumPy references from B_cm.
    gops_it = gops.replace(b_rows=b_rows)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((cp, C)).astype(np.float32)
    w3 = rng.standard_normal((3, P)).astype(np.float32)
    B = np.asarray(eqs.B_cm, np.float64)
    oc = np.asarray(p.obs_cam)
    op = np.asarray(p.obs_pt)
    u_ref = np.zeros((3, P))
    xg = x.astype(np.float64)[:, oc]
    for s in range(3):
        q = np.einsum("dm,dm->m", B[s * cp:(s + 1) * cp], xg)
        np.add.at(u_ref[s], op, q)
    u_k = np.asarray(
        pallas_spmv.hcpT_x_grouped(gops_it, jnp.asarray(x), cp=cp)
    )[:, :P]
    err_ka = np.max(np.abs(u_k - u_ref)) / (np.max(np.abs(u_ref)) + 1.0)
    y_ref = np.zeros((cp, C))
    wg = w3.astype(np.float64)[:, op]
    for d in range(cp):
        z = sum(B[s * cp + d] * wg[s] for s in range(3))
        np.add.at(y_ref[d], oc, z)
    y_k = np.asarray(
        pallas_spmv.hcp_w_grouped(gops_it, jnp.asarray(w3), C, cp=cp)
    )
    err_kb = np.max(np.abs(y_k - y_ref)) / (np.max(np.abs(y_ref)) + 1.0)
    print(f"  K_A rel err {err_ka:.3e}; K_B rel err {err_kb:.3e}")
    assert err_ka < 1e-4 and err_kb < 1e-4

    # K_A2 / K_B2 two-phase superstep schedule, compiled on device.
    u_k2 = np.asarray(
        pallas_spmv.hcpT_x_grouped2(gops_it, jnp.asarray(x), cp=cp)
    )[:, :P]
    err_ka2 = np.max(np.abs(u_k2 - u_ref)) / (np.max(np.abs(u_ref)) + 1.0)
    y_k2 = np.asarray(
        pallas_spmv.hcp_w_grouped2(gops_it, jnp.asarray(w3), C, cp=cp)
    )
    err_kb2 = np.max(np.abs(y_k2 - y_ref)) / (np.max(np.abs(y_ref)) + 1.0)
    print(f"  K_A2 rel err {err_ka2:.3e}; K_B2 rel err {err_kb2:.3e}")
    assert err_ka2 < 1e-4 and err_kb2 < 1e-4

    # K_H preconditioner diagonal vs NumPy (through hinv6).
    lam = jnp.asarray(1e-3, jnp.float32)
    hinv6 = scale.sym6_inv(scale.augment6(eqs.hpp6, lam))
    D_k = np.asarray(pallas_spmv.precond_diag_grouped(
        gops_it, hinv6, C, cp=cp
    ))
    hv = np.asarray(hinv6, np.float64)[:, op]
    a_, b_, c_, d_, e_, f_ = hv
    B4 = B.reshape(3, cp, -1)
    B0, B1, B2 = B4[0], B4[1], B4[2]
    BH0 = a_ * B0 + b_ * B1 + d_ * B2
    BH1 = b_ * B0 + c_ * B1 + e_ * B2
    BH2 = d_ * B0 + e_ * B1 + f_ * B2
    D_m = (
        np.einsum("dm,em->mde", BH0, B0)
        + np.einsum("dm,em->mde", BH1, B1)
        + np.einsum("dm,em->mde", BH2, B2)
    )
    D_ref = np.zeros((C, cp, cp))
    np.add.at(D_ref, oc, D_m)
    err_kh = np.max(np.abs(D_k - D_ref)) / (np.max(np.abs(D_ref)) + 1.0)
    print(f"  K_H rel err {err_kh:.3e}")
    assert err_kh < 1e-4

    # K_C cost vs the obs-chunked XLA cost.
    c_k = float(pallas_spmv.cost_grouped(
        gops, ctab, p.X3, p.robust_scale,
        model=p.camera_model, robust=p.robust,
    ))
    c_ref = float(scale.cost_scale_cm(p, 1 << 17))
    rel = abs(c_k - c_ref) / c_ref
    print(f"  K_C cost: kernel {c_k:.8g} xla {c_ref:.8g} rel {rel:.2e}")
    assert rel < 1e-4


def test_sharded_cm_kernels_mesh1_on_tpu():
    """The distributed CM/grouped path (dist/sharded_cm.py) compiled on the
    real chip with a 1-device mesh: the shard_map plumbing (psum, stripped
    shard axes, padded grouped stream) produces the single-chip result."""
    from pysfm_tpu import dist
    from pysfm_tpu.solver.lm import make_grouped_ops

    sc = synthetic.make_bal_scene(
        20, 5_000, mean_track=4.0, max_track=8, noise_px=0.5, seed=4,
        dtype=np.float32, with_truth=False, layout="cm",
    )
    cmp = sc.problem
    cfg = LMConfig(
        max_iters=5, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
        solver="pcg", cg_iters=20, cg_tol=1e-6,
    )
    gops = make_grouped_ops(cmp)
    _, st_ref = solve(cmp, cfg, gops=gops)
    mesh = dist.make_mesh(1)
    scm, sgops = dist.shard_cm_problem(cmp, 1)
    scm, sgops = dist.device_put_sharded_cm(scm, sgops, mesh)
    _, st = dist.solve_sharded_cm(scm, sgops, mesh, cfg)
    c_ref = np.asarray(st_ref.costs)
    c_sh = np.asarray(st.costs)
    rel = float(np.max(np.abs(c_sh - c_ref) / c_ref))
    print(f"  sharded(mesh=1) vs single costs rel {rel:.2e}")
    assert rel < 1e-3

    # Camera-axis partition on the real chip (mesh=1: the psum_scatter /
    # all_gather collectives compile and reduce to identity routing).
    _, st_cam = dist.solve_sharded_cm(scm, sgops, mesh, cfg, cam_axis=True)
    c_cam = np.asarray(st_cam.costs)
    rel_cam = float(np.max(np.abs(c_cam - c_ref) / c_ref))
    print(f"  cam-axis sharded(mesh=1) vs single costs rel {rel_cam:.2e}")
    assert rel_cam < 1e-3


def test_pcg_path_f32_tpu_matches_dense():
    """The BAL-scale PCG path on hardware agrees with the dense-W path on
    the same mid-size problem (both f32, on device)."""
    sc = _f32_scene(30, 3_000, noise_px=0.5, visibility=0.3,
                    robust="huber", robust_scale=2.0, seed=7)
    cfg_d = LMConfig(max_iters=15, tol_grad=0.0, tol_cost_rel=0.0,
                     tol_step=0.0)
    cfg_p = LMConfig(max_iters=15, tol_grad=0.0, tol_cost_rel=0.0,
                     tol_step=0.0, solver="pcg", cg_iters=100, cg_tol=1e-6)
    _, st_d = solve(sc.problem, cfg_d)
    _, st_p = solve(sc.problem, cfg_p)
    cd = float(np.asarray(st_d.costs)[-1])
    cp = float(np.asarray(st_p.costs)[-1])
    rel = abs(cd - cp) / cd
    print(f"  pcg-vs-dense final cost: dense {cd:.8g} pcg {cp:.8g} "
          f"rel {rel:.2e}")
    assert rel < 5e-3
