"""Per-kernel roofline accounting (SURVEY §5 "Tracing / profiling",
BASELINE north-star: "Jacobian build memory-bound, Schur dense-block matmuls
compute-bound, held to speed-of-light roofline").

For each hot stage of the LM iteration this times the jitted stage in
isolation (block_until_ready walls), counts the bytes it must move and the
FLOPs it must execute from the problem shapes, and reports achieved
GB/s / GFLOP/s against the device peak.

Run:  python bench/roofline.py [--cams 50] [--points 10000] [--vis 0.3]
      python bench/roofline.py --bal --cams 856 --points 250000
        (BAL/grouped-kernel stages K_A/K_B/K_C/K_E/K_H at scale)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


# (peak_f32_gflops, peak_bf16_gflops, hbm_gbps) by device-kind substring.
DEVICE_PEAKS = {
    "v5 lite": (98_000 / 2, 197_000, 819),    # v5e: 197 Tf/s bf16
    "v5e": (98_000 / 2, 197_000, 819),
    "v5p": (229_000, 459_000, 2765),
    "v4": (137_000, 275_000, 1228),
    "v6": (459_000, 918_000, 1640),           # trillium
    "cpu": (500, 500, 50),                    # rough host numbers
}


def device_peaks(dev) -> tuple:
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, peaks in DEVICE_PEAKS.items():
        if key in kind:
            return peaks
    return DEVICE_PEAKS["cpu"]


def timeit(fn, *args, n=20, **kw):
    # Device->host fence, not block_until_ready (unreliable through the
    # tunneled axon TPU runtime — see pysfm_tpu/utils/timing.py).
    from pysfm_tpu.utils.timing import timeit as _timeit

    return _timeit(fn, *args, n=n, **kw)


def main():
    import jax
    import jax.numpy as jnp

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.problem import problem as problem_mod
    from pysfm_tpu.solver import pcg, schur
    from pysfm_tpu.solver.kernels import pallas_proj

    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=50)
    ap.add_argument("--points", type=int, default=10_000)
    ap.add_argument("--vis", type=float, default=0.3)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--bal", action="store_true",
                    help="profile the BAL-scale grouped-kernel stages")
    ap.add_argument("--mean-track", type=float, default=5.0)
    ap.add_argument("--max-track", type=int, default=12)
    args = ap.parse_args()

    dev = jax.devices()[0]
    peak_f32, peak_bf16, peak_bw = device_peaks(dev)
    on_tpu = jax.default_backend() == "tpu"

    if args.bal:
        bal_roofline(args, dev, peak_f32, peak_bw)
        return

    sc = synthetic.make_scene(
        args.cams, args.points, noise_px=0.5, visibility=args.vis,
        robust="huber", robust_scale=2.0, seed=42, dtype=np.float32,
    )
    p = sc.problem
    C, P, M = p.n_cameras, p.n_points, p.n_obs
    CP = p.cam_dof
    K = p.pt_obs.shape[1]
    f4 = 4  # f32 bytes
    print(f"# device={dev.device_kind} C={C} P={P} M={M} CP={CP} K={K}")
    print(f"# peaks: f32 {peak_f32/1e3:.0f} Tf/s, hbm {peak_bw} GB/s")
    rows = []

    def report(name, dt, flops, bytes_moved):
        gf = flops / dt / 1e9
        gb = bytes_moved / dt / 1e9
        frac_c = gf / peak_f32
        frac_m = gb / peak_bw
        bound = "compute" if frac_c > frac_m else "memory"
        frac = max(frac_c, frac_m)
        rows.append({
            "stage": name, "ms": round(dt * 1e3, 4),
            "gflops": round(gf, 1), "gbps": round(gb, 1),
            "bound": bound, "roofline_frac": round(frac, 3),
        })
        print(f"{name:28s} {dt*1e3:8.3f} ms  {gf:9.1f} GF/s  {gb:8.1f} GB/s"
              f"  {bound:7s}-bound  {100*frac:5.1f}% of roof")

    # --- Stage 1: residual + Jacobian + robust weight build ---------------
    # Traffic: read gathered operands (R 9, t 3, intr I, X 3, uv 2, w 1 per
    # obs) + write (r 2, J_cam 2CP, J_pt 6, w 1).  FLOPs ~ 150/obs (pose
    # chain, dominated by the 3 matvecs + robust weight).
    in_f = 9 + 3 + p.intr.shape[1] + 3 + 2 + 1
    out_f = 2 + 2 * CP + 6 + 1
    bytes_jac = M * (in_f + out_f) * f4
    flops_jac = M * 150

    jac_jax = jax.jit(problem_mod.residuals_and_jacobians)
    report("jac_build/jax", timeit(jac_jax, p, n=args.reps),
           flops_jac, bytes_jac)
    if on_tpu:
        jac_pl = jax.jit(pallas_proj.residuals_and_jacobians_pallas)
        report("jac_build/pallas", timeit(jac_pl, p, n=args.reps),
               flops_jac, bytes_jac)
        # equality check compiled-vs-jax on hardware
        a = jac_jax(p)
        b = jac_pl(p)
        uv_scale = float(jnp.max(jnp.abs(p.obs_uv))) + 1.0
        err = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(a, b))
        assert err < 1e-3 * uv_scale, f"pallas/jax mismatch {err}"
        print(f"#   pallas == jax on TPU (max abs err {err:.2e})")

    r, J_cam, J_pt, w = jac_jax(p)
    lam = jnp.asarray(1e-4, jnp.float32)

    # --- Stage 2: normal equations ----------------------------------------
    # Traffic: read J (2CP + 6 + 2 + 1 per obs) and the gathered tables,
    # write Hcc/Hpp/g + per-obs B blocks.  FLOPs: Hcc one-hot matmul
    # M*C*(CP^2+CP) + point-side gathers P*K*(9*2*... ) ~ M*(CP^2*2 + 18).
    build = jax.jit(lambda r, Jc, Jp, w: schur.build_normal_equations(
        r, Jc, Jp, w, p.obs_cam, p.obs_pt, C, P,
        pt_obs=p.pt_obs, pt_obs_mask=p.pt_obs_mask))
    flops_ne = M * C * (CP * CP + CP) * 2 + M * (2 * CP * CP + 2 * CP * 3 + 30)
    bytes_ne = (M * (2 * CP + 6 + 3 + CP * 3) + C * CP * CP + P * 9) * f4
    report("normal_eqs", timeit(build, r, J_cam, J_pt, w, n=args.reps),
           flops_ne, bytes_ne)
    eqs = build(r, J_cam, J_pt, w)

    # --- Stage 3: dense-W Schur reduce + Cholesky solve --------------------
    step_dense = jax.jit(lambda eqs, lam: schur.solve_step_dense(
        eqs, lam, p.obs_cam, p.obs_pt,
        pt_obs=p.pt_obs, pt_obs_mask=p.pt_obs_mask))
    A = C * CP
    flops_schur = (
        P * K * C * CP * 3 * 2        # W assembly one-hot matmul
        + P * A * 9 * 2               # Y = W Hppinv
        + P * 3 * A * A * 2           # S = Y W^T
        + A ** 3 / 3                  # Cholesky
    )
    bytes_schur = (2 * P * A * 3 + A * A + P * 9) * f4 * 2
    report("schur_dense+chol", timeit(step_dense, eqs, lam, n=args.reps),
           flops_schur, bytes_schur)

    # --- Stage 4: PCG matvec ------------------------------------------------
    sysm = jax.jit(lambda eqs, lam: pcg.build_pcg_system(
        eqs, lam, p.obs_cam, p.obs_pt,
        pt_obsT=p.pt_obs.T, pt_obs_maskT=p.pt_obs_mask.T,
        cam_obs=p.cam_obs, cam_obs_mask=p.cam_obs_mask))(eqs, lam)
    x = jnp.ones((CP, C), jnp.float32)
    mv = jax.jit(lambda s, x: pcg.schur_matvec(s, x))
    flops_mv = M * (CP * 3 * 2 * 2) + P * 9 * 2 + C * CP * CP * 2
    bytes_mv = (2 * M * CP * 3 + P * 9 + M * (3 + CP)) * f4
    report("pcg_matvec", timeit(mv, sysm, x, n=args.reps),
           flops_mv, bytes_mv)

    # --- Stage 5: BAL-scale build + system (component-major, obs-chunked) --
    from pysfm_tpu.solver import scale as scale_mod

    K = p.pt_obs.shape[1]
    Kc = p.cam_obs.shape[1]
    chunk = min(1 << 17, M)
    build_s = jax.jit(
        lambda p: scale_mod.build_normal_equations_scale(p, chunk)
    )
    # Traffic: payload write [3CP+Rc+9, M]; reductions read the rows once
    # more through the tables.  FLOPs ~ jac (150/obs) + block products.
    rc = CP * (CP + 3) // 2
    rows_w = 3 * CP + rc + 9
    bytes_sb = (M * rows_w * 2 + C * Kc * rc + P * K * 9) * f4
    flops_sb = M * (150 + 2 * (3 * CP + rc + 9))
    report("scale_build", timeit(build_s, p, n=args.reps),
           flops_sb, bytes_sb)
    eqs_s = build_s(p)

    sys_b = jax.jit(lambda e, lam: pcg.build_pcg_system(
        e, lam, p.obs_cam, p.obs_pt,
        pt_obsT=p.pt_obs.T, pt_obs_maskT=p.pt_obs_mask.T,
        cam_obs=p.cam_obs, cam_obs_mask=p.cam_obs_mask))
    # Gathers Bp/Bg (2 x 3CP*M), block-jacobi D (C*Kc*(3CP+CP^2)), inverses.
    bytes_ps = (M * 3 * CP * 4 + C * Kc * (3 * CP + 3) + C * CP * CP * 3) * f4
    flops_ps = C * Kc * (CP * 9 + CP * CP * 3) * 2 + C * CP ** 3
    report("pcg_system_build", timeit(sys_b, eqs_s, lam, n=args.reps),
           flops_ps, bytes_ps)

    print(json.dumps({"roofline": rows, "device": str(dev)}))


def bal_roofline(args, dev, peak_f32, peak_bw):
    """Grouped-kernel (K_A/K_B/K_C/K_E/K_H) roofline at BAL scale.

    Bytes accounting is HBM traffic each kernel cannot avoid: the grouped
    stream tables and per-observation coupling rows are streamed once per
    call; per-block chunk/output windows are counted once per block (NB x
    window — an overcount when consecutive blocks share a (group, chunk)
    cell and the window stays VMEM-resident, so achieved GB/s is a lower
    bound).  FLOP counts are rough (these stages are all memory-bound by
    design; the MXU one-hot contractions in K_B/K_E/K_H execute far more
    multiplies than the algorithmic minimum, which is the price of
    avoiding scatters)."""
    import jax
    import jax.numpy as jnp

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.problem import cm as cm_mod
    from pysfm_tpu.problem.grouped import BLK, CGRP, PCH
    from pysfm_tpu.solver import pcg, scale as scale_mod
    from pysfm_tpu.solver.kernels import pallas_spmv
    from pysfm_tpu.solver.lm import make_grouped_ops

    f4 = 4
    sc = synthetic.make_bal_scene(
        args.cams, args.points, mean_track=args.mean_track,
        max_track=args.max_track, noise_px=0.5, robust="huber",
        robust_scale=2.0, seed=4, dtype=np.float32, with_truth=False,
        layout="cm",
    )
    p = sc.problem
    C, P, M = p.n_cameras, p.n_points, p.n_obs
    cp = p.cam_dof
    gops = make_grouped_ops(p)
    NB = gops.n_blocks
    G, NCH = gops.n_groups, gops.n_chunks
    M_B = NB * BLK
    NSL = PCH // CGRP
    rc = cp * (cp + 1) // 2 + cp
    print(f"# device={dev.device_kind} C={C} P={P} M={M} cp={cp} "
          f"NB={NB} M_B={M_B} G={G} NCH={NCH} "
          f"(stream fill {M / M_B:.2f})")
    print(f"# peaks: f32 {peak_f32/1e3:.0f} Tf/s, hbm {peak_bw} GB/s")
    rows = []

    def report(name, dt, flops, bytes_moved):
        gf = flops / dt / 1e9
        gb = bytes_moved / dt / 1e9
        frac_c = gf / peak_f32
        frac_m = gb / peak_bw
        bound = "compute" if frac_c > frac_m else "memory"
        frac = max(frac_c, frac_m)
        rows.append({
            "stage": name, "ms": round(dt * 1e3, 4),
            "gflops": round(gf, 1), "gbps": round(gb, 1),
            "bound": bound, "roofline_frac": round(frac, 4),
        })
        print(f"{name:28s} {dt*1e3:8.3f} ms  {gf:9.1f} GF/s  {gb:8.1f} GB/s"
              f"  {bound:7s}-bound  {100*frac:5.1f}% of roof")

    ctab = jax.jit(cm_mod.cam_table)(p)
    lam = jnp.asarray(1e-4, jnp.float32)

    # K_E fused NE build: stream tables in, b_rows + reduced outputs out.
    ke = jax.jit(lambda g, ct, x3: pallas_spmv.build_eqs_grouped(
        g, ct, x3, p.robust_scale, cp=cp, model=p.camera_model,
        robust=p.robust, n_cameras=C, n_points=P))
    bytes_ke = (
        M_B * (2 + 3 + 1) * f4            # lcam/lpt + gu/gv/gv + seg_start
        + NB * NSL * CGRP * f4            # seg_end_pos
        + NB * 3 * PCH * f4               # x3 chunk windows
        + 3 * cp * M_B * f4               # b_rows write
        + G * CGRP * rc * f4              # camera-side out
        + G * 9 * NCH * PCH * f4 * 2      # point-side out (+XLA mask-sum)
    )
    flops_ke = M_B * (150 + 2 * (3 * cp + rc + 9)) + NB * SUBD_FLOPS(cp)
    dt, out = _timeit2(ke, gops, ctab, p.X3)
    eqs_k, b_rows = out
    report("K_E fused_build", dt, flops_ke, bytes_ke)
    gops = gops.replace(b_rows=b_rows)

    # K_A matvec: b_rows stream + seg tables in, partial windows out.
    ka = jax.jit(lambda g, x: pallas_spmv.hcpT_x_grouped(g, x, cp=cp))
    x0 = jnp.ones((cp, C), jnp.float32)
    bytes_ka = (
        3 * cp * M_B * f4                 # b_rows
        + M_B * 2 * f4                    # lcam + seg_start
        + NB * NSL * CGRP * f4            # seg_end_pos
        + G * 3 * NCH * PCH * f4 * 3      # partials write + XLA mask-sum r/w
    )
    flops_ka = M_B * (3 * 2 * cp + 3 * 7 * 4) + G * 3 * NCH * PCH
    dt, _ = _timeit2(ka, gops, x0)
    report("K_A hcpT_x", dt, flops_ka, bytes_ka)

    # K_B matvec: b_rows stream + chunk windows in, [C, cp] out.
    kb = jax.jit(lambda g, w: pallas_spmv.hcp_w_grouped(g, w, C, cp=cp))
    w3 = jnp.ones((3, P), jnp.float32)
    bytes_kb = (
        3 * cp * M_B * f4
        + M_B * 2 * f4                    # lcam + lpt
        + NB * 3 * PCH * f4               # w chunk windows
        + G * CGRP * cp * f4
    )
    # One-hot MXU: SUB x [128, 128] @ [128, cp+...] per block.
    flops_kb = NB * (BLK // CGRP) * CGRP * CGRP * 3 * 2 + M_B * 3 * cp * 2
    dt, _ = _timeit2(kb, gops, w3)
    report("K_B hcp_w", dt, flops_kb, bytes_kb)

    # K_H preconditioner diagonal.
    hinv6 = scale_mod.sym6_inv(scale_mod.augment6(eqs_k.hpp6, lam))
    kh = jax.jit(lambda g, h: pallas_spmv.precond_diag_grouped(
        g, h, C, cp=cp))
    bytes_kh = (
        3 * cp * M_B * f4
        + M_B * 2 * f4
        + NB * 6 * PCH * f4
        + G * CGRP * (cp * (cp + 1) // 2) * f4
    )
    flops_kh = NB * (BLK // CGRP) * CGRP * CGRP * 45 * 2
    dt, _ = _timeit2(kh, gops, hinv6)
    report("K_H precond_diag", dt, flops_kh, bytes_kh)

    # K_C grouped cost.
    kc = jax.jit(lambda g, ct, x3: pallas_spmv.cost_grouped(
        g, ct, x3, p.robust_scale, model=p.camera_model, robust=p.robust))
    bytes_kc = (M_B * (2 + 3) * f4 + NB * 3 * PCH * f4)
    flops_kc = M_B * 60
    dt, _ = _timeit2(kc, gops, ctab, p.X3)
    report("K_C cost", dt, flops_kc, bytes_kc)

    # Whole CG iteration (K_A + hinv-mv + K_B + axpys) for context.
    sys_k = jax.jit(lambda e, l, g: pcg.build_pcg_system(
        e, l, p.obs_cam, p.obs_pt,
        pt_obsT=p.pt_obsT, pt_obs_maskT=p.pt_obs_maskT,
        cam_obs=p.cam_obs, cam_obs_mask=p.cam_obs_mask, gops=g,
    ))(eqs_k, lam, gops)
    mv = jax.jit(lambda s, x: pcg.schur_matvec(s, x))
    bytes_mv = bytes_ka + bytes_kb + P * (6 + 3 + 3) * f4
    dt, _ = _timeit2(mv, sys_k, x0)
    report("schur_matvec (K_A+K_B)", dt, flops_ka + flops_kb, bytes_mv)

    print(json.dumps({
        "roofline_bal": rows, "device": str(dev),
        "cams": C, "points": P, "observations": M,
        "grouped_blocks": NB, "stream_fill": round(M / M_B, 3),
        "note": "bytes are unavoidable-traffic lower bounds; "
                "achieved GB/s is a lower bound on true bandwidth",
    }))


def SUBD_FLOPS(cp):
    """Per-block segmented-scan + one-hot flop estimate for K_E."""
    from pysfm_tpu.problem.grouped import BLK, CGRP
    return (BLK // CGRP) * CGRP * CGRP * (21 + cp * (cp + 1) // 2 + cp) * 2


def _timeit2(fn, *a, n=10, **kw):
    from pysfm_tpu.utils.timing import sync
    import time as _t

    out = fn(*a, **kw)
    sync(out)
    t0 = _t.perf_counter()
    for _ in range(n):
        out = fn(*a, **kw)
    sync(out)
    return (_t.perf_counter() - t0) / n, out


if __name__ == "__main__":
    main()
