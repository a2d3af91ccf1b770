"""Per-stage timing of the BAL-scale PCG path on the real chip.

Times each stage of one LM iteration at a configurable scale so the
slow stage at Venice scale (VENICE_r02.json: 5.68 s/iter) can be
identified and attacked.  Not part of the driver contract; a working
tool kept in-tree so round N+1 can re-run it.

Run:  python bench/profile_scale.py [--cams 856] [--points 250000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"


def timeit(fn, *args, n=3, **kw):
    # utils.timing.sync, not block_until_ready: the latter is not a real
    # completion fence through the tunneled axon runtime.
    from pysfm_tpu.utils.timing import sync

    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.solver import pcg, scale

    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=856)
    ap.add_argument("--points", type=int, default=250_000)
    ap.add_argument("--mean-track", type=float, default=5.0)
    ap.add_argument("--max-track", type=int, default=12)
    ap.add_argument("--obs-chunk", type=int, default=1 << 19)
    ap.add_argument("--cg-iters", type=int, default=50)
    ap.add_argument("--kernels", action="store_true",
                    help="also profile the grouped Pallas kernel path")
    args = ap.parse_args()

    t0 = time.perf_counter()
    sc = synthetic.make_bal_scene(
        args.cams, args.points, mean_track=args.mean_track,
        max_track=args.max_track, noise_px=0.5, robust="huber",
        robust_scale=2.0, seed=4, dtype=np.float32, with_truth=False,
        layout="cm",
    )
    p = sc.problem
    print(f"# scene C={p.n_cameras} P={p.n_points} M={p.n_obs} "
          f"K={p.pt_obsT.shape[0]} Kc={p.cam_obs.shape[1]} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    lam = jnp.asarray(1e-4, p.dtype)

    ms, _ = timeit(scale.cost_scale_cm, p, args.obs_chunk)
    print(f"cost_scale            {ms:9.2f} ms")

    ms, eqs = timeit(
        scale.build_normal_equations_scale_cm, p, args.obs_chunk
    )
    print(f"build_NE_scale        {ms:9.2f} ms")

    build_sys = jax.jit(
        lambda e, l: pcg.build_pcg_system(
            e, l, p.obs_cam, p.obs_pt,
            pt_obsT=p.pt_obsT, pt_obs_maskT=p.pt_obs_maskT,
            cam_obs=p.cam_obs, cam_obs_mask=p.cam_obs_mask,
        )
    )
    ms, sys_ = timeit(build_sys, eqs, lam)
    print(f"build_pcg_system      {ms:9.2f} ms")

    mv = jax.jit(lambda s, x: pcg.schur_matvec(s, x))
    x0 = jnp.ones_like(sys_.rhs)
    ms, _ = timeit(mv, sys_, x0)
    print(f"schur_matvec (x1)     {ms:9.2f} ms")

    cg = jax.jit(
        lambda s: pcg.pcg_solve(s, tol=0.0, max_iters=args.cg_iters)
    )
    ms, _ = timeit(cg, sys_)
    print(f"pcg_solve (x{args.cg_iters})      {ms:9.2f} ms")

    bs = jax.jit(pcg.back_substitute)
    dc = jnp.zeros_like(sys_.rhs)
    ms, _ = timeit(bs, sys_, dc)
    print(f"back_substitute       {ms:9.2f} ms")

    if args.kernels:
        from pysfm_tpu.problem import cm as cm_mod
        from pysfm_tpu.solver.kernels import pallas_spmv
        from pysfm_tpu.solver.lm import make_grouped_ops

        t0 = time.perf_counter()
        gops = make_grouped_ops(p)
        print(f"# grouped layout NB={gops.n_blocks} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)

        kd = jax.jit(
            lambda g, ct, x3: pallas_spmv.payload_b_grouped(
                g, ct, x3, p.robust_scale, cp=p.cam_dof,
                model=p.camera_model, robust=p.robust,
            )
        )
        ctab = jax.jit(cm_mod.cam_table)(p)
        ms, b_rows = timeit(kd, gops, ctab, p.X3)
        print(f"K_D payload_b         {ms:9.2f} ms")
        gops = gops.replace(b_rows=b_rows)

        ke = jax.jit(
            lambda g, ct, x3: pallas_spmv.build_eqs_grouped(
                g, ct, x3, p.robust_scale, cp=p.cam_dof,
                model=p.camera_model, robust=p.robust,
                n_cameras=p.n_cameras, n_points=p.n_points,
            )
        )
        ms, (eqs_k, b_rows) = timeit(ke, gops, ctab, p.X3)
        print(f"K_E fused NE build    {ms:9.2f} ms")

        kh = jax.jit(
            lambda g, h: pallas_spmv.precond_diag_grouped(
                g, h, p.n_cameras, cp=p.cam_dof
            )
        )
        from pysfm_tpu.solver import scale as scale_m
        hinv6 = scale_m.sym6_inv(scale_m.augment6(eqs_k.hpp6, lam))
        ms, _ = timeit(kh, gops, hinv6)
        print(f"K_H precond diag      {ms:9.2f} ms")

        cp = p.cam_dof
        xk = jnp.ones((cp, p.n_cameras), p.dtype)
        ka = jax.jit(
            lambda g, x: pallas_spmv.hcpT_x_grouped(g, x, cp=cp)
        )
        ms, _ = timeit(ka, gops, xk)
        print(f"K_A hcpT_x            {ms:9.2f} ms")

        w3 = jnp.ones((3, p.n_points), p.dtype)
        kb = jax.jit(
            lambda g, w: pallas_spmv.hcp_w_grouped(
                g, w, p.n_cameras, cp=cp
            )
        )
        ms, _ = timeit(kb, gops, w3)
        print(f"K_B hcp_w             {ms:9.2f} ms")

        build_sys_k = jax.jit(
            lambda e, l, g: pcg.build_pcg_system(
                e, l, p.obs_cam, p.obs_pt,
                pt_obsT=p.pt_obsT, pt_obs_maskT=p.pt_obs_maskT,
                cam_obs=p.cam_obs, cam_obs_mask=p.cam_obs_mask, gops=g,
            )
        )
        ms, sys_k = timeit(build_sys_k, eqs, lam, gops)
        print(f"build_pcg_system (K)  {ms:9.2f} ms")

        mv_k = jax.jit(lambda s, x: pcg.schur_matvec(s, x))
        ms, _ = timeit(mv_k, sys_k, x0)
        print(f"schur_matvec (K, x1)  {ms:9.2f} ms")

        cg_k = jax.jit(
            lambda s: pcg.pcg_solve(s, tol=0.0, max_iters=args.cg_iters)
        )
        ms, _ = timeit(cg_k, sys_k)
        print(f"pcg_solve (K, x{args.cg_iters})   {ms:9.2f} ms")

    # Full LM iteration for cross-check.
    from pysfm_tpu.solver import LMConfig
    from pysfm_tpu.solver.lm import solve

    cfg = LMConfig(
        max_iters=3, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
        solver="pcg", cg_iters=args.cg_iters, cg_tol=1e-4,
        obs_chunk=args.obs_chunk,
    )
    from pysfm_tpu.utils.timing import sync

    g_full = gops if args.kernels else None
    out = solve(p, cfg, gops=g_full)
    sync(out[0].X3)
    t0 = time.perf_counter()
    out = solve(p, cfg, gops=g_full)
    sync(out[0].X3)
    ms = (time.perf_counter() - t0) / 3 * 1e3
    print(f"full LM iter          {ms:9.2f} ms")


if __name__ == "__main__":
    main()
