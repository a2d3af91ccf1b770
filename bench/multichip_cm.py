"""Distributed flagship overhead artifact (MULTICHIP_r04).

Only ONE real chip is reachable (axon tunnel), so 8-way wall-clock scaling
cannot be measured; what CAN be measured honestly on hardware is the cost
of the distribution machinery itself: the same quarter-Venice problem
solved (a) by the single-chip CM/grouped-kernel path and (b) by the
DISTRIBUTED path (dist/sharded_cm.py: shard_map + per-shard grouped
stream + psum plumbing) on a 1-device mesh.  Their ratio is the
distribution overhead at shard-count 1 — the shard_map/psum machinery,
the padded per-shard stream, the replicated-camera bookkeeping.

8-way correctness is covered by tests/test_sharded_cm.py on the virtual
CPU mesh (sharded == single to f64 tightness); the ICI traffic model for
N-way is reported here from the problem shapes (camera-sized psums only:
[CP, C] per CG iteration + Hcc/D/g_c per LM iteration).

Run:  python bench/multichip_cm.py [--cams 856] [--points 250000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"


def main():
    import jax

    from pysfm_tpu import dist
    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.solver import LMConfig
    from pysfm_tpu.solver.lm import make_grouped_ops, solve
    from pysfm_tpu.utils.timing import sync

    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=856)
    ap.add_argument("--points", type=int, default=250_000)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cg-iters", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    dev = jax.devices()[0]
    cmp = synthetic.make_bal_scene(
        args.cams, args.points, mean_track=5.0, max_track=12, noise_px=0.5,
        seed=4, dtype=np.float32, with_truth=False, layout="cm",
    ).problem
    cfg = LMConfig(
        max_iters=args.iters, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
        solver="pcg", cg_iters=args.cg_iters, cg_tol=1e-2,
    )

    def best_of(fn):
        fn()  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    gops = make_grouped_ops(cmp)
    p_s = [None]

    def single():
        p, st = solve(cmp, cfg, gops=gops)
        p_s[0] = (p, st)
        return p.X3

    t_single = best_of(single)
    c_single = np.asarray(p_s[0][1].costs, np.float64)

    mesh = dist.make_mesh(1)
    scm, sgops = dist.shard_cm_problem(cmp, 1)
    scm, sgops = dist.device_put_sharded_cm(scm, sgops, mesh)
    o_s = [None]

    def sharded():
        out, st = dist.solve_sharded_cm(scm, sgops, mesh, cfg)
        o_s[0] = (out, st)
        return out.X3

    t_shard = best_of(sharded)
    c_shard = np.asarray(o_s[0][1].costs, np.float64)
    cost_rel = float(np.max(np.abs(c_shard - c_single) / c_single))

    def sharded_cam():
        out, st = dist.solve_sharded_cm(
            scm, sgops, mesh, cfg, cam_axis=True
        )
        o_s[0] = (out, st)
        return out.X3

    t_cam = best_of(sharded_cam)
    c_cam = np.asarray(o_s[0][1].costs, np.float64)
    cost_rel_cam = float(np.max(np.abs(c_cam - c_single) / c_single))

    C, cp = cmp.n_cameras, cmp.cam_dof
    psum_cg_mb = C * cp * 4 / 1e6
    psum_lm_mb = (C * cp * cp * 2 + C * cp * 2) * 4 / 1e6
    out = {
        "config": "multichip_cm_overhead",
        "device": str(dev),
        "cams": C, "points": cmp.n_points, "observations": cmp.n_obs,
        "iters": args.iters, "cg_iters": args.cg_iters,
        "single_chip_ms_per_iter": round(1e3 * t_single / args.iters, 1),
        "sharded_mesh1_ms_per_iter": round(1e3 * t_shard / args.iters, 1),
        "distribution_overhead": round(t_shard / t_single, 3),
        "cost_curve_rel_err": cost_rel,
        "cam_axis_mesh1_ms_per_iter": round(1e3 * t_cam / args.iters, 1),
        "cam_axis_overhead": round(t_cam / t_single, 3),
        "cam_axis_cost_curve_rel_err": cost_rel_cam,
        "ici_traffic_model": {
            "note": "camera-sized psums only; point-sized state never "
                    "moves (SURVEY §5 long-context analog)",
            "psum_mb_per_cg_iter": round(psum_cg_mb, 3),
            "psum_mb_per_lm_iter_system": round(psum_lm_mb, 3),
            "mb_per_lm_iter_total": round(
                psum_cg_mb * args.cg_iters + psum_lm_mb, 2
            ),
        },
        "n_way_correctness": "tests/test_sharded_cm.py: 2/4-shard CPU-mesh "
                             "solves equal single-chip (f64 rtol 1e-9; f32 "
                             "kernels rtol 1e-3)",
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
