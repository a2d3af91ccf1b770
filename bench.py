"""Benchmark entry point (driver contract): prints ONE JSON line.

Metric: on-device BA iterations/s on the robust-BA config from
BASELINE.json ("50 cams, 10k points, Huber + outlier matches"), full LM
iterations (residual+Jacobian build, normal equations, dense-W Schur
reduction, reduced Cholesky solve, back-substitution, retraction,
candidate cost + trust-region update) with tolerances zeroed so every run
executes exactly ``ITERS`` iterations.

``vs_baseline``: speedup of this framework over a reference-style
pure-NumPy per-measurement LM implementation (tests/oracle_numpy.py — the
stand-in for pysfm, which is itself a per-measurement NumPy codebase;
SURVEY §0/§6: the reference publishes no numbers and the mount was empty)
measured as BA-iterations/s ratio on pysfm's own two-view test-scene shape
(2 cameras, 100 points, BASELINE config 1).
"""

import json
import sys
import time

import numpy as np


ITERS = 30


def main():
    import jax

    sys.path.insert(0, ".")
    from pysfm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from pysfm_tpu.pipeline import synthetic
    from pysfm_tpu.solver import LMConfig, solve

    from pysfm_tpu.utils.timing import sync

    dev = jax.devices()[0]

    # --- main metric: 50 cams / 10k points robust BA, f32 ------------------
    # Routed through the flagship CM + grouped-Pallas-kernel + adaptive-CG
    # path (r5): same 30 full LM iterations to the same final cost as the
    # dense-Schur route, measured 3.6x faster at this config (11.65 ->
    # 3.20 ms/iter on v5e; the dense path's [300, 300] Cholesky and dense-W
    # reduce dominate it — per-stage profile in BENCH_PROFILE_r05.json).
    sc = synthetic.make_scene(
        50, 10_000, noise_px=0.5, outlier_frac=0.05, outlier_px=40.0,
        visibility=0.3, robust="huber", robust_scale=2.0, seed=42,
        dtype=np.float32,
    )
    cfg = LMConfig(max_iters=ITERS, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0)
    cfg_main = LMConfig(
        max_iters=ITERS, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0,
        solver="pcg", cg_iters=25, cg_tol=1e-2,
        cg_forcing="ew", cg_q_tol=0.3,
    )
    from pysfm_tpu.problem import cm as cm_mod
    from pysfm_tpu.solver.lm import make_grouped_ops

    gops = make_grouped_ops(cm_mod.from_problem(sc.problem))

    def best_of(fn, n=3):
        """Best-of-n wall time: both sides of every ratio reported here are
        timed the same way, so tunnel-latency spikes (measured multi-second
        on the axon runtime) cannot inflate vs_baseline (VERDICT r4 weak #4)."""
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    # Warm-up / compile.
    sync(solve(sc.problem, cfg_main, gops=gops))
    dt = best_of(lambda: sync(solve(sc.problem, cfg_main, gops=gops)))
    iters_per_s = ITERS / dt

    # --- vs_baseline: two-view scene, jax vs NumPy oracle ------------------
    sc2 = synthetic.make_scene(2, 100, noise_px=0.5, seed=1, dtype=np.float32)
    sync(solve(sc2.problem, cfg))
    jax_two_view = ITERS / best_of(lambda: sync(solve(sc2.problem, cfg)))

    # --- frames/s: incremental pipeline, BASELINE config 2 -----------------
    # (10 keyframes, 1k points, incremental pose init + windowed BA).  Host
    # orchestrates, device computes (SURVEY §3.3); wall time includes both.
    from pysfm_tpu.pipeline import IncrementalConfig, run_incremental

    sc3 = synthetic.make_scene(
        10, 1_000, noise_px=0.5, visibility=0.85, seed=13, radius=10.0,
        dtype=np.float32,
    )
    F, T = sc3.truth.n_cameras, sc3.truth.n_points
    uv_tab = np.zeros((F, T, 2), np.float32)
    vis_tab = np.zeros((F, T), bool)
    oc = np.asarray(sc3.truth.obs_cam)
    op = np.asarray(sc3.truth.obs_pt)
    uv_tab[oc, op] = np.asarray(sc3.truth.obs_uv)
    vis_tab[oc, op] = True
    intr_tab = np.asarray(sc3.truth.intr)
    inc_cfg = IncrementalConfig(seed=2)
    run_incremental(uv_tab, vis_tab, intr_tab, "pose", inc_cfg)  # compile
    t0 = time.perf_counter()
    run_incremental(uv_tab, vis_tab, intr_tab, "pose", inc_cfg)
    frames_per_s = F / (time.perf_counter() - t0)  # warm (in-process caches)

    sys.path.insert(0, "tests")
    from oracle_numpy import Oracle

    p2 = sc2.problem
    n_oracle = 3

    def run_oracle():
        # Fresh oracle per rep: optimize() mutates its state in place, so
        # every timed rep must start from the identical initial problem.
        Oracle(
            p2.camera_model,
            np.asarray(p2.R), np.asarray(p2.t), np.asarray(p2.intr),
            np.asarray(p2.X), np.asarray(p2.obs_cam), np.asarray(p2.obs_pt),
            np.asarray(p2.obs_uv),
        ).optimize(
            max_iters=n_oracle, tol_grad=0.0, tol_cost_rel=0.0, tol_step=0.0
        )

    oracle_two_view = n_oracle / best_of(run_oracle)

    print(json.dumps({
        "metric": "ba_iters_per_s_50cam_10kpt_robust",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": round(jax_two_view / oracle_two_view, 3),
        "device": str(dev),
        "route": "cm+grouped-kernels+pcg(ew,q=0.3); 30 full LM iterations",
        "two_view_iters_per_s": round(jax_two_view, 3),
        "oracle_two_view_iters_per_s": round(oracle_two_view, 3),
        "frames_per_s_10kf_1kpt_warm": round(frames_per_s, 3),
        "timing": "best-of-3 wall (both sides of vs_baseline)",
    }))


if __name__ == "__main__":
    main()
