"""Levenberg-Marquardt bundle adjustment, fully on device.

Reference analog: ``BundleAdjuster.optimize`` (SURVEY §2, §3.1) — the LM
outer loop with block normal equations, Schur elimination, damping and
accept/reject.  The reference steps this loop in Python with NumPy; here the
*entire* optimization (residuals, Jacobians, Schur solve, trust-region
control) is a single ``lax.while_loop`` under jit with no host round-trips
per iteration (BASELINE.json north-star: "LM damping, gain-ratio
trust-region updates, and robust-kernel reweighting run fully on-device").

Accept/reject is predicated (compute the candidate, ``where``-select), and
the damping parameter follows Nielsen's schedule; the NumPy oracle in
``tests/oracle_numpy.py`` implements the identical control flow so final
costs agree to ~1e-6 relative (BASELINE north-star parity definition).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pysfm_tpu.problem import problem as problem_mod
from pysfm_tpu.solver import schur
from pysfm_tpu.utils.config import LMConfig


@struct.dataclass
class LMStats:
    """Per-iteration log, accumulated on device and flushed once at the end
    (SURVEY §5 "Metrics / logging": no per-iteration host sync)."""

    costs: jnp.ndarray       # [max_iters + 1]; costs[0] = initial, then cost
                             # after each iteration (accepted or kept)
    lams: jnp.ndarray        # [max_iters] damping used at each iteration
    accepted: jnp.ndarray    # [max_iters] bool
    grad_inf: jnp.ndarray    # [max_iters] inf-norm of the gradient
    step_norms: jnp.ndarray  # [max_iters]
    n_iters: jnp.ndarray     # scalar int: iterations actually executed


class _State(struct.PyTreeNode):
    prob: problem_mod.BundleProblem
    lam: jnp.ndarray
    nu: jnp.ndarray
    cost: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    stats: LMStats


def _select(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


@partial(jax.jit, static_argnames=("config",))
def solve(
    prob: problem_mod.BundleProblem, config: LMConfig = LMConfig()
) -> Tuple[problem_mod.BundleProblem, LMStats]:
    """Run LM to convergence (or ``config.max_iters``) entirely on device."""
    dtype = prob.X.dtype
    n_it = config.max_iters
    init_cost = problem_mod.cost(prob)
    stats = LMStats(
        costs=jnp.full((n_it + 1,), jnp.nan, dtype).at[0].set(init_cost),
        lams=jnp.full((n_it,), jnp.nan, dtype),
        accepted=jnp.zeros((n_it,), bool),
        grad_inf=jnp.full((n_it,), jnp.nan, dtype),
        step_norms=jnp.full((n_it,), jnp.nan, dtype),
        n_iters=jnp.asarray(0),
    )
    state = _State(
        prob=prob,
        lam=jnp.asarray(config.lam0, dtype),
        nu=jnp.asarray(2.0, dtype),
        cost=init_cost,
        it=jnp.asarray(0),
        done=jnp.asarray(False),
        stats=stats,
    )

    def cond(s: _State):
        return jnp.logical_and(s.it < n_it, jnp.logical_not(s.done))

    use_pallas = config.jac_backend == "pallas" or (
        config.jac_backend == "auto"
        and jax.default_backend() == "tpu"
        and dtype == jnp.float32
    )
    use_cm = config.solver == "dense" and (
        config.layout == "cm" or config.layout == "auto"
    )

    def body(s: _State) -> _State:
        from pysfm_tpu.solver import schur_cm
        from pysfm_tpu.solver.kernels import pallas_proj

        p = s.prob
        if config.solver == "pcg":
            # BAL-scale path: obs-chunked scatter-free build + matrix-free
            # PCG in the gathered table domain (solver/scale.py, solver/pcg.py).
            from pysfm_tpu.solver import pcg, scale

            eqs = scale.build_normal_equations_scale(p, config.obs_chunk)
            grad_inf = jnp.maximum(
                jnp.max(jnp.abs(eqs.g_c)), jnp.max(jnp.abs(eqs.g_p))
            )
            dc, dp = pcg.solve_step_pcg(
                eqs, s.lam, p.obs_cam, p.obs_pt,
                tol=config.cg_tol, max_iters=config.cg_iters,
                pt_obs=p.pt_obs, pt_obs_mask=p.pt_obs_mask,
                cam_obs=p.cam_obs, cam_obs_mask=p.cam_obs_mask,
            )
        elif use_cm:
            if use_pallas:
                rt, Jct, Jpt, wt = (
                    pallas_proj.residuals_and_jacobians_pallas_cm(p)
                )
            else:
                r, J_cam, J_pt, w = problem_mod.residuals_and_jacobians(p)
                M = r.shape[0]
                rt = r.T
                Jct = J_cam.reshape(M, -1).T
                Jpt = J_pt.reshape(M, 6).T
                wt = w
            eqs = schur_cm.build_normal_equations_cm(
                rt, Jct, Jpt, wt, p.obs_cam, p.pt_obs, p.pt_obs_mask,
                p.n_cameras,
            )
            grad_inf = schur_cm.grad_inf_cm(eqs)
            dc, dp = schur_cm.solve_step_cm(
                eqs, s.lam, p.obs_cam, p.obs_pt, p.pt_obs, p.pt_obs_mask,
            )
        else:
            if use_pallas:
                r, J_cam, J_pt, w = (
                    pallas_proj.residuals_and_jacobians_pallas(p)
                )
            else:
                r, J_cam, J_pt, w = problem_mod.residuals_and_jacobians(p)
            eqs = schur.build_normal_equations(
                r, J_cam, J_pt, w, p.obs_cam, p.obs_pt,
                p.n_cameras, p.n_points,
                pt_obs=p.pt_obs, pt_obs_mask=p.pt_obs_mask,
            )
            grad_inf = jnp.maximum(
                jnp.max(jnp.abs(eqs.g_c)), jnp.max(jnp.abs(eqs.g_p))
            )
            dc, dp = schur.solve_step_dense(
                eqs, s.lam, p.obs_cam, p.obs_pt,
                pt_obs=p.pt_obs, pt_obs_mask=p.pt_obs_mask,
            )
        cand = problem_mod.apply_update(p, dc, dp)
        new_cost = problem_mod.cost(cand)
        if config.solver == "pcg":
            from pysfm_tpu.solver import scale

            pred = scale.predicted_reduction_scale(eqs, s.lam, dc, dp)
        elif use_cm:
            pred = schur_cm.predicted_reduction_cm(eqs, s.lam, dc, dp)
        else:
            pred = schur.predicted_reduction(eqs, s.lam, dc, dp)
        actual = s.cost - new_cost
        rho = actual / jnp.maximum(pred, jnp.finfo(dtype).tiny)

        ok = jnp.logical_and(jnp.isfinite(new_cost), actual > 0)
        ok = jnp.logical_and(ok, pred > 0)

        # Nielsen damping schedule (same constants in the oracle).
        factor = jnp.maximum(
            jnp.asarray(1.0 / 3.0, dtype), 1.0 - (2.0 * rho - 1.0) ** 3
        )
        lam_acc = jnp.clip(s.lam * factor, config.lam_min, config.lam_max)
        lam_rej = jnp.clip(s.lam * s.nu, config.lam_min, config.lam_max)
        lam_next = jnp.where(ok, lam_acc, lam_rej)
        nu_next = jnp.where(ok, jnp.asarray(2.0, dtype), s.nu * 2.0)

        new_params = _select(
            ok,
            (cand.R, cand.t, cand.intr, cand.X),
            (p.R, p.t, p.intr, p.X),
        )
        if config.renormalize_every > 0:
            renorm = jnp.logical_and(
                ok, (s.it % config.renormalize_every) == config.renormalize_every - 1
            )
            from pysfm_tpu.geometry import so3

            new_params = (
                jnp.where(renorm, so3.normalize(new_params[0]), new_params[0]),
            ) + new_params[1:]
        prob_next = p.replace(
            R=new_params[0], t=new_params[1], intr=new_params[2], X=new_params[3]
        )
        cost_next = jnp.where(ok, new_cost, s.cost)

        step_norm = jnp.sqrt(jnp.sum(dc * dc) + jnp.sum(dp * dp))
        converged = grad_inf < config.tol_grad
        converged = jnp.logical_or(
            converged,
            jnp.logical_and(ok, actual < config.tol_cost_rel * s.cost),
        )
        converged = jnp.logical_or(converged, step_norm < config.tol_step)

        st = s.stats
        st = st.replace(
            costs=st.costs.at[s.it + 1].set(cost_next),
            lams=st.lams.at[s.it].set(s.lam),
            accepted=st.accepted.at[s.it].set(ok),
            grad_inf=st.grad_inf.at[s.it].set(grad_inf),
            step_norms=st.step_norms.at[s.it].set(step_norm),
            n_iters=s.it + 1,
        )
        return _State(
            prob=prob_next,
            lam=lam_next,
            nu=nu_next,
            cost=cost_next,
            it=s.it + 1,
            done=converged,
            stats=st,
        )

    final = jax.lax.while_loop(cond, body, state)
    # Forward-fill the cost log past convergence so the tail is usable.
    it_idx = jnp.arange(n_it + 1)
    costs = jnp.where(
        it_idx <= final.it, final.stats.costs, final.cost
    )
    return final.prob, final.stats.replace(costs=costs)
