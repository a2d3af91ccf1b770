"""Matrix-free Schur solve: preconditioned CG on the reduced camera system.

Reference analog: the reference materializes S and calls a dense solve
(SURVEY §3.1 "dc = solve(S, rhs)"), which caps it at small camera counts.
For BASELINE config 4 (1.7k cams, 1M points) the dense-W operand
``[P, C*CP, 3]`` used by :func:`pysfm_tpu.solver.schur.reduce_dense` would
be tens of TB, so S can never be formed.  This module solves
``S dc = rhs`` *implicitly*:

    S x = Hcc_aug x - Hcp (Hpp_aug^-1 (Hcp^T x))

Each matvec is two gathers + two ``segment_sum``s + batched small matmuls
over the per-observation coupling blocks ``B [M, CP, 3]`` — all
MXU/VPU-shaped with static layouts, O(M) memory, no scatter of pair blocks.

Preconditioner: **exact** block-Jacobi of S.  In BA each (camera, point)
pair has (at most) one observation, so the diagonal block of the outer
product term is ``sum_{m in cam c} B_m Hpp_inv[pt_m] B_m^T`` — one more
segment_sum.  Block inverses are batched Cholesky solves of [CP, CP] tiles.

Distributed (SURVEY §2 "Point-sharded Schur elimination"): with
``axis_name`` set, points/observations are chip-local; every S-matvec
psums the camera-sized [C*CP] vector over ICI (one small collective per CG
iteration), the preconditioner is psum'd once per LM iteration, and the CG
scalars (alpha/beta) are computed from replicated quantities so all chips
stay in lockstep.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pysfm_tpu.utils import precision as xp

from pysfm_tpu.solver import schur


class PCGSystem(NamedTuple):
    Hcc_aug: jnp.ndarray    # [C, CP, CP] damped camera blocks (psum'd)
    Hpp_inv: jnp.ndarray    # [P, 3, 3] damped point-block inverses (local)
    B: jnp.ndarray          # [M, CP, 3] per-obs coupling blocks (local)
    rhs: jnp.ndarray        # [C, CP] reduced rhs (psum'd)
    g_p: jnp.ndarray        # [P, 3] point gradient (local)
    M_inv: jnp.ndarray      # [C, CP, CP] block-Jacobi preconditioner inverse
    obs_cam: jnp.ndarray
    obs_pt: jnp.ndarray


def build_pcg_system(
    eqs: schur.NormalEqs,
    lam: jnp.ndarray,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    axis_name: str | None = None,
) -> PCGSystem:
    """Damp, invert point blocks, build rhs and the block-Jacobi
    preconditioner — everything except S itself."""
    C, CP, _ = eqs.Hcc.shape
    P = eqs.Hpp.shape[0]
    Hcc = eqs.Hcc
    g_c = eqs.g_c
    if axis_name is not None:
        Hcc = jax.lax.psum(Hcc, axis_name)
        g_c = jax.lax.psum(g_c, axis_name)
    Hcc_aug = schur.augment_block_diag(Hcc, lam)
    Hpp_aug = schur.augment_block_diag(eqs.Hpp, lam)
    Hpp_inv = schur.inv3x3(Hpp_aug)

    # rhs = -g_c + Hcp Hpp_inv g_p   (camera-sized; psum partials).
    u = xp.einsum("pst,pt->ps", Hpp_inv, eqs.g_p)          # [P, 3]
    z = xp.einsum("mcs,ms->mc", eqs.B, u[obs_pt])          # [M, CP]
    rhs_red = jax.ops.segment_sum(z, obs_cam, num_segments=C)
    if axis_name is not None:
        rhs_red = jax.lax.psum(rhs_red, axis_name)
    rhs = -g_c + rhs_red

    # Exact block-Jacobi: D_c = Hcc_aug[c] - sum_{m in c} B_m Hpp_inv B_m^T.
    BtHinv = xp.einsum("mcs,mst->mct", eqs.B, Hpp_inv[obs_pt])  # [M, CP, 3]
    D_m = xp.einsum("mct,mdt->mcd", BtHinv, eqs.B)              # [M, CP, CP]
    D = jax.ops.segment_sum(D_m, obs_cam, num_segments=C)
    if axis_name is not None:
        D = jax.lax.psum(D, axis_name)
    D = Hcc_aug - D
    # Batched Cholesky inverse of the [CP, CP] diagonal blocks; symmetrize
    # first (segment_sum order effects) and fall back to the damped Hcc
    # block if a block is not SPD (can happen transiently at huge lam).
    D = 0.5 * (D + jnp.swapaxes(D, -1, -2))
    eye = jnp.eye(CP, dtype=D.dtype)
    L = jnp.linalg.cholesky(D)
    ok = jnp.all(jnp.isfinite(L), axis=(-2, -1), keepdims=True)
    L_safe = jnp.where(ok, L, jnp.linalg.cholesky(Hcc_aug))
    M_inv = jax.scipy.linalg.cho_solve(
        (L_safe, True), jnp.broadcast_to(eye, D.shape)
    )
    return PCGSystem(
        Hcc_aug=Hcc_aug, Hpp_inv=Hpp_inv, B=eqs.B, rhs=rhs, g_p=eqs.g_p,
        M_inv=M_inv, obs_cam=obs_cam, obs_pt=obs_pt,
    )


def schur_matvec(
    sys: PCGSystem, x: jnp.ndarray, axis_name: str | None = None
) -> jnp.ndarray:
    """y = S x with x, y [C, CP]; S never formed."""
    C = sys.Hcc_aug.shape[0]
    # u = Hcp^T x : per-obs B_m^T x[cam_m], summed per point.
    u_m = xp.einsum("mcs,mc->ms", sys.B, x[sys.obs_cam])    # [M, 3]
    u = jax.ops.segment_sum(u_m, sys.obs_pt, num_segments=sys.Hpp_inv.shape[0])
    w = xp.einsum("pst,pt->ps", sys.Hpp_inv, u)             # [P, 3]
    z_m = xp.einsum("mcs,ms->mc", sys.B, w[sys.obs_pt])     # [M, CP]
    z = jax.ops.segment_sum(z_m, sys.obs_cam, num_segments=C)
    if axis_name is not None:
        z = jax.lax.psum(z, axis_name)
    y = xp.einsum("cde,ce->cd", sys.Hcc_aug, x)
    return y - z


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b)


def pcg_solve(
    sys: PCGSystem,
    *,
    tol: float = 1e-6,
    max_iters: int = 100,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Preconditioned CG for S dc = rhs; returns dc [C, CP].

    Note on distributed determinism: every quantity entering the CG
    scalars is psum'd (hence bitwise-identical across chips given the
    fixed mesh reduction order), so chips cannot diverge.
    """
    b = sys.rhs
    x0 = jnp.zeros_like(b)
    r0 = b                                    # x0 = 0 => r = b - S x0 = b
    z0 = xp.einsum("cde,ce->cd", sys.M_inv, r0)
    b_norm = jnp.sqrt(_dot(b, b))
    thresh = tol * jnp.maximum(b_norm, jnp.asarray(1e-30, b.dtype))

    def cond(state):
        _, r, _, _, rz, it = state
        return jnp.logical_and(it < max_iters, jnp.sqrt(_dot(r, r)) > thresh)

    def body(state):
        x, r, z, p, rz, it = state
        Sp = schur_matvec(sys, p, axis_name)
        alpha = rz / jnp.maximum(_dot(p, Sp), jnp.finfo(b.dtype).tiny)
        x = x + alpha * p
        r = r - alpha * Sp
        z = xp.einsum("cde,ce->cd", sys.M_inv, r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, jnp.finfo(b.dtype).tiny)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    state = (x0, r0, z0, z0, _dot(r0, z0), jnp.asarray(0))
    x, *_ = jax.lax.while_loop(cond, body, state)
    return x


def back_substitute(sys: PCGSystem, dc: jnp.ndarray) -> jnp.ndarray:
    """dp = -Hpp_inv (g_p + Hcp^T dc) — identical to the dense path but from
    per-observation blocks (local to the chip's point shard)."""
    u_m = xp.einsum("mcs,mc->ms", sys.B, dc[sys.obs_cam])
    u = jax.ops.segment_sum(
        u_m, sys.obs_pt, num_segments=sys.Hpp_inv.shape[0]
    )
    return -xp.einsum("pst,pt->ps", sys.Hpp_inv, sys.g_p + u)


def solve_step_pcg(
    eqs: schur.NormalEqs,
    lam: jnp.ndarray,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    *,
    tol: float = 1e-6,
    max_iters: int = 100,
    axis_name: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for :func:`schur.solve_step_dense` at scale."""
    sys = build_pcg_system(eqs, lam, obs_cam, obs_pt, axis_name)
    dc = pcg_solve(sys, tol=tol, max_iters=max_iters, axis_name=axis_name)
    dp = back_substitute(sys, dc)
    return dc, dp
