"""Matrix-free Schur solve: preconditioned CG on the reduced camera system.

Reference analog: the reference materializes S and calls a dense solve
(SURVEY §3.1 "dc = solve(S, rhs)"), which caps it at small camera counts.
For BASELINE config 4 (1.7k cams, 1M points) the dense-W operand
``[P, C*CP, 3]`` used by :func:`pysfm_tpu.solver.schur.reduce_dense` would
be tens of TB, so S can never be formed.  This module solves
``S dc = rhs`` *implicitly*:

    S x = Hcc_aug x - Hcp (Hpp_aug^-1 (Hcp^T x))

TPU layout — the **gathered (table) domain**.  TPU scatter-adds serialize
(``segment_sum`` over 5M observations measured ~0.7 s/call on v5e), and a
one-hot [M, C] reduction matmul costs M*C*D*2 MXU flops (~30 ms/matvec at
Venice scale).  Instead, the per-observation coupling blocks ``B
[M, CP, 3]`` are gathered ONCE per LM iteration into both padded
visibility tables:

- ``Bp [P, K, CP, 3]``  — point-major (rows of Hcp^T), via ``pt_obs``;
- ``Bg [C, Kc, CP, 3]`` — camera-major (rows of Hcp), via ``cam_obs``;

after which every reduction in the CG loop is a small gather of a
camera/point *vector* plus one batched masked contraction — pure
memory-bound VPU/MXU work with static shapes, no scatters anywhere.
Padding slots hold zero blocks, so gathered garbage never contributes.

Preconditioner: **exact** block-Jacobi of S.  In BA each (camera, point)
pair has (at most) one observation, so the diagonal block of the outer
product term is ``sum_k Bg[c,k] Hpp_inv[pt] Bg[c,k]^T`` — one more
masked contraction.  Block inverses are batched Cholesky solves of
[CP, CP] tiles.

Distributed (SURVEY §2 "Point-sharded Schur elimination"): with
``axis_name`` set, points/observations (and both tables, built per shard)
are chip-local; every S-matvec psums the camera-sized [C, CP] vector over
ICI (one small collective per CG iteration), the preconditioner is psum'd
once per LM iteration, and the CG scalars (alpha/beta) are computed from
replicated quantities so all chips stay in lockstep.

A ``segment_sum`` fallback remains for callers without tables (used by the
equality tests as an independent formulation of the same operator).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pysfm_tpu.utils import precision as xp

from pysfm_tpu.solver import schur


class PCGSystem(NamedTuple):
    Hcc_aug: jnp.ndarray    # [C, CP, CP] damped camera blocks (psum'd)
    Hpp_inv: jnp.ndarray    # [P, 3, 3] damped point-block inverses (local)
    rhs: jnp.ndarray        # [C, CP] reduced rhs (psum'd)
    g_p: jnp.ndarray        # [P, 3] point gradient (local)
    M_inv: jnp.ndarray      # [C, CP, CP] block-Jacobi preconditioner inverse
    # Gathered-domain operands (None on the segment_sum fallback path).
    Bp: Optional[jnp.ndarray]    # [P, K, CP, 3] masked point-major blocks
    camg: Optional[jnp.ndarray]  # [P, K] camera id per slot
    Bg: Optional[jnp.ndarray]    # [C, Kc, CP, 3] masked camera-major blocks
    ptg: Optional[jnp.ndarray]   # [C, Kc] point id per slot
    # Fallback per-observation operands (None on the table path).
    B: Optional[jnp.ndarray]       # [M, CP, 3]
    obs_cam: Optional[jnp.ndarray]
    obs_pt: Optional[jnp.ndarray]


def build_pcg_system(
    eqs: schur.NormalEqs,
    lam: jnp.ndarray,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    axis_name: str | None = None,
    pt_obs: jnp.ndarray | None = None,
    pt_obs_mask: jnp.ndarray | None = None,
    cam_obs: jnp.ndarray | None = None,
    cam_obs_mask: jnp.ndarray | None = None,
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

    use_tables = pt_obs is not None and cam_obs is not None
    u0 = xp.einsum("pst,pt->ps", Hpp_inv, eqs.g_p)             # [P, 3]
    if use_tables:
        pmask = pt_obs_mask.astype(eqs.B.dtype)
        cmask = cam_obs_mask.astype(eqs.B.dtype)
        Bp = eqs.B[pt_obs] * pmask[..., None, None]            # [P, K, CP, 3]
        camg = obs_cam[pt_obs]                                 # [P, K]
        Bg = eqs.B[cam_obs] * cmask[..., None, None]           # [C, Kc, CP, 3]
        ptg = obs_pt[cam_obs]                                  # [C, Kc]
        # rhs_red[c] = sum_k Bg[c,k] @ (Hpp_inv g_p)[ptg[c,k]].
        rhs_red = xp.einsum("ckds,cks->cd", Bg, u0[ptg])
        # Exact block-Jacobi diag: D_c = Hcc_aug[c] - sum_k Bg Hinv Bg^T.
        BH = xp.einsum("ckds,ckst->ckdt", Bg, Hpp_inv[ptg])    # [C, Kc, CP, 3]
        D = xp.einsum("ckdt,cket->cde", BH, Bg)
        B_keep = camg_keep = None
    else:
        z = xp.einsum("mcs,ms->mc", eqs.B, u0[obs_pt])          # [M, CP]
        rhs_red = jax.ops.segment_sum(z, obs_cam, num_segments=C)
        BtHinv = xp.einsum("mcs,mst->mct", eqs.B, Hpp_inv[obs_pt])
        D_m = xp.einsum("mct,mdt->mcd", BtHinv, eqs.B)          # [M, CP, CP]
        D = jax.ops.segment_sum(D_m, obs_cam, num_segments=C)
        Bp = camg = Bg = ptg = None
    if axis_name is not None:
        rhs_red = jax.lax.psum(rhs_red, axis_name)
        D = jax.lax.psum(D, axis_name)
    rhs = -g_c + rhs_red
    D = Hcc_aug - D
    # Batched Cholesky inverse of the [CP, CP] diagonal blocks; symmetrize
    # first (summation order effects) and fall back to the damped Hcc
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
        Hcc_aug=Hcc_aug, Hpp_inv=Hpp_inv, rhs=rhs, g_p=eqs.g_p, M_inv=M_inv,
        Bp=Bp, camg=camg, Bg=Bg, ptg=ptg,
        B=None if use_tables else eqs.B,
        obs_cam=None if use_tables else obs_cam,
        obs_pt=None if use_tables else obs_pt,
    )


def _hcpT_x(sys: PCGSystem, x: jnp.ndarray) -> jnp.ndarray:
    """u = Hcp^T x, point-sized [P, 3]."""
    if sys.Bp is not None:
        return xp.einsum("pkcs,pkc->ps", sys.Bp, x[sys.camg])
    u_m = xp.einsum("mcs,mc->ms", sys.B, x[sys.obs_cam])        # [M, 3]
    return jax.ops.segment_sum(
        u_m, sys.obs_pt, num_segments=sys.Hpp_inv.shape[0]
    )


def _hcp_w(sys: PCGSystem, w: jnp.ndarray, C: int) -> jnp.ndarray:
    """z = Hcp w, camera-sized [C, CP] (chip-local partial)."""
    if sys.Bg is not None:
        return xp.einsum("ckds,cks->cd", sys.Bg, w[sys.ptg])
    z_m = xp.einsum("mcs,ms->mc", sys.B, w[sys.obs_pt])         # [M, CP]
    return jax.ops.segment_sum(z_m, sys.obs_cam, num_segments=C)


def schur_matvec(
    sys: PCGSystem, x: jnp.ndarray, axis_name: str | None = None
) -> jnp.ndarray:
    """y = S x with x, y [C, CP]; S never formed."""
    C = sys.Hcc_aug.shape[0]
    u = _hcpT_x(sys, x)
    w = xp.einsum("pst,pt->ps", sys.Hpp_inv, u)                 # [P, 3]
    z = _hcp_w(sys, w, C)
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
        _, r, _, _, rz, it, done = state
        return jnp.logical_and(
            jnp.logical_and(it < max_iters, jnp.logical_not(done)),
            jnp.sqrt(_dot(r, r)) > thresh,
        )

    def body(state):
        x, r, z, p, rz, it, _ = state
        Sp = schur_matvec(sys, p, axis_name)
        pSp = _dot(p, Sp)
        # Breakdown guard: S is SPD in exact arithmetic, but f32 rounding at
        # scale can turn a nearly-converged direction indefinite — stop and
        # keep the current iterate (the LM trust region absorbs an inexact
        # step by rejecting it and raising lam).
        bad = jnp.logical_not(
            jnp.logical_and(jnp.isfinite(pSp), pSp > 0)
        )
        alpha = jnp.where(
            bad, jnp.zeros_like(rz),
            rz / jnp.maximum(pSp, jnp.finfo(b.dtype).tiny),
        )
        x = x + alpha * p
        r = r - alpha * Sp
        z = xp.einsum("cde,ce->cd", sys.M_inv, r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, jnp.finfo(b.dtype).tiny)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1, bad)

    state = (x0, r0, z0, z0, _dot(r0, z0), jnp.asarray(0), jnp.asarray(False))
    x, *_ = jax.lax.while_loop(cond, body, state)
    return x


def back_substitute(sys: PCGSystem, dc: jnp.ndarray) -> jnp.ndarray:
    """dp = -Hpp_inv (g_p + Hcp^T dc) — identical to the dense path but from
    the gathered coupling blocks (local to the chip's point shard)."""
    u = _hcpT_x(sys, dc)
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
    pt_obs: jnp.ndarray | None = None,
    pt_obs_mask: jnp.ndarray | None = None,
    cam_obs: jnp.ndarray | None = None,
    cam_obs_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for :func:`schur.solve_step_dense` at scale."""
    sys = build_pcg_system(
        eqs, lam, obs_cam, obs_pt, axis_name,
        pt_obs=pt_obs, pt_obs_mask=pt_obs_mask,
        cam_obs=cam_obs, cam_obs_mask=cam_obs_mask,
    )
    # Materialization fence between the system build and the CG while_loop:
    # without it the axon TPU compiler fuses the gathered-operand build into
    # the loop and silently corrupts buffers (CPU-verified correct; see
    # solver/scale.py).  Also exactly what we want for memory locality.
    sys = jax.lax.optimization_barrier(sys)
    dc = pcg_solve(sys, tol=tol, max_iters=max_iters, axis_name=axis_name)
    dp = back_substitute(sys, dc)
    return dc, dp
