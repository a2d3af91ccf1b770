"""Pallas TPU kernel: fused residual + analytic-Jacobian + robust-weight
build over the observation axis.

Reference analog (SURVEY §2/§3.1): the per-measurement hot loop computing
``r_m``, ``J_cam_m``, ``J_pt_m`` and the IRLS weight — the reference steps
it in Python; the jax path (:func:`pysfm_tpu.problem.problem.
residuals_and_jacobians`) batches it as XLA elementwise fusions; this module
is the native tier mandated by SURVEY §2 "Pallas kernels (the framework's
native tier)": ONE memory-bound pass that reads the gathered camera/point
operands and writes r, J_cam, J_pt, w without intermediate HBM traffic.

Layout: observations ride the **lane** dimension (last dim, 128-wide) and
the small per-observation components (rotation entries, Jacobian entries)
ride sublanes — i.e. every array is component-major ``[D, M]``.  All math is
rank-2 ``[1, TM]`` elementwise VPU ops; there are no gathers or matmuls
inside the kernel (gathers happen once outside, where XLA overlaps them
with the kernel's DMA).

Supported camera models / robust kernels mirror
:mod:`pysfm_tpu.geometry.projection` and :mod:`pysfm_tpu.problem.robust`;
equality with the jax path is asserted (interpret mode on CPU, compiled on
TPU) in ``tests/test_pallas.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pysfm_tpu.geometry import projection

TILE_M = 1024  # observations per grid step (8 f32 lanes rows x 128)


def _row(ref, k):
    """Read component row k as a [1, TM] block (keeps ops rank-2)."""
    return ref[k : k + 1, :]


def _proj_rows(model, Rt, tt, it, Xt):
    """Shared projection front-end on [1, TM] rows.

    Returns (u, v, A, q, R_rows) where A is the 2x3 ``duv/dp`` chain rows
    ``A[i][k]``, q = p - t (= R X), and R_rows the 9 rotation entries —
    everything later Jacobian rows need.
    """
    R = [_row(Rt, k) for k in range(9)]  # row-major R00..R22
    t0, t1, t2 = (_row(tt, k) for k in range(3))
    X0, X1, X2 = (_row(Xt, k) for k in range(3))
    q0 = R[0] * X0 + R[1] * X1 + R[2] * X2
    q1 = R[3] * X0 + R[4] * X1 + R[5] * X2
    q2 = R[6] * X0 + R[7] * X1 + R[8] * X2
    x, y, z = q0 + t0, q1 + t1, q2 + t2
    iz = 1.0 / z
    iz2 = iz * iz

    if model == "bal":
        f, k1, k2 = (_row(it, k) for k in range(3))
        pn0 = -x * iz
        pn1 = -y * iz
        r2 = pn0 * pn0 + pn1 * pn1
        rho = 1.0 + r2 * (k1 + r2 * k2)
        u = f * rho * pn0
        v = f * rho * pn1
        # duv/dpn = f * (rho I + pn drho^T), drho = (2k1 + 4k2 r2) pn
        g = 2.0 * k1 + 4.0 * k2 * r2
        B00 = f * (rho + pn0 * g * pn0)
        B01 = f * (pn0 * g * pn1)
        B10 = B01
        B11 = f * (rho + pn1 * g * pn1)
        # dpn/dp = [[-iz, 0, x iz2], [0, -iz, y iz2]]
        A = [
            [-B00 * iz, -B01 * iz, (B00 * x + B01 * y) * iz2],
            [-B10 * iz, -B11 * iz, (B10 * x + B11 * y) * iz2],
        ]
        intr_rows = (f, k1, k2, rho, r2, pn0, pn1)
    else:
        fx, fy, cx, cy = (_row(it, k) for k in range(4))
        pn0 = x * iz
        pn1 = y * iz
        u = fx * pn0 + cx
        v = fy * pn1 + cy
        zero = jnp.zeros_like(iz)
        A = [
            [fx * iz, zero, -fx * x * iz2],
            [zero, fy * iz, -fy * y * iz2],
        ]
        intr_rows = (pn0, pn1)
    return u, v, A, (q0, q1, q2), R, intr_rows


def _kernel(model, robust, cp, Rt, tt, it, Xt, uvt, wobs, free, scale_ref,
            rt, Jct, Jpt, wt):
    u, v, A, (q0, q1, q2), R, intr_rows = _proj_rows(model, Rt, tt, it, Xt)
    r0 = u - _row(uvt, 0)
    r1 = v - _row(uvt, 1)
    rt[0:1, :] = r0
    rt[1:2, :] = r1

    # Robust IRLS weight w = obs_w * rho'(||r||^2).
    s = r0 * r0 + r1 * r1
    c = scale_ref[0, 0]
    if robust == "gaussian":
        w_r = jnp.ones_like(s)
    elif robust == "huber":
        c2 = c * c
        safe = jnp.maximum(s, c2)
        w_r = jnp.where(s <= c2, jnp.ones_like(s), c * jax.lax.rsqrt(safe))
    elif robust == "cauchy":
        c2 = c * c
        w_r = 1.0 / (1.0 + s / c2)
    else:  # pragma: no cover - validated by caller
        raise ValueError(robust)
    wt[0:1, :] = _row(wobs, 0) * w_r

    fm = _row(free, 0)  # 0 for gauge-fixed cameras: zero their J_cam rows
    for i, Ai in enumerate(A):
        Ax, Ay, Az = Ai
        # J_w = A @ (-hat(q)), columns: (-Ay qz + Az qy, Ax qz - Az qx,
        #                                -Ax qy + Ay qx)
        Jct[(i * cp + 0) : (i * cp + 1), :] = fm * (-Ay * q2 + Az * q1)
        Jct[(i * cp + 1) : (i * cp + 2), :] = fm * (Ax * q2 - Az * q0)
        Jct[(i * cp + 2) : (i * cp + 3), :] = fm * (-Ax * q1 + Ay * q0)
        # J_t = A
        Jct[(i * cp + 3) : (i * cp + 4), :] = fm * Ax
        Jct[(i * cp + 4) : (i * cp + 5), :] = fm * Ay
        Jct[(i * cp + 5) : (i * cp + 6), :] = fm * Az
        # J_pt = A @ R
        Jpt[(i * 3 + 0) : (i * 3 + 1), :] = Ax * R[0] + Ay * R[3] + Az * R[6]
        Jpt[(i * 3 + 1) : (i * 3 + 2), :] = Ax * R[1] + Ay * R[4] + Az * R[7]
        Jpt[(i * 3 + 2) : (i * 3 + 3), :] = Ax * R[2] + Ay * R[5] + Az * R[8]

    if model == "bal":
        f, k1, k2, rho, r2, pn0, pn1 = intr_rows
        pns = (pn0, pn1)
        for i in range(2):
            Jct[(i * cp + 6) : (i * cp + 7), :] = fm * rho * pns[i]
            Jct[(i * cp + 7) : (i * cp + 8), :] = fm * f * r2 * pns[i]
            Jct[(i * cp + 8) : (i * cp + 9), :] = fm * f * r2 * r2 * pns[i]
    elif model == "pose_k":
        pn0, pn1 = intr_rows
        one = jnp.ones_like(pn0)
        zero = jnp.zeros_like(pn0)
        for i, (dfx, dfy, dcx, dcy) in enumerate(
            ((pn0, zero, one, zero), (zero, pn1, zero, one))
        ):
            Jct[(i * cp + 6) : (i * cp + 7), :] = fm * dfx
            Jct[(i * cp + 7) : (i * cp + 8), :] = fm * dfy
            Jct[(i * cp + 8) : (i * cp + 9), :] = fm * dcx
            Jct[(i * cp + 9) : (i * cp + 10), :] = fm * dcy


def _pad_cols(a: jnp.ndarray, m_pad: int) -> jnp.ndarray:
    if a.shape[-1] == m_pad:
        return a
    return jnp.pad(a, ((0, 0), (0, m_pad - a.shape[-1])))


@functools.partial(
    jax.jit, static_argnames=("model", "robust", "interpret")
)
def residuals_jacobians_weights_cm(
    model: str,
    robust: str,
    Rg: jnp.ndarray,
    tg: jnp.ndarray,
    ig: jnp.ndarray,
    Xg: jnp.ndarray,
    obs_uv: jnp.ndarray,
    obs_w: jnp.ndarray,
    free: jnp.ndarray,
    robust_scale: jnp.ndarray,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Component-major variant: returns ``(rt [2, M], Jct [2*CP, M],
    Jpt [6, M], wt [M])`` — the kernel's native layout, with observations on
    lanes.  This is the layout the component-major normal-equation /
    Schur path (solver/schur_cm.py) consumes; skipping the [M, ...]
    transposes keeps every downstream elementwise op on unpadded tiles
    (a [M, 2, CP] array tiles its minor (2, CP) dims to (8, 128) on TPU —
    ~85x memory amplification measured as the dominant LM iteration cost).
    """
    projection._check_model(model)
    cp = projection.CAM_DOF[model]
    intr_dim = projection.INTR_DIM[model]
    M = Rg.shape[0]
    m_pad = max(pl.cdiv(M, TILE_M), 1) * TILE_M
    dtype = Rg.dtype

    Rt = _pad_cols(Rg.reshape(M, 9).T, m_pad)
    tt = _pad_cols(tg.T, m_pad)
    it = _pad_cols(ig.T, m_pad)
    Xt = _pad_cols(Xg.T, m_pad)
    uvt = _pad_cols(obs_uv.T, m_pad)
    wobs = _pad_cols(obs_w[None, :], m_pad)
    if m_pad != M:
        Xt = Xt.at[2, M:].set(1.0)
    freet = _pad_cols(free[None, :].astype(dtype), m_pad)
    scale = jnp.asarray(robust_scale, dtype).reshape(1, 1)

    grid = (m_pad // TILE_M,)

    def spec(d):
        return pl.BlockSpec((d, TILE_M), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, model, robust, cp)
    rt, Jct, Jpt, wt = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            spec(9), spec(3), spec(intr_dim), spec(3), spec(2), spec(1),
            spec(1),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[spec(2), spec(2 * cp), spec(6), spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((2, m_pad), dtype),
            jax.ShapeDtypeStruct((2 * cp, m_pad), dtype),
            jax.ShapeDtypeStruct((6, m_pad), dtype),
            jax.ShapeDtypeStruct((1, m_pad), dtype),
        ],
        interpret=interpret,
    )(Rt, tt, it, Xt, uvt, wobs, freet, scale)
    return rt[:, :M], Jct[:, :M], Jpt[:, :M], wt[0, :M]


@functools.partial(
    jax.jit, static_argnames=("model", "robust", "interpret")
)
def residuals_jacobians_weights(
    model: str,
    robust: str,
    Rg: jnp.ndarray,      # [M, 3, 3] gathered camera rotations
    tg: jnp.ndarray,      # [M, 3]
    ig: jnp.ndarray,      # [M, I]
    Xg: jnp.ndarray,      # [M, 3] gathered points
    obs_uv: jnp.ndarray,  # [M, 2]
    obs_w: jnp.ndarray,   # [M]
    free: jnp.ndarray,    # [M] 1.0 where the camera is free, 0.0 if fixed
    robust_scale: jnp.ndarray,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused build of ``(r [M,2], J_cam [M,2,CP], J_pt [M,2,3], w [M])``.

    Drop-in equal to the jax path in
    :func:`pysfm_tpu.problem.problem.residuals_and_jacobians` (given the
    same gathered operands); f32 only — TPU Pallas has no f64.
    """
    projection._check_model(model)
    cp = projection.CAM_DOF[model]
    intr_dim = projection.INTR_DIM[model]
    M = Rg.shape[0]
    m_pad = max(pl.cdiv(M, TILE_M), 1) * TILE_M
    dtype = Rg.dtype

    # Component-major [D, M] operands (one relayout; the kernel then streams
    # lane-contiguous tiles).
    Rt = _pad_cols(Rg.reshape(M, 9).T, m_pad)
    tt = _pad_cols(tg.T, m_pad)
    it = _pad_cols(ig.T, m_pad)
    Xt = _pad_cols(Xg.T, m_pad)
    uvt = _pad_cols(obs_uv.T, m_pad)
    wobs = _pad_cols(obs_w[None, :], m_pad)
    # Pad X with z=1 so 1/z never divides by zero on padding lanes.
    if m_pad != M:
        Xt = Xt.at[2, M:].set(1.0)
    freet = _pad_cols(free[None, :].astype(dtype), m_pad)
    scale = jnp.asarray(robust_scale, dtype).reshape(1, 1)

    grid = (m_pad // TILE_M,)

    def spec(d):
        return pl.BlockSpec((d, TILE_M), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, model, robust, cp)
    rt, Jct, Jpt, wt = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            spec(9), spec(3), spec(intr_dim), spec(3), spec(2), spec(1),
            spec(1),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[spec(2), spec(2 * cp), spec(6), spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((2, m_pad), dtype),
            jax.ShapeDtypeStruct((2 * cp, m_pad), dtype),
            jax.ShapeDtypeStruct((6, m_pad), dtype),
            jax.ShapeDtypeStruct((1, m_pad), dtype),
        ],
        interpret=interpret,
    )(Rt, tt, it, Xt, uvt, wobs, freet, scale)

    r = rt[:, :M].T
    J_cam = Jct[:, :M].T.reshape(M, 2, cp)
    J_pt = Jpt[:, :M].T.reshape(M, 2, 3)
    w = wt[0, :M]
    return r, J_cam, J_pt, w


def _gathered_operands(p):
    Rg = p.R[p.obs_cam]
    tg = p.t[p.obs_cam]
    ig = p.intr[p.obs_cam]
    Xg = p.X[p.obs_pt]
    free = jnp.logical_not(p.cam_fixed)[p.obs_cam].astype(p.X.dtype)
    return Rg, tg, ig, Xg, free


def residuals_and_jacobians_pallas(p, *, interpret: bool = False):
    """Pallas-backed drop-in for
    :func:`pysfm_tpu.problem.problem.residuals_and_jacobians`."""
    Rg, tg, ig, Xg, free = _gathered_operands(p)
    return residuals_jacobians_weights(
        p.camera_model, p.robust, Rg, tg, ig, Xg, p.obs_uv, p.obs_w, free,
        p.robust_scale, interpret=interpret,
    )


def residuals_and_jacobians_pallas_cm(p, *, interpret: bool = False):
    """Component-major build: ``(rt [2,M], Jct [2CP,M], Jpt [6,M], wt [M])``
    for the schur_cm solver path."""
    Rg, tg, ig, Xg, free = _gathered_operands(p)
    return residuals_jacobians_weights_cm(
        p.camera_model, p.robust, Rg, tg, ig, Xg, p.obs_uv, p.obs_w, free,
        p.robust_scale, interpret=interpret,
    )
