"""Perspective-n-Point resection: camera pose from 2D-3D correspondences.

Reference analog (SURVEY §2/§3.3 "pose init: resection from 2D-3D matches,
RANSAC'd DLT-style, then refine").  Pipeline: weighted DLT for the [R|t]
projective estimate (intrinsics known, normalized coordinates), orthogonal
Procrustes projection onto SO(3), cheirality disambiguation, then a fixed
small number of Gauss-Newton iterations on the 6-DoF pose using the L0
analytic Jacobians.  Everything static-shape and vmappable so it can serve
as the RANSAC ``fit``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pysfm_tpu.utils import precision as xp

from pysfm_tpu.geometry import so3


def pnp_dlt(
    X: jnp.ndarray,     # [N, 3] world points
    pn: jnp.ndarray,    # [N, 2] normalized image coords (pinhole convention)
    w: jnp.ndarray,     # [N] weights (>= 6 effective points)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted DLT: returns (R [3,3], t [3]) with p_cam = R X + t.

    Solves min ||A vec(P)|| over P = [R|t] up to scale from
    ``xn (P3 . Xh) - (P1 . Xh) = 0`` style constraints, then projects onto
    SO(3) (Procrustes) and fixes scale/sign by cheirality.
    """
    N = X.shape[0]
    ones = jnp.ones_like(X[:, :1])
    Xh = jnp.concatenate([X, ones], axis=-1)              # [N, 4]
    zero = jnp.zeros_like(Xh)
    xn, yn = pn[:, 0:1], pn[:, 1:2]
    # Rows: [Xh, 0, -xn*Xh] and [0, Xh, -yn*Xh] over vec(P) (row-major P).
    A1 = jnp.concatenate([Xh, zero, -xn * Xh], axis=-1)   # [N, 12]
    A2 = jnp.concatenate([zero, Xh, -yn * Xh], axis=-1)
    A = jnp.concatenate([A1, A2], axis=0)                 # [2N, 12]
    ww = jnp.concatenate([w, w], axis=0)
    M = (A * ww[:, None]).T @ A                           # [12, 12]
    _, V = jnp.linalg.eigh(M)
    P = V[:, 0].reshape(3, 4)
    # Fix the sign BEFORE the SO(3) projection (-R is not a rotation):
    # projective depths w_i = P3 . Xh_i must be majority-positive.
    wdepth = xp.matvec(Xh, P[2])
    sgn = jnp.where(
        jnp.sum((wdepth > 0) * w) >= jnp.sum((wdepth < 0) * w), 1.0, -1.0
    )
    P = P * sgn
    # Fix the scale: the third row of the rotation part has unit norm.
    P = P / jnp.maximum(jnp.linalg.norm(P[2, :3]), 1e-12)
    # Procrustes: nearest proper rotation.
    U, _, Vt = jnp.linalg.svd(P[:, :3])
    det = jnp.linalg.det(xp.matmul(U, Vt))
    fix = jnp.ones(3, P.dtype).at[2].set(det)
    R = xp.matmul(U * fix[None, :], Vt)
    return R, P[:, 3]


def refine_pose(
    R0: jnp.ndarray, t0: jnp.ndarray,
    X: jnp.ndarray, pn: jnp.ndarray, w: jnp.ndarray,
    iters: int = 8,
    damping: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration damped GN on the 6-DoF pose, normalized coords.

    Residual per point: pn_hat - pn with pn_hat = (p_xy / p_z), p = R X + t.
    Analytic Jacobian wrt (dw, dt) via the L0 chain rule.
    """

    def step(carry, _):
        R, t = carry
        p = jnp.einsum("ij,nj->ni", R, X, precision=xp.HIGHEST) + t
        inv_z = 1.0 / p[:, 2]
        pn_hat = p[:, :2] * inv_z[:, None]
        r = pn_hat - pn                                     # [N, 2]
        zero = jnp.zeros_like(inv_z)
        duv_dp = jnp.stack(
            [
                jnp.stack([inv_z, zero, -p[:, 0] * inv_z * inv_z], axis=-1),
                jnp.stack([zero, inv_z, -p[:, 1] * inv_z * inv_z], axis=-1),
            ],
            axis=-2,
        )                                                    # [N, 2, 3]
        RX = p - t
        J_w = duv_dp @ (-so3.hat(RX))                        # [N, 2, 3]
        J = jnp.concatenate([J_w, duv_dp], axis=-1)          # [N, 2, 6]
        Jw = J * w[:, None, None]
        H = jnp.einsum("nic,nid->cd", Jw, J, precision=xp.HIGHEST)
        g = jnp.einsum("nic,ni->c", Jw, r, precision=xp.HIGHEST)
        H = H + damping * jnp.eye(6, dtype=R.dtype) * jnp.maximum(
            jnp.max(jnp.diagonal(H)), 1.0
        )
        d = -jnp.linalg.solve(H, g)
        return (xp.matmul(so3.exp(d[:3]), R), t + d[3:]), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    return R, t


def pnp(
    X: jnp.ndarray, pn: jnp.ndarray, w: jnp.ndarray | None = None,
    refine_iters: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DLT + GN refinement. Returns (R, t)."""
    if w is None:
        w = jnp.ones(X.shape[0], X.dtype)
    R0, t0 = pnp_dlt(X, pn, w)
    return refine_pose(R0, t0, X, pn, w, iters=refine_iters)


def pnp_ransac(
    key: jax.Array,
    X: jnp.ndarray, pn: jnp.ndarray,
    *,
    n_hypotheses: int = 128,
    threshold: float = 1e-4,     # squared normalized-coord residual
    sample_size: int = 6,
    data_weights: jnp.ndarray | None = None,
):
    """RANSAC'd resection (SURVEY §3.3). Returns (R, t, inliers)."""
    from pysfm_tpu.frontend.ransac import ransac

    def fit(idx, w):
        R, t = pnp_dlt(X, pn, w)
        return jnp.concatenate([R.reshape(-1), t])

    def score(model):
        R = model[:9].reshape(3, 3)
        t = model[9:]
        p = jnp.einsum("ij,nj->ni", R, X, precision=xp.HIGHEST) + t
        pn_hat = p[:, :2] / p[:, 2:3]
        behind = p[:, 2] <= 0
        d = jnp.sum((pn_hat - pn) ** 2, axis=-1)
        # Large-but-finite so a model is not discarded outright when a few
        # (outlier) points land behind the camera.
        return jnp.where(behind, jnp.asarray(1e10, d.dtype), d)

    res = ransac(
        key, X.shape[0], fit, score,
        sample_size=sample_size, n_hypotheses=n_hypotheses,
        threshold=threshold, data_weights=data_weights,
    )
    R = res.model[:9].reshape(3, 3)
    t = res.model[9:]
    w_in = res.inliers.astype(X.dtype)
    R, t = refine_pose(R, t, X, pn, w_in)
    return R, t, res.inliers
