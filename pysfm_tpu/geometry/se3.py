"""SE(3) — rigid transforms as (R, t) pairs, batched.

The framework stores camera extrinsics world-to-camera: ``x_cam = R @ X + t``
(SURVEY §2 "Bundle / measurement model": Camera (K, R, t)).  We keep R as a
full 3x3 matrix in the state and apply minimal 6-DoF updates in the tangent
space, ``R <- exp([dw]x) @ R; t <- t + dt`` (left perturbation), matching the
reference's update convention (SURVEY §3.1 "apply_update").
"""

from __future__ import annotations

import jax.numpy as jnp

from pysfm_tpu.geometry import so3
from pysfm_tpu.utils import precision as xp


def transform(R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply world->camera transform: [..., 3, 3], [..., 3], [..., 3] -> [..., 3]."""
    return xp.matvec(R, X) + t


def inverse(R: jnp.ndarray, t: jnp.ndarray):
    """Inverse transform: (R, t) -> (R^T, -R^T t)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -xp.matvec(Rt, t)


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) o (Rb, tb): first apply b, then a."""
    return xp.matmul(Ra, Rb), xp.matvec(Ra, tb) + ta


def camera_center(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Camera center in world coordinates: C = -R^T t."""
    return -jnp.einsum("...ji,...j->...i", R, t, precision=xp.HIGHEST)


def retract(R, t, dw, dt):
    """Left-perturbation 6-DoF update used by the LM solver."""
    return xp.matmul(so3.exp(dw), R), t + dt


def exp(xi: jnp.ndarray):
    """SE(3) exponential of twist xi = (w, v): [..., 6] -> (R, t).

    Uses the closed-form left Jacobian V so that exp is exact (not the
    first-order retract used inside LM).
    """
    w, v = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    R = so3.exp(w)
    a, b = so3._exp_coefs(theta_sq)
    # V = I + B*W + C*W^2 with C = (1 - A)/theta^2 (small-angle safe).
    small = theta_sq < so3._SMALL_SQ
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    c_exact = (1.0 - a) / safe_sq
    c_taylor = 1.0 / 6.0 - theta_sq / 120.0
    c = jnp.where(small, c_taylor, c_exact)
    W = so3.hat(w)
    V = (
        jnp.eye(3, dtype=xi.dtype)
        + b[..., None, None] * W
        + c[..., None, None] * xp.matmul(W, W)
    )
    return R, xp.matvec(V, v)
