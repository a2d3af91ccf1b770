"""Evaluation metrics: trajectory alignment + ATE, reprojection RMSE.

BASELINE.json: "trajectories must match the reference pysfm solver within
its ATE bound on its synthetic and benchmark sequences" — ATE is computed
after a similarity (Sim(3)) alignment because monocular SfM is defined only
up to gauge (rotation/translation/scale).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pysfm_tpu.utils import precision as xp
import numpy as np


def umeyama(src: jnp.ndarray, dst: jnp.ndarray, with_scale: bool = True):
    """Least-squares similarity transform (s, R, t): dst ~ s R src + t.

    Umeyama (1991); closed-form via the SVD of the covariance.  [N,3] each.
    """
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = xp.matmul(dc.T, sc) / src.shape[0]
    U, D, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(xp.matmul(U, Vt)))
    S = jnp.ones(3, src.dtype).at[2].set(sgn)
    R = xp.matmul(U * S[None, :], Vt)
    if with_scale:
        var_s = jnp.mean(jnp.sum(sc * sc, axis=-1))
        s = jnp.sum(D * S) / jnp.maximum(var_s, 1e-18)
    else:
        s = jnp.asarray(1.0, src.dtype)
    t = mu_d - s * xp.matvec(R, mu_s)
    return s, R, t


def ate_rmse(
    traj_est: jnp.ndarray, traj_gt: jnp.ndarray, with_scale: bool = True
) -> jnp.ndarray:
    """Absolute trajectory error (RMSE of camera centers) after Sim(3)
    alignment of the estimate onto the ground truth."""
    s, R, t = umeyama(traj_est, traj_gt, with_scale)
    aligned = s * xp.matmul(traj_est, R.T) + t
    return jnp.sqrt(jnp.mean(jnp.sum((aligned - traj_gt) ** 2, axis=-1)))


def reprojection_rmse(problem) -> float:
    """RMSE (2-norm px) of the active observations of a BundleProblem."""
    from pysfm_tpu.problem import residuals

    r = np.asarray(residuals(problem))
    w = np.asarray(problem.obs_w) > 0
    return float(np.sqrt(np.mean(np.sum(r[w] ** 2, axis=-1))))


def camera_centers(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    from pysfm_tpu.geometry import se3

    return se3.camera_center(R, t)
