"""Robust reprojection cost kernels (IRLS form).

Reference analog (SURVEY §2 "Robust sensor models"): ``GaussianModel`` and
``CauchyModel`` supplying per-residual cost and reweighting; Huber is in the
target set per SURVEY/BASELINE ("Huber/Cauchy reweighting").

Convention: for each observation with squared residual norm
``s = ||r||^2`` the robustified cost is ``0.5 * rho(s)`` and the IRLS
weight applied to the Gauss-Newton normal equations is ``w = rho'(s)``
(first-order / "classic IRLS" robustification — no Triggs second-order
correction; the NumPy oracle in tests/oracle_numpy.py uses the identical
convention so parity checks are exact).

All functions are elementwise and batched; ``kernel`` is a static string so
the choice compiles away under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

KERNELS = ("gaussian", "huber", "cauchy")


def _check(kernel: str) -> None:
    if kernel not in KERNELS:
        raise ValueError(f"unknown robust kernel {kernel!r}; expected one of {KERNELS}")


def rho(kernel: str, s: jnp.ndarray, scale) -> jnp.ndarray:
    """Robust loss of the squared residual s (>= 0). ``scale`` is the knee c."""
    _check(kernel)
    if kernel == "gaussian":
        return s
    c2 = scale * scale
    if kernel == "huber":
        # rho(s) = s for s <= c^2, else 2 c sqrt(s) - c^2
        safe = jnp.maximum(s, c2)  # only used in the outlier branch
        return jnp.where(s <= c2, s, 2.0 * scale * jnp.sqrt(safe) - c2)
    # cauchy: c^2 log(1 + s / c^2)
    return c2 * jnp.log1p(s / c2)


def weight(kernel: str, s: jnp.ndarray, scale) -> jnp.ndarray:
    """IRLS weight rho'(s); multiplies J^T J and J^T r blocks."""
    _check(kernel)
    if kernel == "gaussian":
        return jnp.ones_like(s)
    c2 = scale * scale
    if kernel == "huber":
        safe = jnp.maximum(s, c2)
        return jnp.where(s <= c2, jnp.ones_like(s), scale / jnp.sqrt(safe))
    return 1.0 / (1.0 + s / c2)
