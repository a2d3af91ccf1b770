"""f32-exact contraction helpers for TPU.

On TPU, XLA's DEFAULT matmul precision truncates f32 operands to bf16
before the MXU pass (~0.4% relative error per product).  For the tiny
geometry matmuls (3x3 rotation chains, 2x3 Jacobian chains) and the
normal-equation / Schur accumulations, that error does not average out —
it shifts the LM fixed point and breaks the BASELINE parity target
(reprojection RMSE +-1e-6 vs the reference).  Measured on v5e:
``A[5000,2,3] @ R[5000,3,3]`` default precision errs 4e-2 vs f64; HIGHEST
errs 8e-7 (the f32 ideal).

Every contraction whose result feeds the optimizer state goes through
these helpers.  Throughput-critical contractions where bf16 rounding is
acceptable may use plain einsum deliberately — comment why at the site.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def einsum(subscripts: str, *operands, **kw):
    """``jnp.einsum`` pinned to f32-exact (HIGHEST) precision."""
    kw.setdefault("precision", HIGHEST)
    return jnp.einsum(subscripts, *operands, **kw)


def matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched ``a @ b`` pinned to f32-exact precision."""
    return jnp.matmul(a, b, precision=HIGHEST)


def matvec(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched ``A @ x`` for [..., m, n] @ [..., n] pinned to f32-exact."""
    return jnp.einsum("...ij,...j->...i", A, x, precision=HIGHEST)
