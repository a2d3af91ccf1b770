"""P3P — minimal 3-point absolute pose (Grunert's formulation).

The minimal resection solver for PnP-RANSAC: a 3-point sample keeps the
all-inlier probability high at low inlier ratios where the 6-point DLT
sample collapses (SURVEY §3.3 "RANSAC'd PnP").

TPU-native design: the Grunert system is reduced to a single quartic whose
coefficients are built by static polynomial arithmetic, and the quartic is
solved in closed form (Ferrari) with complex64/128 elementwise ops — no
``eigvals`` (unsupported on TPU), no iteration, fully ``vmap``-able across
RANSAC hypotheses.  Each sample yields up to 4 candidate poses; invalid
candidates come back as NaN and are discarded by scoring.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pysfm_tpu.utils import precision as xp


def solve_quartic(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (Ferrari) roots of c4 x^4 + c3 x^3 + c2 x^2 + c1 x + c0.

    ``coeffs = [c4, c3, c2, c1, c0]`` real; returns 4 complex roots.
    Degenerate leading coefficients produce NaNs (callers filter).
    """
    c4, c3, c2, c1, c0 = [coeffs[i] for i in range(5)]
    cdtype = jnp.complex128 if coeffs.dtype == jnp.float64 else jnp.complex64
    a = (c3 / c4).astype(cdtype)
    b = (c2 / c4).astype(cdtype)
    c = (c1 / c4).astype(cdtype)
    d = (c0 / c4).astype(cdtype)

    # Depressed quartic y^4 + p y^2 + q y + r with x = y - a/4.
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a * a * a / 8.0
    r = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * a ** 4 / 256.0

    # Resolvent cubic z^3 - p z^2 - 4 r z + (4 p r - q^2) = 0: one root via
    # Cardano in complex arithmetic.
    A = -p
    B = -4.0 * r
    C = 4.0 * p * r - q * q
    # t^3 + P t + Q with z = t - A/3.
    P = B - A * A / 3.0
    Q = C - A * B / 3.0 + 2.0 * A ** 3 / 27.0
    disc = (Q / 2.0) ** 2 + (P / 3.0) ** 3
    sq = jnp.sqrt(disc)

    def _cbrt(w):
        # Principal complex cube root, safe at 0.
        mag = jnp.abs(w)
        safe = jnp.where(mag == 0, jnp.asarray(1.0, cdtype), w)
        out = jnp.exp(jnp.log(safe) / 3.0)
        return jnp.where(mag == 0, jnp.asarray(0.0, cdtype), out)

    u = _cbrt(-Q / 2.0 + sq)
    # Avoid catastrophic cancellation: v = -P/(3u) unless u ~ 0.
    u_safe = jnp.where(jnp.abs(u) < 1e-30, jnp.asarray(1.0, cdtype), u)
    v = jnp.where(
        jnp.abs(u) < 1e-30, _cbrt(-Q / 2.0 - sq), -P / (3.0 * u_safe)
    )
    t1 = u + v
    z = t1 - A / 3.0

    # Factor into two quadratics: y^2 +- m y + (z/2 -+ q/(2m)).
    m2 = z - p
    m = jnp.sqrt(m2)
    small_m = jnp.abs(m) < 1e-12
    m_safe = jnp.where(small_m, jnp.asarray(1.0, cdtype), m)
    # If m ~ 0 the quartic is biquadratic: y^2 = (-p +- sqrt(p^2 - 4 r))/2.
    s_bi = jnp.sqrt(p * p - 4.0 * r)
    alpha_bi = (-p + s_bi) / 2.0
    beta_bi = (-p - s_bi) / 2.0

    alpha = z / 2.0 - q / (2.0 * m_safe)
    beta = z / 2.0 + q / (2.0 * m_safe)
    d1 = jnp.sqrt(m * m - 4.0 * alpha)
    d2 = jnp.sqrt(m * m - 4.0 * beta)
    roots_gen = jnp.stack(
        [
            (-m + d1) / 2.0,
            (-m - d1) / 2.0,
            (m + d2) / 2.0,
            (m - d2) / 2.0,
        ]
    )
    roots_bi = jnp.stack(
        [
            jnp.sqrt(alpha_bi),
            -jnp.sqrt(alpha_bi),
            jnp.sqrt(beta_bi),
            -jnp.sqrt(beta_bi),
        ]
    )
    y = jnp.where(small_m, roots_bi, roots_gen)
    return y - (a / 4.0)


def _poly_mul(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Multiply polynomials given low-to-high coefficient vectors."""
    return jnp.convolve(p1, p2)


def p3p(
    X: jnp.ndarray,    # [3, 3] world points
    pn: jnp.ndarray,   # [3, 2] normalized image coords (pinhole)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grunert P3P: up to 4 poses.  Returns (R [4,3,3], t [4,3]); invalid
    slots are NaN.

    Derivation (SURVEY §2 epipolar/resection capability): with unit
    bearings f_i and side lengths a=|P2P3|, b=|P1P3|, c=|P1P2|, the depth
    ratios u=s2/s1, v=s3/s1 satisfy two quadrics; eliminating u yields a
    quartic in v built here with exact polynomial arithmetic.
    """
    dtype = X.dtype
    ones = jnp.ones((3, 1), dtype)
    f = jnp.concatenate([pn, ones], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)     # [3, 3] bearings

    a2 = jnp.sum((X[1] - X[2]) ** 2)
    b2 = jnp.sum((X[0] - X[2]) ** 2)
    c2 = jnp.sum((X[0] - X[1]) ** 2)
    ca = jnp.dot(f[1], f[2])   # cos(alpha), opposite side a
    cb = jnp.dot(f[0], f[2])
    cg = jnp.dot(f[0], f[1])

    A = a2 / b2
    Bc = c2 / b2
    # S(v) = 1 - 2 cb v + v^2 ; N(v) = (1 + (A - Bc)) + (-(A - Bc) 2 cb) v
    # + ((A - Bc) - 1) v^2 ; D(v) = 2 cg - 2 ca v ; substituting u = N/D
    # into 1 + u^2 - 2 u cg = Bc S gives the quartic
    # N^2 - 2 cg N D + D^2 - Bc S D^2 = 0.
    S = jnp.stack([jnp.ones_like(cb), -2.0 * cb, jnp.ones_like(cb)])
    AB = A - Bc
    N = jnp.stack([1.0 + AB, -2.0 * cb * AB, AB - 1.0])
    D = jnp.stack([2.0 * cg, -2.0 * ca])
    NN = _poly_mul(N, N)                       # degree 4 (5 coeffs)
    ND = _poly_mul(N, D)                       # degree 3
    DD = _poly_mul(D, D)                       # degree 2
    SDD = _poly_mul(S, DD)                     # degree 4
    quartic = NN - Bc * SDD
    quartic = quartic.at[:4].add(-2.0 * cg * ND)
    quartic = quartic.at[:3].add(DD)
    # solve_quartic expects high-to-low.
    roots = solve_quartic(quartic[::-1])

    real = jnp.abs(roots.imag) < 1e-6 * (jnp.abs(roots.real) + 1.0)
    v = roots.real.astype(dtype)
    valid = jnp.logical_and(real, v > 1e-6)

    def pose_from_v(vk, ok):
        Nv = N[0] + N[1] * vk + N[2] * vk * vk
        Dv = D[0] + D[1] * vk
        u = Nv / jnp.where(jnp.abs(Dv) < 1e-12, 1e-12, Dv)
        s1sq = b2 / jnp.maximum(1.0 - 2.0 * cb * vk + vk * vk, 1e-12)
        s1 = jnp.sqrt(s1sq)
        s2 = u * s1
        s3 = vk * s1
        ok = jnp.logical_and(ok, jnp.logical_and(s2 > 0, s3 > 0))
        Q = jnp.stack([s1, s2, s3])[:, None] * f                # camera pts
        # Absolute orientation from 3 correspondences (Horn / Procrustes).
        mx = jnp.mean(X, axis=0)
        mq = jnp.mean(Q, axis=0)
        H = xp.matmul((Q - mq).T, (X - mx))
        U, _, Vt = jnp.linalg.svd(H)
        dets = jnp.linalg.det(xp.matmul(U, Vt))
        fix = jnp.ones(3, dtype).at[2].set(dets)
        R = xp.matmul(U * fix[None, :], Vt)
        t = mq - xp.matvec(R, mx)
        nan = jnp.asarray(jnp.nan, dtype)
        return (
            jnp.where(ok, R, nan),
            jnp.where(ok, t, nan),
        )

    Rs, ts = jax.vmap(pose_from_v)(v, valid)
    return Rs, ts


def p3p_ransac(
    key: jax.Array,
    X: jnp.ndarray,     # [N, 3]
    pn: jnp.ndarray,    # [N, 2]
    *,
    n_hypotheses: int = 256,
    threshold: float = 1e-4,
    data_weights: jnp.ndarray | None = None,
    refine_iters: int = 8,
):
    """RANSAC resection with the P3P minimal solver (4 models/sample scored
    in parallel), followed by GN refinement on the inliers.

    Returns (R, t, inliers).
    """
    from pysfm_tpu.frontend.pnp import refine_pose

    n = X.shape[0]
    if data_weights is None:
        data_weights = jnp.ones((n,), X.dtype)
    keys = jax.random.split(key, n_hypotheses)

    def one(kh):
        idx = jax.random.choice(
            kh, n, shape=(3,), replace=False,
            p=data_weights / jnp.sum(data_weights),
        )
        Rs, ts = p3p(X[idx], pn[idx])           # [4, 3, 3], [4, 3]

        def score(R, t):
            p = jnp.einsum("ij,nj->ni", R, X, precision=xp.HIGHEST) + t
            pn_hat = p[:, :2] / p[:, 2:3]
            d = jnp.sum((pn_hat - pn) ** 2, axis=-1)
            d = jnp.where(p[:, 2] <= 0, jnp.asarray(1e10, d.dtype), d)
            finite = jnp.all(jnp.isfinite(R))
            inl = jnp.logical_and(d < threshold, data_weights > 0)
            return jnp.where(finite, jnp.sum(inl), -1), inl

        counts, inls = jax.vmap(score)(Rs, ts)
        k = jnp.argmax(counts)
        return Rs[k], ts[k], counts[k], inls[k]

    Rs, ts, counts, inls = jax.vmap(one)(keys)
    best = jnp.argmax(counts)
    R0 = jnp.nan_to_num(Rs[best], nan=0.0)
    t0 = jnp.nan_to_num(ts[best], nan=0.0)
    inliers = inls[best]
    w_in = inliers.astype(X.dtype) * data_weights
    R, t = refine_pose(R0, t0, X, pn, w_in, iters=refine_iters)
    # Re-evaluate inliers under the refined pose.
    p = jnp.einsum("ij,nj->ni", R, X, precision=xp.HIGHEST) + t
    d = jnp.sum((p[:, :2] / p[:, 2:3] - pn) ** 2, axis=-1)
    d = jnp.where(p[:, 2] <= 0, jnp.asarray(1e10, d.dtype), d)
    inliers = jnp.logical_and(d < threshold, data_weights > 0)
    return R, t, inliers
