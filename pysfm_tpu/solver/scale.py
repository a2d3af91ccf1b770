"""BAL-scale normal-equation build: obs-chunked, scatter-free, component-
major, O(M) memory.

This is the build path for BASELINE config 4 (Venice: 1.7k cams, 1M points,
~5M observations), where the small-problem builders break down:

- :func:`pysfm_tpu.solver.schur.build_normal_equations`'s camera-side
  one-hot reduction materializes an ``[M, C]`` operand (34 GB at Venice
  scale) and costs ``M*C*D`` MXU flops;
- materializing the full Jacobians ``J_cam [M, 2, CP]`` / ``J_pt [M, 2, 3]``
  plus their products peaks at several GB of HBM that the LM while_loop
  holds across the iteration.

**Layout rule (learned the hard way on v5e):** every array whose leading
axis is observation/point-sized must keep that big axis MINOR (last).  The
TPU tiles the two minor dims of every buffer to an (8, 128) vreg, so a
block array like ``B [M, CP, 3]`` pads its (6, 3) tail to (8, 128) — a 49 GB
allocation at Venice scale for 360 MB of payload.  Component-major ``[3*CP,
M]`` rows tile densely.  The same rule shapes every gathered table below.

The residual/Jacobian build runs as a ``lax.map`` over observation chunks
(SURVEY §5 "obs-chunked accumulation to bound VMEM"; the map lowers to a
sequential scan, so only one chunk's Jacobians ever exist), emitting compact
component-major per-observation rows:

- ``B_cm [3*CP, M]``   coupling blocks, row ``s*CP + d`` = B(d, s)
  (kept: the PCG operand),
- ``cam_rows [CP(CP+3)/2, M]`` packed symmetric ``w Jc^T Jc`` + ``Jc^T w r``,
- ``pt_rows [9, M]``           packed symmetric ``w Jp^T Jp`` + ``Jp^T w r``.

Both block reductions then run in the **gathered (table) domain** — one
row-gather through the padded ``cam_obs`` / ``pt_obs`` visibility tables
followed by a masked sum over the track axis.  No ``segment_sum`` (TPU
scatter-adds serialize), no one-hot matmuls, every op memory-bound with
static shapes.

The result is numerically the same normal equations the small-problem
builders produce (same per-observation products, different — but fixed —
summation order); equality is asserted in f64 by ``tests/test_scale.py``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pysfm_tpu.geometry import projection
from pysfm_tpu.problem import problem as problem_mod
from pysfm_tpu.problem import robust as robust_mod
from pysfm_tpu.utils import precision as xp

# Lower-triangular 3x3 component order used throughout (matches schur_cm).
TRI3 = ((0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (2, 2))


class ScaleEqs(NamedTuple):
    """Component-major undamped normal equations for the BAL-scale path."""

    Hcc: jnp.ndarray    # [C, CP, CP] (dense, symmetric; small)
    g_c: jnp.ndarray    # [C, CP]
    hpp6: jnp.ndarray   # [6, P] lower-tri point blocks (00,10,11,20,21,22)
    g_p: jnp.ndarray    # [3, P]
    B_cm: jnp.ndarray   # [3*CP, M]; row s*CP+d = sum_i Jc[i,d] w Jp[i,s]


def _tri_pairs(cp: int):
    return [(d, e) for d in range(cp) for e in range(d + 1)]


def _payload_cm(p: problem_mod.BundleProblem, oc, op, uv, w_conf):
    """Component-major per-observation payload for one chunk.

    Returns (B_cm [3*CP, m], cam_rows [Rc, m], pt_rows [9, m]) with
    Rc = CP*(CP+1)/2 + CP (Hcc lower triangle, then g_c)."""
    Rg = p.R[oc]
    tg = p.t[oc]
    ig = p.intr[oc]
    Xg = p.X[op]
    uvh, J_cam, J_pt = projection.project_with_jac(
        p.camera_model, Rg, tg, ig, Xg
    )
    r = uvh - uv
    s = jnp.sum(r * r, axis=-1)
    w = w_conf * robust_mod.weight(p.robust, s, p.robust_scale)
    free = jnp.logical_not(p.cam_fixed)[oc]
    J_cam = J_cam * free[:, None, None].astype(J_cam.dtype)

    cp = J_cam.shape[2]
    wJp = J_pt * w[:, None, None]
    wr = r * w[:, None]
    # B(d, s) rows, s-major: [3, CP, m] -> [3*CP, m].
    B_cm = xp.einsum("mic,mip->pcm", J_cam, wJp).reshape(3 * cp, -1)

    hcc = xp.einsum("mic,mid->cdm", J_cam, J_cam * w[:, None, None])
    gc = xp.einsum("mic,mi->cm", J_cam, wr)                  # [CP, m]
    tri = _tri_pairs(cp)
    cam_rows = jnp.concatenate(
        [jnp.stack([hcc[d, e] for d, e in tri]), gc], axis=0
    )                                                        # [Rc, m]

    hpp = xp.einsum("mip,miq->pqm", J_pt, wJp)
    gp = xp.einsum("mip,mi->pm", J_pt, wr)                   # [3, m]
    pt_rows = jnp.concatenate(
        [jnp.stack([hpp[d, e] for d, e in TRI3]), gp], axis=0
    )                                                        # [9, m]
    return B_cm, cam_rows, pt_rows


def _unpack_sym(rows: jnp.ndarray, cp: int) -> jnp.ndarray:
    """[N_tri, C] packed lower-tri rows -> [C, cp, cp] symmetric blocks."""
    out = jnp.zeros((rows.shape[1], cp, cp), rows.dtype)
    for i, (d, e) in enumerate(_tri_pairs(cp)):
        out = out.at[:, d, e].set(rows[i])
        if d != e:
            out = out.at[:, e, d].set(rows[i])
    return out


@partial(jax.jit, static_argnames=("obs_chunk",))
def build_normal_equations_scale(
    p: problem_mod.BundleProblem, obs_chunk: int = 0
) -> ScaleEqs:
    """Scatter-free component-major normal equations for the PCG path;
    ``obs_chunk`` > 0 bounds the Jacobian working set to one chunk (padded
    to a chunk multiple)."""
    M = p.n_obs
    cp = p.cam_dof
    # The payload ALWAYS runs through the chunked lax.map, even when a
    # single chunk covers the problem: on the axon TPU platform, fusing the
    # full [M, ...] payload einsums directly with the downstream CG loop
    # miscompiles (silently corrupted rhs/M_inv buffers; CPU-verified
    # correct) — the sequential map plus the optimization_barriers between
    # build -> system -> CG keep the program in the shape the compiler
    # handles correctly, and are what we want for memory anyway.
    obs_chunk = min(obs_chunk or (1 << 18), M)
    n_chunks = -(-M // obs_chunk)
    m_pad = n_chunks * obs_chunk
    pad = m_pad - M

    def padded(x, fill=0):
        if pad == 0:
            return x
        widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    # Padding slots carry obs_w = 0, so every payload row is zero.
    oc = padded(p.obs_cam).reshape(n_chunks, obs_chunk)
    op = padded(p.obs_pt).reshape(n_chunks, obs_chunk)
    uv = padded(p.obs_uv).reshape(n_chunks, obs_chunk, 2)
    wc = padded(p.obs_w).reshape(n_chunks, obs_chunk)
    B_cm, cam_rows, pt_rows = jax.lax.map(
        lambda args: _payload_cm(p, *args), (oc, op, uv, wc)
    )
    # [n_chunks, D, m] -> [D, M]: chunk axis folds into the minor axis.
    def unchunk(x):
        return x.transpose(1, 0, 2).reshape(x.shape[1], m_pad)[:, :M]

    B_cm = unchunk(B_cm)
    cam_rows = unchunk(cam_rows)
    pt_rows = unchunk(pt_rows)

    # Camera-side reduction through the cam_obs table: gather the rows into
    # the [C, Kc] grid (big axes in the two minor positions) + masked sum.
    cmask = p.cam_obs_mask.astype(B_cm.dtype)                 # [C, Kc]
    cred = jnp.sum(cam_rows[:, p.cam_obs] * cmask, axis=-1)   # [Rc, C]
    n_tri = cp * (cp + 1) // 2
    Hcc = _unpack_sym(cred[:n_tri], cp)
    g_c = cred[n_tri:].T                                      # [C, CP]

    # Point-side reduction through the pt_obs table, track axis leading so
    # the point axis stays minor: [9, K, P] -> [9, P].
    pmask_t = p.pt_obs_mask.T.astype(B_cm.dtype)              # [K, P]
    pred = jnp.sum(pt_rows[:, p.pt_obs.T] * pmask_t, axis=1)  # [9, P]
    hpp6 = pred[:6]
    g_p = pred[6:]
    # Materialization fence: keeps XLA from fusing the payload/reduction
    # graph into the downstream CG while_loop, which miscompiles on the
    # axon TPU platform (see the chunking note above).
    return jax.lax.optimization_barrier(
        ScaleEqs(Hcc=Hcc, g_c=g_c, hpp6=hpp6, g_p=g_p, B_cm=B_cm)
    )


def sym6_inv(h6: jnp.ndarray) -> jnp.ndarray:
    """Inverse of symmetric 3x3 blocks in 6-component form ([6, N])."""
    a, b, c, d, e, f = h6
    adj00 = c * f - e * e
    adj10 = d * e - b * f
    adj20 = b * e - c * d
    adj11 = a * f - d * d
    adj21 = b * d - a * e
    adj22 = a * c - b * b
    det = a * adj00 + b * adj10 + d * adj20
    inv_det = 1.0 / det
    return jnp.stack([adj00, adj10, adj11, adj20, adj21, adj22]) * inv_det


def sym6_mv(h6: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[6, N] symmetric blocks times [3, N] vectors -> [3, N]."""
    a, b, c, d, e, f = h6
    return jnp.stack([
        a * v[0] + b * v[1] + d * v[2],
        b * v[0] + c * v[1] + e * v[2],
        d * v[0] + e * v[1] + f * v[2],
    ])


def augment6(h6: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """LM damping of lower-tri point blocks with unit fill on zero diagonals
    (padding / unobserved points) — matches schur.augment_block_diag."""
    def aug(x):
        return x + lam * x + jnp.where(x == 0, jnp.ones_like(x), 0.0)

    return jnp.stack(
        [aug(h6[0]), h6[1], aug(h6[2]), h6[3], h6[4], aug(h6[5])]
    )


@partial(jax.jit, static_argnames=("obs_chunk",))
def cost_scale(
    p: problem_mod.BundleProblem, obs_chunk: int = 0
) -> jnp.ndarray:
    """Robust cost, obs-chunked.  The unchunked
    :func:`problem.cost` gathers ``R[obs_cam] [M, 3, 3]`` — whose (3, 3)
    tail tiles to (8, 128), a 20 GB buffer at Venice scale that crashes the
    worker; here the gather lives one chunk at a time inside ``lax.map``."""
    M = p.n_obs
    obs_chunk = min(obs_chunk or (1 << 18), M)
    n_chunks = -(-M // obs_chunk)
    pad = n_chunks * obs_chunk - M

    def padded(x):
        if pad == 0:
            return x
        widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, widths)

    oc = padded(p.obs_cam).reshape(n_chunks, obs_chunk)
    op = padded(p.obs_pt).reshape(n_chunks, obs_chunk)
    uv = padded(p.obs_uv).reshape(n_chunks, obs_chunk, 2)
    wc = padded(p.obs_w).reshape(n_chunks, obs_chunk)

    def chunk_cost(args):
        oci, opi, uvi, wi = args
        uvh = projection.project(
            p.camera_model, p.R[oci], p.t[oci], p.intr[oci], p.X[opi]
        )
        r = uvh - uvi
        s = jnp.sum(r * r, axis=-1)
        return jnp.sum(wi * robust_mod.rho(p.robust, s, p.robust_scale))

    parts = jax.lax.map(chunk_cost, (oc, op, uv, wc))
    return 0.5 * jnp.sum(parts)


def predicted_reduction_scale(
    eqs: ScaleEqs,
    lam: jnp.ndarray,
    dc: jnp.ndarray,
    dp: jnp.ndarray,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Same LM model-reduction formula as schur.predicted_reduction, from
    the component-major containers.  ``dc [C, CP]``, ``dp [P, 3]``."""
    Hcc, g_c = eqs.Hcc, eqs.g_c
    if axis_name is not None:
        Hcc = jax.lax.psum(Hcc, axis_name)
        g_c = jax.lax.psum(g_c, axis_name)
    d_cc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
    d_pp = jnp.stack([eqs.hpp6[0], eqs.hpp6[2], eqs.hpp6[5]], axis=-1)
    fill_c = jnp.where(d_cc == 0, 1.0, 0.0)
    fill_p = jnp.where(d_pp == 0, 1.0, 0.0)
    cam_term = jnp.sum((lam * d_cc + fill_c) * dc * dc) - jnp.sum(dc * g_c)
    pt_term = (
        jnp.sum((lam * d_pp + fill_p) * dp * dp) - jnp.sum(dp * eqs.g_p.T)
    )
    if axis_name is not None:
        pt_term = jax.lax.psum(pt_term, axis_name)
    return 0.5 * (cam_term + pt_term)
