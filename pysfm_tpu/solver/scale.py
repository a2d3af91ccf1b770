"""BAL-scale normal-equation build: obs-chunked, scatter-free, O(M) memory.

This is the build path for BASELINE config 4 (Venice: 1.7k cams, 1M points,
~5M observations), where the small-problem builders break down:

- :func:`pysfm_tpu.solver.schur.build_normal_equations`'s camera-side
  one-hot reduction materializes an ``[M, C]`` operand (34 GB at Venice
  scale) and costs ``M*C*D`` MXU flops;
- materializing the full Jacobians ``J_cam [M, 2, CP]`` / ``J_pt [M, 2, 3]``
  plus their products peaks at several GB of HBM that the LM while_loop
  holds across the iteration.

Here the residual/Jacobian build runs as a ``lax.map`` over observation
chunks (SURVEY §5 "obs-chunked accumulation to bound VMEM"; the map lowers
to a sequential scan, so only one chunk's Jacobians ever exist), emitting a
compact per-observation payload:

- ``B [M, CP, 3]``           coupling blocks (kept: the PCG operand),
- ``cam_rows [M, CP(CP+3)/2]`` packed symmetric ``w Jc^T Jc`` + ``Jc^T w r``,
- ``pt_rows [M, 9]``           packed symmetric ``w Jp^T Jp`` + ``Jp^T w r``.

Both block reductions then run in the **gathered (table) domain** — one
row-gather through the padded ``cam_obs`` / ``pt_obs`` visibility tables
followed by a masked sum over the track axis.  No ``segment_sum`` (TPU
scatter-adds serialize), no one-hot matmuls, every op memory-bound with
static shapes.

The result is numerically the same NormalEqs the small-problem builders
produce (same per-observation products, different — but fixed — summation
order); equality is asserted in f64 by ``tests/test_scale.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pysfm_tpu.geometry import projection
from pysfm_tpu.problem import problem as problem_mod
from pysfm_tpu.problem import robust as robust_mod
from pysfm_tpu.solver import schur
from pysfm_tpu.utils import precision as xp


def _tri_pairs(cp: int):
    return [(d, e) for d in range(cp) for e in range(d + 1)]


def _payload(p: problem_mod.BundleProblem, oc, op, uv, w_conf):
    """Per-observation payload for one chunk (or the whole problem)."""
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
    B = xp.einsum("mic,mip->mcp", J_cam, wJp)                # [m, CP, 3]

    hcc = xp.einsum("mic,mid->mcd", J_cam, J_cam * w[:, None, None])
    gc = xp.einsum("mic,mi->mc", J_cam, wr)                  # [m, CP]
    tri = _tri_pairs(cp)
    dd = jnp.asarray([d for d, _ in tri])
    ee = jnp.asarray([e for _, e in tri])
    cam_rows = jnp.concatenate([hcc[:, dd, ee], gc], axis=-1)

    hpp = xp.einsum("mip,miq->mpq", J_pt, wJp)
    gp = xp.einsum("mip,mi->mp", J_pt, wr)
    tri3 = _tri_pairs(3)
    d3 = jnp.asarray([d for d, _ in tri3])
    e3 = jnp.asarray([e for _, e in tri3])
    pt_rows = jnp.concatenate([hpp[:, d3, e3], gp], axis=-1)  # [m, 9]
    return B, cam_rows, pt_rows


def _unpack_sym(rows: jnp.ndarray, cp: int) -> jnp.ndarray:
    """[N, cp(cp+1)/2] packed lower-tri -> [N, cp, cp] symmetric blocks."""
    out = jnp.zeros(rows.shape[:-1] + (cp, cp), rows.dtype)
    for i, (d, e) in enumerate(_tri_pairs(cp)):
        out = out.at[..., d, e].set(rows[..., i])
        if d != e:
            out = out.at[..., e, d].set(rows[..., i])
    return out


@partial(jax.jit, static_argnames=("obs_chunk",))
def build_normal_equations_scale(
    p: problem_mod.BundleProblem, obs_chunk: int = 0
) -> schur.NormalEqs:
    """Scatter-free NormalEqs for the PCG path; ``obs_chunk`` > 0 bounds the
    Jacobian working set to one chunk (padded to a chunk multiple)."""
    M = p.n_obs
    cp = p.cam_dof
    # The payload ALWAYS runs through the chunked lax.map, even when a
    # single chunk covers the problem: on the axon TPU platform, fusing the
    # full [M, ...] payload einsums directly with the downstream CG loop
    # miscompiles (silently corrupted rhs/M_inv buffers; CPU-verified
    # correct) — the sequential map plus the optimization_barriers in
    # solver/pcg.py and solver/lm.py keep the program in the shape the
    # compiler handles correctly, and are what we want for memory anyway.
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
    B, cam_rows, pt_rows = jax.lax.map(
        lambda args: _payload(p, *args), (oc, op, uv, wc)
    )
    B = B.reshape(m_pad, cp, 3)[:M]
    cam_rows = cam_rows.reshape(m_pad, -1)[:M]
    pt_rows = pt_rows.reshape(m_pad, -1)[:M]

    # Camera-side reduction through the cam_obs table (gather + masked sum).
    cmask = p.cam_obs_mask.astype(B.dtype)
    cred = jnp.sum(cam_rows[p.cam_obs] * cmask[..., None], axis=1)  # [C, Rc]
    n_tri = cp * (cp + 1) // 2
    Hcc = _unpack_sym(cred[:, :n_tri], cp)
    g_c = cred[:, n_tri:]

    # Point-side reduction through the pt_obs table.
    pmask = p.pt_obs_mask.astype(B.dtype)
    pred = jnp.sum(pt_rows[p.pt_obs] * pmask[..., None], axis=1)    # [P, 9]
    Hpp = _unpack_sym(pred[:, :6], 3)
    g_p = pred[:, 6:]
    # Materialization fence: keeps XLA from fusing the payload/reduction
    # graph into the downstream CG while_loop, which miscompiles on the
    # axon TPU platform (see the chunking note above).
    return jax.lax.optimization_barrier(
        schur.NormalEqs(Hcc=Hcc, Hpp=Hpp, g_c=g_c, g_p=g_p, B=B)
    )
