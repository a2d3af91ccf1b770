"""Pallas S-matvec kernels over the grouped observation layout.

The PCG reduced-camera solve is gather-bound on TPU: XLA lowers the two
index translations of every CG iteration (camera vector -> per-slot,
point vector -> per-slot) to ~0.4 G-index/s gathers, 10-50x off memory
speed at BAL scale (measured v5e, round 3).  Mosaic's fast indexed
primitive, ``tpu.dynamic_gather`` (= ``jnp.take_along_axis`` on a single
(8, 128) register), is vreg-local — so the problem layout
(:mod:`pysfm_tpu.problem.grouped`) re-sorts observations by
``(camera_group_128, point_chunk_2048, point)`` and these kernels run the
whole matvec with only vreg-local gathers and MXU one-hot contractions:

- ``hcpT_x_grouped`` (K_A): per block, the camera-vector fill is ONE
  lane-gather per component row (all cameras of a block share one
  128-camera group); the per-point sums are a segmented scan along the
  tile (points are sorted) whose run ends are routed to their chunk slot
  by a static rank-expansion; output is per-group partials with
  chunk-aligned windows (scalar-prefetched BlockSpec index maps).
- ``hcp_w_grouped`` (K_B): the point-vector fill gathers from the block's
  16-vreg chunk window; the camera-side reduction is a one-hot [128-cam]
  MXU contraction accumulated per group (output revisiting).

Everything data-dependent is a static host-precomputed table; the kernels
contain no data-dependent control flow.  SURVEY §2 "Pallas kernels
(native tier)": this is the Schur-path reduction kernel the BAL-scale
configs require.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pysfm_tpu.problem.grouped import BLK, CGRP, PCH

NSL = PCH // CGRP     # chunk slices (16)
SUB = BLK // CGRP     # sublanes per block tile (8)


@struct.dataclass
class GroupedOps:
    """Device-side grouped layout (static per problem) + per-LM-iteration
    coupling rows.  ``b_rows`` is [3*CP, NB, 8, 128] — the copy-B-ordered
    per-observation B blocks (zero at padding slots); everything else
    comes from :func:`pysfm_tpu.problem.grouped.build_grouped`."""

    b_rows: jnp.ndarray       # [3*CP, NB, SUB, CGRP] f32
    lcam: jnp.ndarray         # [NB, SUB, CGRP] i32
    lpt: jnp.ndarray          # [NB, SUB, CGRP] i32
    seg_start: jnp.ndarray    # [NB, SUB, CGRP] f32
    seg_end_pos: jnp.ndarray  # [NB, NSL, CGRP] i32
    block_group: jnp.ndarray  # [NB] i32
    block_chunk: jnp.ndarray  # [NB] i32
    cell_first: jnp.ndarray   # [NB] i32
    group_first: jnp.ndarray  # [NB] i32
    route: jnp.ndarray        # [NB] i32 bitmap: chunk slices receiving a
                              #   valid run end (dead slices are skipped)
    cell_mask: jnp.ndarray    # [G, NCH] f32
    group_mask: jnp.ndarray   # [G] f32
    order: jnp.ndarray        # [NB*BLK] i32 (into the point-sorted obs)
    # Static per-observation measurements in grouped order (pads: w = 0).
    gu: jnp.ndarray           # [NB, SUB, CGRP] f32 measured u
    gv: jnp.ndarray           # [NB, SUB, CGRP] f32 measured v
    gw: jnp.ndarray           # [NB, SUB, CGRP] f32 confidence weight
    # Longest valid point run — static bound for the segmented-scan shift
    # schedule (runs <= 2^k need only shifts 1..2^(k-1) and, when
    # <= CGRP, a single cross-row carry instead of a sublane scan).
    max_run: int = struct.field(pytree_node=False, default=BLK)
    # Blocks per grid step for the two-phase matvec kernels (K_A2/K_B2):
    # NB must be a multiple of it (make_grouped_ops pads the stream).
    # 1 = the single-block revisiting schedule (K_A/K_B).  The grid's
    # fixed cost is 0.95 us/step (ROOFLINE_r04 empty-kernel probe), ~1/3
    # of a block's total work — processing `superstep` blocks per step
    # amortizes it, which the revisiting output schedule cannot express
    # (blocks of one step may belong to different (group, chunk) cells);
    # the two-phase kernels instead emit per-block partials and reduce
    # them with one one-hot MXU matmul (VERDICT r4 next-round #2).
    superstep: int = struct.field(pytree_node=False, default=1)

    @property
    def n_blocks(self) -> int:
        return self.lcam.shape[0]

    @property
    def n_groups(self) -> int:
        return self.cell_mask.shape[0]

    @property
    def n_chunks(self) -> int:
        return self.cell_mask.shape[1]


def device_grouped(
    meta, b_rows: jnp.ndarray, u=None, v=None, w=None
) -> GroupedOps:
    """Put a host :class:`GroupedMeta` on device (b_rows supplied
    separately — it is per-LM-iteration data).  ``u``/``v``/``w`` are the
    ORIGINAL (point-sorted) per-obs measurement arrays; they are permuted
    into grouped order here (pads get w = 0)."""
    import numpy as np

    NB = meta.block_group.shape[0]

    def perm(a, fill=0.0):
        if a is None:
            return jnp.zeros((NB, SUB, CGRP), jnp.float32)
        a = np.asarray(a)
        out = np.full(meta.order.shape, fill, np.float32)
        real = meta.order >= 0
        out[real] = a[meta.order[real]]
        return jnp.asarray(out.reshape(NB, SUB, CGRP))

    return GroupedOps(
        b_rows=b_rows,
        lcam=jnp.asarray(meta.lcam.reshape(NB, SUB, CGRP)),
        lpt=jnp.asarray(meta.lpt.reshape(NB, SUB, CGRP)),
        seg_start=jnp.asarray(meta.seg_start.reshape(NB, SUB, CGRP)),
        seg_end_pos=jnp.asarray(meta.seg_end_pos),
        block_group=jnp.asarray(meta.block_group),
        block_chunk=jnp.asarray(meta.block_chunk),
        cell_first=jnp.asarray(meta.cell_first),
        group_first=jnp.asarray(meta.group_first),
        route=jnp.asarray(meta.route_rows),
        cell_mask=jnp.asarray(meta.cell_mask),
        group_mask=jnp.asarray(meta.group_mask),
        order=jnp.asarray(meta.order),
        gu=perm(u),
        gv=perm(v),
        gw=perm(w),
        max_run=int(meta.max_run),
    )


def _take1(a, idx):
    """Vreg-local lane gather: a, idx [SUB, CGRP] -> a[r, idx[r, l]]."""
    return jnp.take_along_axis(a, idx, axis=1)


def _f32(x):
    """Widen a coupling-row tile to f32 (no-op for f32 rows; a VPU cast
    for the opt-in bf16 rows — all arithmetic stays f32)."""
    return x if x.dtype == jnp.float32 else x.astype(jnp.float32)


def permute_b_rows(B_cm: jnp.ndarray, order: jnp.ndarray) -> jnp.ndarray:
    """Permute per-LM-iteration coupling rows ``B_cm [3*CP, M]`` (point-
    sorted order) into the grouped stream: returns [3*CP, NB, SUB, CGRP]
    with zeros at padding slots.  One XLA gather per LM iteration —
    amortized over the CG iterations that consume it."""
    M = B_cm.shape[1]
    Bp = jnp.concatenate(
        [B_cm, jnp.zeros((B_cm.shape[0], 1), B_cm.dtype)], axis=1
    )
    idx = jnp.where(order < 0, M, order)
    NB = order.shape[0] // BLK
    g = jax.lax.optimization_barrier(Bp[:, idx])
    return g.reshape(B_cm.shape[0], NB, SUB, CGRP)


# ---------------------------------------------------------------------------
# K_A: u_partial[g, s, chunk_window] = per-point sums of B^T x
# ---------------------------------------------------------------------------


def _scan_shifts(max_run: int):
    """Lane-shift schedule covering runs of ``max_run`` slots: after
    shifts 1, 2, ..., 2^(k-1) every lane has accumulated a prefix of
    length 2^k >= max_run."""
    shifts = []
    sh = 1
    while sh < min(max_run, CGRP):
        shifts.append(sh)
        sh *= 2
    return tuple(shifts) or (1,)


def _seg_scan(qrows, f0, max_run: int = BLK):
    """Segmented inclusive scan of per-observation rows in row-major obs
    order (points sorted within the block, run starts flagged by ``f0``);
    returns the scanned rows (same shapes).

    Rolled-in slots beyond the boundary contribute value 0 and flag 0:
    rv is value-masked, and a masked-in flag of 1 would corrupt the
    windowed-OR F that gates the cross-row carry.  ``max_run`` (static,
    the longest VALID run in the stream) bounds the shift schedule: BA
    track lengths are <= max_track (~12), so 4 lane shifts replace the
    generic 7, and a run spans at most one row boundary so a single
    cross-row carry replaces the 3-step sublane scan.  Pad runs may be
    longer; their values are zero and their ends are never routed, so
    under-scanning them is harmless (problem/grouped.py max_run note)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, CGRP), 1)
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)
    shifts = _scan_shifts(max_run)
    outs = []
    for q in qrows:
        v, F = q, f0
        for sh in shifts:
            rv = jnp.where(lane >= sh, pltpu.roll(v, sh, 1), 0.0)
            rF = jnp.where(lane >= sh, pltpu.roll(F, sh, 1), 0.0)
            v = v + rv * (1.0 - F)
            F = jnp.maximum(F, rF)
        rowv = v[:, CGRP - 1:CGRP]                   # [SUB, 1]
        if max_run > CGRP:
            rowF = F[:, CGRP - 1:CGRP]
            for sh in (1, 2, 4):
                rv = jnp.where(sub1 >= sh, pltpu.roll(rowv, sh, 0), 0.0)
                rf = jnp.where(sub1 >= sh, pltpu.roll(rowF, sh, 0), 0.0)
                rowv = rowv + rv * (1.0 - rowF)
                rowF = jnp.maximum(rowF, rf)
        carry = jnp.where(sub1 >= 1, pltpu.roll(rowv, 1, 0), 0.0)
        outs.append(v + carry * (1.0 - F))
    return outs


def _route_to_ref(o_ref, row0, vrows, posm, rt_bits):
    """Rank-expand scanned rows into their chunk-window slices, writing
    ONLY the slices that receive a valid run end (``rt_bits`` bitmap,
    scalar-prefetched): with sorted points a 1024-obs block spans ~2-4 of
    the 16 slices, so the dead-slice work — and the full-window
    read-modify-write the old implementation paid every block — is
    skipped.  ``o_ref`` block is [1, R, PCH]; rows are written at
    ``row0..row0+len(vrows)``."""
    n = len(vrows)
    for vv in range(NSL):
        @pl.when(((rt_bits >> vv) & 1) == 1)
        def _(vv=vv):
            pos1 = posm[vv:vv + 1]                   # [1, CGRP]
            pos8 = jnp.broadcast_to(pos1, (SUB, CGRP))
            lanei = jnp.where(pos8 < BLK, pos8 & (CGRP - 1), 0)
            subi = jnp.clip(pos8 >> 7, 0, SUB - 1)
            pieces = []
            for v in vrows:
                g1 = _take1(v, lanei)                # [SUB, CGRP]
                g2 = jnp.take_along_axis(g1, subi, axis=0)
                val = jnp.where(pos8 < BLK, g2, 0.0)
                # rows of val are identical by construction; collapse.
                pieces.append(jnp.max(val, axis=0, keepdims=True))
            add = jnp.concatenate(pieces, axis=0)    # [n, CGRP]
            sl = slice(vv * CGRP, (vv + 1) * CGRP)
            o_ref[0, row0:row0 + n, sl] = (
                o_ref[0, row0:row0 + n, sl] + add
            )


def _onehot_cam_reduce(rows, lc):
    """Per-camera sums of per-observation rows: rows is a list of [SUB,
    CGRP] values, ``lc`` the local camera ids; returns [CGRP, len(rows)]
    via per-sublane one-hot MXU contractions (cameras are NOT sorted
    within a block, so a scan cannot be used here)."""
    ciota = jax.lax.broadcasted_iota(jnp.int32, (CGRP, CGRP), 0)
    n = len(rows)
    Y = jnp.zeros((CGRP, n), jnp.float32)
    for i in range(SUB):
        ohT = (ciota == jnp.broadcast_to(lc[i:i + 1], (CGRP, CGRP))
               ).astype(jnp.float32)                      # [128c, 128m]
        qi = jnp.concatenate(
            [rows[r][i:i + 1] for r in range(n)], axis=0
        )                                                 # [n, 128m]
        Y = Y + jax.lax.dot_general(
            ohT, qi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return Y


def _ka_kernel(cp, max_run, bg, bc, cf, rt, x_ref, b_ref, lc_ref, ss_ref,
               se_ref, o_ref):
    b = pl.program_id(0)
    lc = lc_ref[0]                                   # [SUB, CGRP] i32
    xg = [_take1(x_ref[d], lc) for d in range(cp)]   # cp lane-gathers

    @pl.when(cf[b] == 1)
    def _():
        o_ref[0] = jnp.zeros((3, PCH), jnp.float32)

    qrows = []
    for s in range(3):
        q = _f32(b_ref[s * cp, 0]) * xg[0]
        for d in range(1, cp):
            q = q + _f32(b_ref[s * cp + d, 0]) * xg[d]
        qrows.append(q)
    vrows = _seg_scan(qrows, ss_ref[0], max_run)
    _route_to_ref(o_ref, 0, vrows, se_ref[0], rt[b])


def _auto_interpret() -> bool:
    """Pallas TPU kernels only compile on the TPU backends; everywhere
    else (host-CPU test meshes) fall back to interpret mode."""
    return jax.default_backend() not in ("tpu", "axon")


@partial(jax.jit, static_argnames=("cp", "interpret"))
def hcpT_x_grouped(
    ops: GroupedOps,
    x: jnp.ndarray,
    n_points_pad: int | None = None,
    *,
    cp: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """u = Hcp^T x in the grouped layout.

    ``x`` [C, CP] or [CP, C]-transposed handled by caller as [cp, C];
    returns u [3, NCH*PCH] (caller slices to [3, P])."""
    if interpret is None:
        interpret = _auto_interpret()
    G, NCH = ops.n_groups, ops.n_chunks
    NB = ops.n_blocks
    Cpad = G * CGRP
    x_p = jnp.zeros((cp, Cpad), x.dtype).at[:, : x.shape[1]].set(x)
    xrep = jnp.broadcast_to(x_p[:, None, :], (cp, SUB, Cpad))
    xrep = jax.lax.optimization_barrier(xrep)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((cp, SUB, CGRP),
                         lambda b, bg, bc, cf, rt: (0, 0, bg[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * cp, 1, SUB, CGRP),
                         lambda b, bg, bc, cf, rt: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, cf, rt: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, cf, rt: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NSL, CGRP), lambda b, bg, bc, cf, rt: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, PCH), lambda b, bg, bc, cf, rt: (bg[b], 0, bc[b]),
            memory_space=pltpu.VMEM,
        ),
    )
    upart = pl.pallas_call(
        partial(_ka_kernel, cp, ops.max_run),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, 3, NCH * PCH), jnp.float32),
        interpret=interpret,
    )(
        ops.block_group, ops.block_chunk, ops.cell_first, ops.route,
        xrep, ops.b_rows, ops.lcam, ops.seg_start, ops.seg_end_pos,
    )
    # Kill garbage in never-visited (group, chunk) windows, sum groups.
    m = ops.cell_mask[:, None, :, None]                    # [G,1,NCH,1]
    up = upart.reshape(G, 3, NCH, PCH)
    return jnp.sum(jnp.where(m > 0, up, 0.0), axis=0).reshape(3, NCH * PCH)


# ---------------------------------------------------------------------------
# K_B: y[cp, C] = camera sums of B w
# ---------------------------------------------------------------------------


def _chunk_fill(w_ref, lp, nrows):
    """Fill per-obs values from the block's chunk window: w_ref [nrows,
    PCH] VMEM ref, lp [SUB, CGRP] local point ids -> list of [SUB, CGRP]
    per-row fills (16-slice vreg-local gathers)."""
    out = [jnp.zeros((SUB, CGRP), jnp.float32) for _ in range(nrows)]
    for j in range(NSL):
        loc = lp - j * CGRP
        inb = jnp.logical_and(loc >= 0, loc < CGRP)
        locc = jnp.where(inb, loc, 0)
        for s in range(nrows):
            tab = jnp.broadcast_to(
                w_ref[s:s + 1, j * CGRP:(j + 1) * CGRP], (SUB, CGRP)
            )
            g = _take1(tab, locc)
            out[s] = out[s] + jnp.where(inb, g, 0.0)
    return out


def _kb_kernel(cp, bg, bc, gf, w_ref, b_ref, lp_ref, lc_ref, o_ref):
    b = pl.program_id(0)
    lp = lp_ref[0]                                  # [SUB, CGRP] i32
    lc = lc_ref[0]
    wg = _chunk_fill(w_ref, lp, 3)
    # q2[d] = sum_s B(d, s) wg[s]  (B rows are s-major: row s*cp + d).
    q2 = []
    for d in range(cp):
        acc = _f32(b_ref[d, 0]) * wg[0]
        for s in range(1, 3):
            acc = acc + _f32(b_ref[s * cp + d, 0]) * wg[s]
        q2.append(acc)
    # One-hot camera reduction on the MXU, accumulated transposed:
    # Y[c, d] += sum_m [lcam[m] == c] q2[d][m], per sublane row.
    Y = _onehot_cam_reduce(q2, lc)

    @pl.when(gf[b] == 1)
    def _():
        o_ref[:] = Y

    @pl.when(gf[b] == 0)
    def _():
        o_ref[:] = o_ref[:] + Y


@partial(jax.jit, static_argnames=("cp", "interpret", "n_cameras"))
def hcp_w_grouped(
    ops: GroupedOps,
    w3: jnp.ndarray,
    n_cameras: int,
    *,
    cp: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y = Hcp w in the grouped layout.  ``w3`` [3, P] (padded internally);
    returns y [cp, C]."""
    if interpret is None:
        interpret = _auto_interpret()
    G, NCH = ops.n_groups, ops.n_chunks
    NB = ops.n_blocks
    Ppad = NCH * PCH
    w_p = jnp.zeros((3, Ppad), w3.dtype).at[:, : w3.shape[1]].set(w3)
    w_p = jax.lax.optimization_barrier(w_p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((3, PCH), lambda b, bg, bc, gf: (0, bc[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * cp, 1, SUB, CGRP),
                         lambda b, bg, bc, gf: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, gf: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, gf: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CGRP, cp), lambda b, bg, bc, gf: (bg[b], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    ypartT = pl.pallas_call(
        partial(_kb_kernel, cp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * CGRP, cp), jnp.float32),
        interpret=interpret,
    )(
        ops.block_group, ops.block_chunk, ops.group_first,
        w_p, ops.b_rows, ops.lpt, ops.lcam,
    )
    gm = jnp.repeat(ops.group_mask, CGRP)[:, None]         # [G*128, 1]
    y = jnp.where(gm > 0, ypartT, 0.0).T                   # [cp, G*128]
    return y[:, :n_cameras]


# ---------------------------------------------------------------------------
# K_A2 / K_B2: two-phase superstep matvec schedule
#
# The single-block kernels above are grid-overhead bound: 0.95 us of the
# ~3 us per grid step is fixed cost (ROOFLINE_r04), and the revisiting
# output windows (accumulate into the block's (group, chunk) cell) force
# exactly one block per step.  The two-phase schedule removes that
# constraint: phase 1 processes `superstep` blocks per grid step and
# writes each block's partial to its OWN output row (no revisiting, no
# read-modify-write, no cell_first/group_first bookkeeping); phase 2
# reduces the [NB, ...] partials per chunk/group with a one-hot f32 MXU
# matmul (0.05 ms at quarter-Venice, 0.8 ms at Venice — against 1.2 ms
# of reclaimed grid overhead per kernel).
# ---------------------------------------------------------------------------


def _route_write(o_ref, t, vrows, posm, rt_bits):
    """Like :func:`_route_to_ref` but writes block ``t``'s partial window
    directly (the [T, 3, PCH] output block was zeroed first; each routed
    slice is written exactly once per block, so no RMW is needed).

    The rank expansion also differs: instead of the sublane gather
    ``take_along_axis(g1, pos >> 7, axis=0)`` (which Mosaic lowers as a
    select chain — measured 1.3 ms of the 4.1 ms phase-1 total), each
    slot's source sublane is selected with ONE iota-compare mask and a
    sublane-axis sum — exactly one row matches per valid slot, so the
    sum IS the selection (ablation probe: route 1.3 -> ~0.5 ms)."""
    n = len(vrows)
    sub1 = jax.lax.broadcasted_iota(jnp.int32, (SUB, CGRP), 0)
    for vv in range(NSL):
        @pl.when(((rt_bits >> vv) & 1) == 1)
        def _(vv=vv):
            pos1 = posm[vv:vv + 1]                   # [1, CGRP]
            pos8 = jnp.broadcast_to(pos1, (SUB, CGRP))
            lanei = jnp.where(pos8 < BLK, pos8 & (CGRP - 1), 0)
            msk = jnp.logical_and(sub1 == (pos8 >> 7), pos8 < BLK)
            pieces = []
            for v in vrows:
                g1 = _take1(v, lanei)                # [SUB, CGRP]
                val = jnp.where(msk, g1, 0.0)
                pieces.append(jnp.sum(val, axis=0, keepdims=True))
            add = jnp.concatenate(pieces, axis=0)    # [n, CGRP]
            o_ref[t, 0:n, vv * CGRP:(vv + 1) * CGRP] = add


def _ka2_kernel(cp, T, max_run, bg, rt, *refs):
    xs = refs[:T]
    b_ref, lc_ref, ss_ref, se_ref, o_ref = refs[T:]
    bs = pl.program_id(0)
    for t in range(T):
        lc = lc_ref[t]
        xg = [_take1(xs[t][d], lc) for d in range(cp)]
        qrows = []
        for s in range(3):
            q = _f32(b_ref[s * cp, t]) * xg[0]
            for d in range(1, cp):
                q = q + _f32(b_ref[s * cp + d, t]) * xg[d]
            qrows.append(q)
        vrows = _seg_scan(qrows, ss_ref[t], max_run)
        o_ref[t] = jnp.zeros((3, PCH), jnp.float32)
        _route_write(o_ref, t, vrows, se_ref[t], rt[bs * T + t])


@partial(jax.jit, static_argnames=("cp", "interpret"))
def hcpT_x_grouped2(
    ops: GroupedOps,
    x: jnp.ndarray,
    *,
    cp: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Two-phase u = Hcp^T x (see module section comment); semantics of
    :func:`hcpT_x_grouped`: ``x`` [cp, C] -> u [3, NCH*PCH]."""
    if interpret is None:
        interpret = _auto_interpret()
    T = ops.superstep
    G, NCH = ops.n_groups, ops.n_chunks
    NB = ops.n_blocks
    assert NB % T == 0, (NB, T)
    Cpad = G * CGRP
    x_p = jnp.zeros((cp, Cpad), x.dtype).at[:, : x.shape[1]].set(x)
    xrep = jnp.broadcast_to(x_p[:, None, :], (cp, SUB, Cpad))
    xrep = jax.lax.optimization_barrier(xrep)

    x_specs = [
        pl.BlockSpec(
            (cp, SUB, CGRP),
            lambda bs, bg, rt, t=t: (0, 0, bg[bs * T + t]),
            memory_space=pltpu.VMEM,
        )
        for t in range(T)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB // T,),
        in_specs=x_specs + [
            pl.BlockSpec((3 * cp, T, SUB, CGRP),
                         lambda bs, bg, rt: (0, bs, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, SUB, CGRP), lambda bs, bg, rt: (bs, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, SUB, CGRP), lambda bs, bg, rt: (bs, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, NSL, CGRP), lambda bs, bg, rt: (bs, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, 3, PCH), lambda bs, bg, rt: (bs, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    part = pl.pallas_call(
        partial(_ka2_kernel, cp, T, ops.max_run),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, 3, PCH), jnp.float32),
        interpret=interpret,
    )(
        ops.block_group, ops.route,
        *([xrep] * T), ops.b_rows, ops.lcam, ops.seg_start, ops.seg_end_pos,
    )
    # Phase 2: per-chunk reduction of the per-block partials (one-hot MXU
    # contraction; pad blocks wrote zeros, so no masking is needed).
    oh = (
        ops.block_chunk[None, :] == jnp.arange(NCH, dtype=jnp.int32)[:, None]
    ).astype(jnp.float32)                                  # [NCH, NB]
    u = jax.lax.dot_general(
        oh, part.reshape(NB, 3 * PCH),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(NCH, 3, PCH)
    return jnp.transpose(u, (1, 0, 2)).reshape(3, NCH * PCH)


def _kb2_kernel(cp, T, bg, bc, *refs):
    ws = refs[:T]
    b_ref, lp_ref, lc_ref, o_ref = refs[T:]
    for t in range(T):
        lp = lp_ref[t]
        lc = lc_ref[t]
        wg = _chunk_fill(ws[t], lp, 3)
        q2 = []
        for d in range(cp):
            acc = _f32(b_ref[d, t]) * wg[0]
            for s in range(1, 3):
                acc = acc + _f32(b_ref[s * cp + d, t]) * wg[s]
            q2.append(acc)
        o_ref[t] = _onehot_cam_reduce(q2, lc)


@partial(jax.jit, static_argnames=("cp", "interpret", "n_cameras"))
def hcp_w_grouped2(
    ops: GroupedOps,
    w3: jnp.ndarray,
    n_cameras: int,
    *,
    cp: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Two-phase y = Hcp w; semantics of :func:`hcp_w_grouped`:
    ``w3`` [3, P] -> y [cp, C]."""
    if interpret is None:
        interpret = _auto_interpret()
    T = ops.superstep
    G, NCH = ops.n_groups, ops.n_chunks
    NB = ops.n_blocks
    assert NB % T == 0, (NB, T)
    Ppad = NCH * PCH
    w_p = jnp.zeros((3, Ppad), w3.dtype).at[:, : w3.shape[1]].set(w3)
    w_p = jax.lax.optimization_barrier(w_p)

    w_specs = [
        pl.BlockSpec(
            (3, PCH),
            lambda bs, bg, bc, t=t: (0, bc[bs * T + t]),
            memory_space=pltpu.VMEM,
        )
        for t in range(T)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB // T,),
        in_specs=w_specs + [
            pl.BlockSpec((3 * cp, T, SUB, CGRP),
                         lambda bs, bg, bc: (0, bs, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, SUB, CGRP), lambda bs, bg, bc: (bs, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, SUB, CGRP), lambda bs, bg, bc: (bs, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (T, CGRP, cp), lambda bs, bg, bc: (bs, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    part = pl.pallas_call(
        partial(_kb2_kernel, cp, T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, CGRP, cp), jnp.float32),
        interpret=interpret,
    )(
        ops.block_group, ops.block_chunk,
        *([w_p] * T), ops.b_rows, ops.lpt, ops.lcam,
    )
    # Phase 2: per-group reduction (pad blocks wrote w=0 rows -> zeros).
    oh = (
        ops.block_group[None, :] == jnp.arange(G, dtype=jnp.int32)[:, None]
    ).astype(jnp.float32)                                  # [G, NB]
    yT = jax.lax.dot_general(
        oh, part.reshape(NB, CGRP * cp),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(G * CGRP, cp)
    return yT.T[:, :n_cameras]


# ---------------------------------------------------------------------------
# K_D: per-LM-iteration coupling rows, built directly in grouped order
# ---------------------------------------------------------------------------


def _kd_kernel(cp, dc_rows, model, robust, bg, bc, rs_ref,
               ct_ref, x3_ref, lc_ref, lp_ref, u_ref, v_ref, w_ref, o_ref):
    from pysfm_tpu.problem import cm as cm_mod
    from pysfm_tpu.problem import robust as robust_mod

    lc = lc_ref[0]
    lp = lp_ref[0]
    cols = [_take1(ct_ref[d], lc) for d in range(dc_rows)]
    Xg = _chunk_fill(x3_ref, lp, 3)
    u, v, Jc, Jp = cm_mod.project_jac_cm(model, cols, Xg)
    r0 = u - u_ref[0]
    r1 = v - v_ref[0]
    ssum = r0 * r0 + r1 * r1
    wq = w_ref[0] * robust_mod.weight(robust, ssum, rs_ref[0])
    for k in range(3):
        for d in range(cp):
            o_ref[k * cp + d, 0] = (
                wq * (Jc[0][d] * Jp[0][k] + Jc[1][d] * Jp[1][k])
            ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("cp", "model", "robust", "interpret"))
def payload_b_grouped(
    ops: GroupedOps,
    ctab: jnp.ndarray,
    X3: jnp.ndarray,
    robust_scale: jnp.ndarray,
    *,
    cp: int,
    model: str,
    robust: str,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Build the grouped per-observation coupling rows ``b_rows [3*CP,
    NB, SUB, CGRP]`` directly on device — replaces the XLA permutation of
    the point-sorted ``B_cm`` (77 ms/LM-iteration at quarter-Venice
    scale) with group-local camera-column gathers and chunk-local point
    fills.  Same math as :func:`pysfm_tpu.solver.scale._payload_rows`'
    B-row subset; padding slots carry w = 0 and produce zero rows."""
    if interpret is None:
        interpret = _auto_interpret()
    G, NCH = ops.n_groups, ops.n_chunks
    NB = ops.n_blocks
    Dc = ctab.shape[0]
    Cpad = G * CGRP
    ct_p = jnp.zeros((Dc, Cpad), jnp.float32).at[:, : ctab.shape[1]].set(
        ctab.astype(jnp.float32)
    )
    ct_rep = jax.lax.optimization_barrier(
        jnp.broadcast_to(ct_p[:, None, :], (Dc, SUB, Cpad))
    )
    Ppad = NCH * PCH
    x3_p = jnp.zeros((3, Ppad), jnp.float32).at[:, : X3.shape[1]].set(
        X3.astype(jnp.float32)
    )
    rs = jnp.asarray(robust_scale, jnp.float32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((Dc, SUB, CGRP), lambda b, bg, bc, rs: (0, 0, bg[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, PCH), lambda b, bg, bc, rs: (0, bc[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3 * cp, 1, SUB, CGRP), lambda b, bg, bc, rs: (0, b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        partial(_kd_kernel, cp, Dc, model, robust),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (3 * cp, NB, SUB, CGRP), ops.b_rows.dtype
        ),
        interpret=interpret,
    )(
        ops.block_group, ops.block_chunk, rs,
        ct_rep, x3_p, ops.lcam, ops.lpt, ops.gu, ops.gv, ops.gw,
    )


# ---------------------------------------------------------------------------
# K_E: fused normal-equation build — b_rows + Hcc/g_c + hpp6/g_p in ONE
# pass over the grouped observation stream
# ---------------------------------------------------------------------------


def _ke_kernel(cp, dc_rows, model, robust, max_run, bg, bc, cf, gf, rt,
               rs_ref, ct_ref, x3_ref, lc_ref, lp_ref, u_ref, v_ref, w_ref,
               ss_ref, se_ref, ob_ref, ocam_ref, opt_ref):
    from pysfm_tpu.problem import cm as cm_mod
    from pysfm_tpu.problem import robust as robust_mod
    from pysfm_tpu.solver.scale import TRI3, _tri_pairs

    b = pl.program_id(0)
    lc = lc_ref[0]
    lp = lp_ref[0]
    cols = [_take1(ct_ref[d], lc) for d in range(dc_rows)]
    Xg = _chunk_fill(x3_ref, lp, 3)
    u, v, Jc, Jp = cm_mod.project_jac_cm(model, cols, Xg)
    r0 = u - u_ref[0]
    r1 = v - v_ref[0]
    ssum = r0 * r0 + r1 * r1
    wq = w_ref[0] * robust_mod.weight(robust, ssum, rs_ref[0])
    wr0 = wq * r0
    wr1 = wq * r1

    # Coupling rows (identical to K_D).  The store casts to the ref's
    # dtype: bf16 rows (opt-in, see make_grouped_ops rows_dtype) halve
    # the dominant DMA stream of the CG matvec kernels.
    for k in range(3):
        for d in range(cp):
            ob_ref[k * cp + d, 0] = (
                wq * (Jc[0][d] * Jp[0][k] + Jc[1][d] * Jp[1][k])
            ).astype(ob_ref.dtype)

    # Camera-side rows (packed lower-tri Hcc, then g_c), one-hot reduced
    # per camera group (accumulated across the group's blocks).
    cam_rows = [
        wq * (Jc[0][d] * Jc[0][e] + Jc[1][d] * Jc[1][e])
        for d, e in _tri_pairs(cp)
    ] + [Jc[0][d] * wr0 + Jc[1][d] * wr1 for d in range(cp)]
    Y = _onehot_cam_reduce(cam_rows, lc)

    @pl.when(gf[b] == 1)
    def _():
        ocam_ref[:] = Y

    @pl.when(gf[b] == 0)
    def _():
        ocam_ref[:] = ocam_ref[:] + Y

    # Point-side rows (packed lower-tri Hpp, then g_p), segmented-scan
    # reduced into the block's chunk window (points sorted within block).
    pt_rows = [
        wq * (Jp[0][d] * Jp[0][e] + Jp[1][d] * Jp[1][e]) for d, e in TRI3
    ] + [Jp[0][k] * wr0 + Jp[1][k] * wr1 for k in range(3)]

    @pl.when(cf[b] == 1)
    def _():
        opt_ref[0] = jnp.zeros((9, PCH), jnp.float32)

    vrows = _seg_scan(pt_rows, ss_ref[0], max_run)
    _route_to_ref(opt_ref, 0, vrows, se_ref[0], rt[b])


@partial(jax.jit, static_argnames=(
    "cp", "model", "robust", "n_cameras", "n_points", "interpret"
))
def build_eqs_grouped(
    ops: GroupedOps,
    ctab: jnp.ndarray,
    X3: jnp.ndarray,
    robust_scale: jnp.ndarray,
    *,
    cp: int,
    model: str,
    robust: str,
    n_cameras: int,
    n_points: int,
    interpret: bool | None = None,
):
    """Fused grouped normal-equation build: residual+Jacobian payload,
    camera-side Hcc/g_c (one-hot MXU reduce) and point-side hpp6/g_p
    (segmented scan) in a single pass over the grouped observation stream
    — replaces :func:`pysfm_tpu.solver.scale.build_normal_equations_scale_cm`
    (measured 494 ms at Venice scale on v5e; the stream here is read and
    written once).  Returns ``(ScaleEqs with B_cm=None, b_rows)`` — the
    coupling rows stay in grouped order for the CG kernels (K_A/K_B), so
    the point-sorted ``B_cm`` never materializes."""
    from pysfm_tpu.solver import scale as scale_mod

    if interpret is None:
        interpret = _auto_interpret()
    G, NCH = ops.n_groups, ops.n_chunks
    NB = ops.n_blocks
    Dc = ctab.shape[0]
    Cpad = G * CGRP
    ct_p = jnp.zeros((Dc, Cpad), jnp.float32).at[:, : ctab.shape[1]].set(
        ctab.astype(jnp.float32)
    )
    ct_rep = jax.lax.optimization_barrier(
        jnp.broadcast_to(ct_p[:, None, :], (Dc, SUB, Cpad))
    )
    Ppad = NCH * PCH
    x3_p = jnp.zeros((3, Ppad), jnp.float32).at[:, : X3.shape[1]].set(
        X3.astype(jnp.float32)
    )
    rs = jnp.asarray(robust_scale, jnp.float32).reshape(1)
    n_tri = cp * (cp + 1) // 2
    rc = n_tri + cp

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((Dc, SUB, CGRP),
                         lambda b, bg, bc, cf, gf, rt, rs: (0, 0, bg[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, PCH), lambda b, bg, bc, cf, gf, rt, rs: (0, bc[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP),
                         lambda b, bg, bc, cf, gf, rt, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP),
                         lambda b, bg, bc, cf, gf, rt, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP),
                         lambda b, bg, bc, cf, gf, rt, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP),
                         lambda b, bg, bc, cf, gf, rt, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP),
                         lambda b, bg, bc, cf, gf, rt, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP),
                         lambda b, bg, bc, cf, gf, rt, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NSL, CGRP),
                         lambda b, bg, bc, cf, gf, rt, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3 * cp, 1, SUB, CGRP),
                         lambda b, bg, bc, cf, gf, rt, rs: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CGRP, rc),
                         lambda b, bg, bc, cf, gf, rt, rs: (bg[b], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, PCH),
                         lambda b, bg, bc, cf, gf, rt, rs: (bg[b], 0, bc[b]),
                         memory_space=pltpu.VMEM),
        ),
    )
    b_rows, camT, ptp = pl.pallas_call(
        partial(_ke_kernel, cp, Dc, model, robust, ops.max_run),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(
                (3 * cp, NB, SUB, CGRP), ops.b_rows.dtype
            ),
            jax.ShapeDtypeStruct((G * CGRP, rc), jnp.float32),
            jax.ShapeDtypeStruct((G, 9, NCH * PCH), jnp.float32),
        ),
        interpret=interpret,
    )(
        ops.block_group, ops.block_chunk, ops.cell_first, ops.group_first,
        ops.route, rs, ct_rep, x3_p, ops.lcam, ops.lpt, ops.gu, ops.gv,
        ops.gw, ops.seg_start, ops.seg_end_pos,
    )
    # Camera side: mask never-visited groups, unpack symmetric blocks.
    gm = jnp.repeat(ops.group_mask, CGRP)[:, None]            # [G*128, 1]
    cred = jnp.where(gm > 0, camT, 0.0).T[:, :n_cameras]      # [rc, C]
    Hcc = scale_mod._unpack_sym(cred[:n_tri], cp)
    g_c = cred[n_tri:].T                                      # [C, CP]
    # Point side: mask never-visited (group, chunk) windows, sum groups.
    m = ops.cell_mask[:, None, :, None]                       # [G,1,NCH,1]
    pp = ptp.reshape(G, 9, NCH, PCH)
    pred = jnp.sum(jnp.where(m > 0, pp, 0.0), axis=0)
    pred = pred.reshape(9, Ppad)[:, :n_points]
    eqs = scale_mod.ScaleEqs(
        Hcc=Hcc, g_c=g_c, hpp6=pred[:6], g_p=pred[6:], B_cm=None
    )
    return eqs, b_rows


# ---------------------------------------------------------------------------
# K_H: exact block-Jacobi preconditioner diagonal from grouped rows
# ---------------------------------------------------------------------------


def _kh_kernel(cp, bg, bc, gf, hinv_ref, b_ref, lp_ref, lc_ref, o_ref):
    from pysfm_tpu.solver.scale import _tri_pairs

    b = pl.program_id(0)
    lp = lp_ref[0]
    lc = lc_ref[0]
    a, bb, c_, d_, e, f = _chunk_fill(hinv_ref, lp, 6)
    # B columns per camera dof: B(d, s) = b_ref[s*cp + d].
    Bs = [
        [_f32(b_ref[s * cp + d, 0]) for d in range(cp)] for s in range(3)
    ]
    BH = []
    for d in range(cp):
        B0, B1, B2 = Bs[0][d], Bs[1][d], Bs[2][d]
        BH.append((
            a * B0 + bb * B1 + d_ * B2,
            bb * B0 + c_ * B1 + e * B2,
            d_ * B0 + e * B1 + f * B2,
        ))
    # D(d, e) = (B Hinv B^T)(d, e) per obs — padding slots have zero B.
    rows = []
    for d, e2 in _tri_pairs(cp):
        h0, h1, h2 = BH[d]
        rows.append(h0 * Bs[0][e2] + h1 * Bs[1][e2] + h2 * Bs[2][e2])
    Y = _onehot_cam_reduce(rows, lc)

    @pl.when(gf[b] == 1)
    def _():
        o_ref[:] = Y

    @pl.when(gf[b] == 0)
    def _():
        o_ref[:] = o_ref[:] + Y


@partial(jax.jit, static_argnames=("cp", "n_cameras", "interpret"))
def precond_diag_grouped(
    ops: GroupedOps,
    hinv6: jnp.ndarray,
    n_cameras: int,
    *,
    cp: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Exact block-Jacobi correction ``D_c = sum_{m in c} B_m
    Hpp_inv[pt(m)] B_m^T`` from the grouped coupling rows — replaces the
    camera-major table gather of ``B_cm`` (the last XLA gather in the PCG
    system build).  ``hinv6`` [6, P]; returns D [C, cp, cp] symmetric."""
    from pysfm_tpu.solver import scale as scale_mod

    if interpret is None:
        interpret = _auto_interpret()
    G, NCH = ops.n_groups, ops.n_chunks
    NB = ops.n_blocks
    Ppad = NCH * PCH
    h_p = jnp.zeros((6, Ppad), jnp.float32).at[:, : hinv6.shape[1]].set(
        hinv6.astype(jnp.float32)
    )
    h_p = jax.lax.optimization_barrier(h_p)
    n_tri = cp * (cp + 1) // 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((6, PCH), lambda b, bg, bc, gf: (0, bc[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * cp, 1, SUB, CGRP),
                         lambda b, bg, bc, gf: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, gf: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, gf: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CGRP, n_tri), lambda b, bg, bc, gf: (bg[b], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    dpartT = pl.pallas_call(
        partial(_kh_kernel, cp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * CGRP, n_tri), jnp.float32),
        interpret=interpret,
    )(
        ops.block_group, ops.block_chunk, ops.group_first,
        h_p, ops.b_rows, ops.lpt, ops.lcam,
    )
    gm = jnp.repeat(ops.group_mask, CGRP)[:, None]
    dred = jnp.where(gm > 0, dpartT, 0.0).T[:, :n_cameras]    # [n_tri, C]
    return scale_mod._unpack_sym(dred, cp)


# ---------------------------------------------------------------------------
# K_C: robust cost over the grouped observation stream
# ---------------------------------------------------------------------------


def _kc_kernel(dc_rows, model, robust, bg, bc, rs_ref,
               ct_ref, x3_ref, lc_ref, lp_ref, u_ref, v_ref, w_ref, o_ref):
    from pysfm_tpu.problem import cm as cm_mod
    from pysfm_tpu.problem import robust as robust_mod

    b = pl.program_id(0)
    lc = lc_ref[0]
    lp = lp_ref[0]
    cols = [_take1(ct_ref[d], lc) for d in range(dc_rows)]
    Xg = _chunk_fill(x3_ref, lp, 3)
    u, v = cm_mod.project_cm(model, cols, Xg)
    r0 = u - u_ref[0]
    r1 = v - v_ref[0]
    s = r0 * r0 + r1 * r1
    part = w_ref[0] * robust_mod.rho(robust, s, rs_ref[0])
    psum = jnp.sum(part, axis=0, keepdims=True)          # [1, CGRP]
    row = jnp.broadcast_to(psum, (SUB, CGRP))

    @pl.when(b == 0)
    def _():
        o_ref[:] = jnp.zeros((SUB, CGRP), jnp.float32)

    o_ref[:] = o_ref[:] + row


@partial(jax.jit, static_argnames=("model", "robust", "interpret"))
def cost_grouped(
    ops: GroupedOps,
    ctab: jnp.ndarray,
    X3: jnp.ndarray,
    robust_scale: jnp.ndarray,
    *,
    model: str,
    robust: str,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Robust cost ``0.5 sum_m w_m rho(|r_m|^2)`` in one pass over the
    grouped stream (padding slots carry w = 0) — replaces the obs-chunked
    XLA ``cost_scale_cm`` (~51 ms/eval at Venice scale on v5e) in the
    kernel LM loop.  Every grid step accumulates its per-lane partial
    sums into one revisited (8, 128) window; the final reduction is one
    XLA sum of 1024 lanes."""
    if interpret is None:
        interpret = _auto_interpret()
    G, NCH = ops.n_groups, ops.n_chunks
    NB = ops.n_blocks
    Dc = ctab.shape[0]
    Cpad = G * CGRP
    ct_p = jnp.zeros((Dc, Cpad), jnp.float32).at[:, : ctab.shape[1]].set(
        ctab.astype(jnp.float32)
    )
    ct_rep = jax.lax.optimization_barrier(
        jnp.broadcast_to(ct_p[:, None, :], (Dc, SUB, Cpad))
    )
    Ppad = NCH * PCH
    x3_p = jnp.zeros((3, Ppad), jnp.float32).at[:, : X3.shape[1]].set(
        X3.astype(jnp.float32)
    )
    rs = jnp.asarray(robust_scale, jnp.float32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((Dc, SUB, CGRP), lambda b, bg, bc, rs: (0, 0, bg[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, PCH), lambda b, bg, bc, rs: (0, bc[b]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, CGRP), lambda b, bg, bc, rs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SUB, CGRP), lambda b, bg, bc, rs: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    acc = pl.pallas_call(
        partial(_kc_kernel, Dc, model, robust),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SUB, CGRP), jnp.float32),
        interpret=interpret,
    )(
        ops.block_group, ops.block_chunk, rs,
        ct_rep, x3_p, ops.lcam, ops.lpt, ops.gu, ops.gv, ops.gw,
    )
    return 0.5 * jnp.sum(acc[0])
