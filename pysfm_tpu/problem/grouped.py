"""Grouped observation layout — the static index structure behind the
Pallas S-matvec kernels (solver/kernels/pallas_spmv.py).

Why this exists (measured on v5e, round 3): the PCG Schur matvec is
gather-bound.  XLA's TPU gather runs at ~0.4 G indices/s, so the two
index-translation steps of every CG iteration (camera vector -> per-slot,
point vector -> per-slot) cost tens of ms at Venice scale — 10-50x the
memory-bandwidth cost of the actual operands.  Mosaic's only fast indexed
primitive is ``tpu.dynamic_gather``, which is *vreg-local*: it gathers
along lanes within a single (8, 128) register.  Every indexed access in
the matvec must therefore be reduced to 128-wide locality — which is a
property of the data LAYOUT, not the kernel.

The layout: observations are re-sorted by

    (camera_group, point_chunk, point id)

with ``camera_group = cam // 128`` and ``point_chunk = pt // PCH``
(PCH = 2048).  Each (group, chunk) cell is padded to a multiple of the
kernel block (1024 observations = one (8, 128) tile).  Inside a block:

- all cameras fall in ONE 128-camera group  -> the camera-vector fill is
  a single vreg-local ``dynamic_gather`` per component row;
- all points fall in ONE 2048-point chunk   -> the point-vector fill
  gathers from a 16-vreg window, with a per-block static bitmap of which
  of the 16 slices are actually touched (points are sorted, so ~2);
- points are sorted -> per-point sums are a segmented scan along the
  tile plus a static rank-expansion into the chunk window.

Everything data-dependent about the sparsity is precomputed here ONCE per
problem on the host as plain int32/float32 arrays; the kernels consume
them via scalar prefetch and BlockSpec index_maps.  Reference analog:
none — the reference (SURVEY §0/§2) is a pure-NumPy single-process
codebase with no layout tier.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

CGRP = 128     # camera group width == lane count
PCH = 2048     # point chunk width == 16 vregs
BLK = 1024     # observations per kernel block == one (8, 128) f32 tile


class GroupedMeta(NamedTuple):
    """Static (per-problem) index structure for the grouped obs stream.

    All arrays are host NumPy; the caller device-puts what the kernels
    need.  ``M_B`` denotes the padded grouped stream length (multiple of
    BLK); ``NB = M_B // BLK`` blocks.
    """

    order: np.ndarray        # [M_B] int32 index into the original obs
                             #   arrays; -1 for padding slots
    lcam: np.ndarray         # [M_B] int32 camera id - 128*group, in [0,128)
    lpt: np.ndarray          # [M_B] int32 point id - PCH*chunk, in [0,PCH)
    valid: np.ndarray        # [M_B] float32 1.0 for real obs, 0.0 pad
    block_group: np.ndarray  # [NB] int32 camera group of each block
    block_chunk: np.ndarray  # [NB] int32 point chunk of each block
    cell_first: np.ndarray   # [NB] int32 1 if block is the first of its
                             #   (group, chunk) cell
    seg_start: np.ndarray    # [M_B] float32 1.0 where a per-block point
                             #   run starts (block boundaries always start)
    seg_end_pos: np.ndarray  # [NB, PCH//128, 128] int32 flat in-block
                             #   position (0..BLK-1) of the run END feeding
                             #   chunk slot l; BLK if slot l gets no run in
                             #   this block
    expand_rows: np.ndarray  # [NB, 16] int32 bitmap: bit i set if any
                             #   seg_end_pos in out-vreg v (128 slots) has
                             #   source sublane i (flat >> 7 == i)
    wfill_rows: np.ndarray   # [NB] int32 bitmap over the 16 chunk slices:
                             #   bit j set if any lpt in the block is in
                             #   [128 j, 128 j + 128)
    route_rows: np.ndarray   # [NB] int32 bitmap: bit v set if chunk slice
                             #   v receives any VALID run end from this
                             #   block (kernels skip dead slices)
    max_run: int             # longest per-block point run (<= max track
                             #   length); bounds the segmented-scan shift
                             #   schedule in the kernels
    group_first: np.ndarray  # [NB] int32 1 if block is the first of its
                             #   camera group
    cell_mask: np.ndarray    # [G, NCH] float32 1.0 if the (group, chunk)
                             #   cell has any block (guards garbage in the
                             #   never-visited upart windows)
    group_mask: np.ndarray   # [G] float32 1.0 if the group has any block
    n_groups: int            # ceil(C / 128)
    n_chunks: int            # ceil(P / PCH)


def build_grouped(
    obs_cam: np.ndarray,
    obs_pt: np.ndarray,
    n_cameras: int,
    n_points: int,
    pad_to_blocks: int = 0,
) -> GroupedMeta:
    """Build the grouped layout for one problem (pure NumPy, host-side).

    ``pad_to_blocks`` > NB appends inert padding blocks so several shards
    of one problem share a static block count under ``shard_map``: pad
    blocks copy the last real block's (group, chunk, lcam, lpt) — so every
    reference is to a known-finite (camera, point) pair — with ``valid = 0``
    (w = 0 rows), ``cell_first = group_first = 0`` (pure accumulate of
    zeros) and ``seg_end_pos = BLK`` (no run routed anywhere)."""
    obs_cam = np.asarray(obs_cam, np.int64)
    obs_pt = np.asarray(obs_pt, np.int64)
    M = obs_cam.shape[0]
    G = -(-n_cameras // CGRP)
    NCH = -(-n_points // PCH)

    grp = obs_cam // CGRP
    chk = obs_pt // PCH
    # Sort by (group, chunk, point, cam) — stable order inside runs.
    key = ((grp * NCH + chk) * n_points + obs_pt) * n_cameras + obs_cam
    order0 = np.argsort(key, kind="stable")
    gs = grp[order0]
    cs = chk[order0]
    cell = gs * NCH + cs

    # Pad every (group, chunk) cell to a BLK multiple.
    cell_ids, cell_counts = np.unique(cell, return_counts=True)
    padded = -(-cell_counts // BLK) * BLK
    M_B = int(padded.sum())
    NB = M_B // BLK

    order = np.full(M_B, -1, np.int64)
    out_off = np.concatenate([[0], np.cumsum(padded)[:-1]])
    in_off = np.concatenate([[0], np.cumsum(cell_counts)[:-1]])
    for ci in range(len(cell_ids)):
        n = cell_counts[ci]
        order[out_off[ci]:out_off[ci] + n] = order0[in_off[ci]:in_off[ci] + n]

    vb = order >= 0
    oc_b = np.where(vb, obs_cam[np.maximum(order, 0)], 0)
    op_b = np.where(vb, obs_pt[np.maximum(order, 0)], 0)
    # Per-block cell labels.
    blocks_per_cell = padded // BLK
    block_cell = np.repeat(cell_ids, blocks_per_cell)
    block_group = (block_cell // NCH).astype(np.int32)
    block_chunk = (block_cell % NCH).astype(np.int32)
    cell_first = np.ones(NB, np.int32)
    cell_first[1:] = (block_cell[1:] != block_cell[:-1]).astype(np.int32)

    # Padding slots must carry IN-RANGE local ids that are harmless:
    # lcam/lpt of pad slots point at lane 0 of their block's group/chunk
    # (valid == 0 zeroes their contribution in the kernels).
    pad_cam = block_group.repeat(BLK) * CGRP
    pad_pt = block_chunk.repeat(BLK).astype(np.int64) * PCH
    oc_b = np.where(vb, oc_b, pad_cam)
    op_b = np.where(vb, op_b, pad_pt)

    lcam = (oc_b - block_group.repeat(BLK) * CGRP).astype(np.int32)
    lpt = (op_b - block_chunk.repeat(BLK).astype(np.int64) * PCH).astype(
        np.int32
    )

    # Per-block point runs: a run starts at a block boundary or where the
    # point id changes; pads (point = chunk start, sorted after real obs
    # of that block? NO — pads sit at the cell tail, with lpt = 0) are
    # forced into their own runs by the validity flag.
    op_blocks = op_b.reshape(NB, BLK)
    v_blocks = vb.reshape(NB, BLK)
    prev = np.roll(op_blocks, 1, axis=1)
    seg_start = (op_blocks != prev)
    seg_start[:, 0] = True
    # Pad tail: first pad slot starts a (dead) run.
    prev_v = np.roll(v_blocks, 1, axis=1)
    seg_start |= v_blocks != prev_v
    # Run ends = positions where the NEXT slot starts a run (or block end).
    nxt = np.roll(seg_start, -1, axis=1)
    nxt[:, -1] = True
    seg_end = nxt

    # seg_end_pos [NB, PCH]: for every chunk slot, the flat position of
    # the run end that feeds it (only VALID run ends are routed).
    seg_end_pos = np.full((NB, PCH), BLK, np.int32)
    b_idx, m_idx = np.nonzero(seg_end & v_blocks)
    l_tgt = lpt.reshape(NB, BLK)[b_idx, m_idx]
    seg_end_pos[b_idx, l_tgt] = m_idx.astype(np.int32)

    # expand_rows bitmap [NB, 16]: which source sublanes feed out-vreg v.
    sub = np.minimum(seg_end_pos >> 7, 8)          # 8 == "none"
    expand_rows = np.zeros((NB, PCH // CGRP), np.int32)
    for v in range(PCH // CGRP):
        s = sub[:, v * CGRP:(v + 1) * CGRP]
        for i in range(8):
            expand_rows[:, v] |= ((s == i).any(axis=1) << i)

    # wfill_rows bitmap [NB]: which of the 16 chunk slices hold points.
    sl = lpt.reshape(NB, BLK) >> 7
    wfill_rows = np.zeros(NB, np.int32)
    for j in range(PCH // CGRP):
        wfill_rows |= (((sl == j) & v_blocks).any(axis=1) << j)

    # route_rows bitmap [NB]: which chunk slices receive a valid run end.
    route_live = (
        seg_end_pos.reshape(NB, PCH // CGRP, CGRP) < BLK
    ).any(axis=2)
    route_rows = np.zeros(NB, np.int32)
    for v in range(PCH // CGRP):
        route_rows |= route_live[:, v].astype(np.int32) << v

    # Longest VALID point run — the static bound for the kernels' scan
    # shift schedule.  Pad runs (zero values, never routed) are excluded:
    # an under-scanned pad run cannot corrupt routed sums (its run end is
    # not routed and its row-tail carry is a sum of zeros).
    ss_flat = seg_start.reshape(-1)
    start_pos = np.flatnonzero(ss_flat)
    if len(start_pos):
        lengths = np.diff(np.append(start_pos, NB * BLK))
        valid_runs = vb[start_pos]
        max_run = (
            int(lengths[valid_runs].max()) if valid_runs.any() else 1
        )
    else:
        max_run = BLK

    group_first = np.ones(NB, np.int32)
    group_first[1:] = (block_group[1:] != block_group[:-1]).astype(np.int32)
    cell_mask = np.zeros((G, NCH), np.float32)
    cell_mask[block_group, block_chunk] = 1.0
    group_mask = np.zeros(G, np.float32)
    group_mask[block_group] = 1.0

    meta = GroupedMeta(
        order=order.astype(np.int32),
        lcam=lcam,
        lpt=lpt,
        valid=vb.astype(np.float32),
        block_group=block_group,
        block_chunk=block_chunk,
        cell_first=cell_first,
        seg_start=seg_start.astype(np.float32).reshape(-1),
        seg_end_pos=seg_end_pos.reshape(NB, PCH // CGRP, CGRP),
        expand_rows=expand_rows,
        wfill_rows=wfill_rows,
        route_rows=route_rows,
        max_run=max_run,
        group_first=group_first,
        cell_mask=cell_mask,
        group_mask=group_mask,
        n_groups=G,
        n_chunks=NCH,
    )
    if pad_to_blocks > NB:
        meta = _append_pad_blocks(meta, pad_to_blocks)
    return meta


def _append_pad_blocks(meta: GroupedMeta, nb_target: int) -> GroupedMeta:
    """Append ``nb_target - NB`` inert blocks (see :func:`build_grouped`)."""
    NB = meta.block_group.shape[0]
    if NB == 0:
        raise ValueError("cannot pad an empty grouped stream")
    extra = nb_target - NB

    def rep_last(a):
        """Tile the last block's slice of a per-block array."""
        tail = np.repeat(a[NB - 1:NB], extra, axis=0)
        return np.concatenate([a, tail], axis=0)

    lcam2 = meta.lcam.reshape(NB, BLK)
    lpt2 = meta.lpt.reshape(NB, BLK)
    return meta._replace(
        order=np.concatenate(
            [meta.order, np.full(extra * BLK, -1, np.int32)]
        ),
        lcam=rep_last(lcam2).reshape(-1),
        lpt=rep_last(lpt2).reshape(-1),
        valid=np.concatenate(
            [meta.valid, np.zeros(extra * BLK, np.float32)]
        ),
        block_group=rep_last(meta.block_group),
        block_chunk=rep_last(meta.block_chunk),
        cell_first=np.concatenate(
            [meta.cell_first, np.zeros(extra, np.int32)]
        ),
        seg_start=np.concatenate(
            [meta.seg_start, np.ones(extra * BLK, np.float32)]
        ),
        seg_end_pos=np.concatenate(
            [
                meta.seg_end_pos,
                np.full((extra, PCH // CGRP, CGRP), BLK, np.int32),
            ],
            axis=0,
        ),
        expand_rows=np.concatenate(
            [meta.expand_rows, np.zeros((extra, PCH // CGRP), np.int32)],
            axis=0,
        ),
        wfill_rows=np.concatenate(
            [meta.wfill_rows, np.zeros(extra, np.int32)]
        ),
        route_rows=np.concatenate(
            [meta.route_rows, np.zeros(extra, np.int32)]
        ),
        group_first=np.concatenate(
            [meta.group_first, np.zeros(extra, np.int32)]
        ),
    )
