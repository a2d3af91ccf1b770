"""Pallas TPU kernel: segmented row-sum over SORTED segment ids.

The missing TPU primitive for block-sparse bundle adjustment at BAL scale
(SURVEY §7 "Irregular visibility graph on a dense-math machine"):
``out[seg, :] = sum over slots m with seg_ids[m] == seg of rows[m, :]``
with ``seg_ids`` non-decreasing.  XLA's alternatives all fail at scale:
``segment_sum`` lowers to a serializing scatter-add (~25 ms at 164k rows on
v5e), a one-hot matmul needs an [M, P] operand (34 GB at Venice scale), and
the padded per-segment gather table explodes as P*K_max*128 lanes.

Algorithm (single sequential pass, carry-chained):

- grid over tiles of T observation slots; per tile, local segment ids
  ``seg - first_seg[tile]`` (always in [0, T)) are one-hot'd against an
  iota and contracted with the row tile on the MXU -> local per-segment
  sums [T, D];
- a segment spanning a tile boundary is stitched with a VMEM carry row,
  added to the tile's first local segment iff its global id matches the
  carried id (tracked in SMEM);
- each tile DMAs its [T, D] window to the output at dynamic row offset
  ``first_seg[tile]``.  Consecutive windows overlap exactly on boundary
  segments; the TPU grid executes sequentially, so the later (carry-
  completed) write wins;
- the output is pre-zeroed via input_output_aliases, so segments with no
  slots — and rows before the first segment id — read as zero.

``first_seg`` (= seg_ids[::T]) is scalar-prefetched so the DMA offset is
available before the body runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # slots per grid step
# Precision of the in-kernel one-hot contraction.  The one-hot operand is
# exact in bf16, but DEFAULT would truncate the summed rows to bf16
# (~4e-3 relative) — gradients need f32, so HIGHEST.
_PREC = "highest"


@functools.partial(jax.jit, static_argnames=("out_rows", "interpret"))
def _ranked_rowsum(
    rows: jnp.ndarray,       # [M, D] float rows (already padded to TILE)
    rank: jnp.ndarray,       # [M] int32 DENSE ranks, non-decreasing,
                             # increasing by at most 1 per slot
    out_rows: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Core kernel: per-rank sums. The dense-rank precondition guarantees a
    tile of TILE slots spans local ids in [0, TILE)."""
    m_pad, D = rows.shape
    dtype = rows.dtype
    seg_ids = rank
    n_tiles = m_pad // TILE
    first_seg = seg_ids[::TILE]                              # [n_tiles]
    out_pad = out_rows + TILE                                # window overhang
    # Mosaic requires the DMA window's lane dim to be 128-aligned; run the
    # accumulator and output at DP = 128 lanes and slice the payload off at
    # the end (garbage in lanes >= D never escapes: the caller slices).
    DP = 128
    zero = jnp.zeros((out_pad, DP), dtype)

    def kern(first_ref, seg_ref, rows_ref, zero_ref, out_ref,
             sums_ref, carry_ref, carry_seg_ref, sem):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_seg_ref[0] = -1
            carry_ref[:, :] = jnp.zeros((1, DP), dtype)  # NaN * 0 == NaN

        first = first_ref[i]
        local = seg_ref[0, :] - first                        # [T] in [0, T)
        rows_t = rows_ref[0]                                 # [T, D]

        ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        oh = (ids == local[None, :]).astype(dtype)           # [Tl, Tslot]
        sums = jnp.dot(
            oh, rows_t, preferred_element_type=dtype,
            precision=(jax.lax.Precision.HIGHEST if _PREC == "highest"
                       else jax.lax.Precision.DEFAULT),
        )                                                    # [Tl, D]

        is_cont = (carry_seg_ref[0] == first).astype(dtype)
        fix = jnp.concatenate(
            [carry_ref[0:1, :D] * is_cont,
             jnp.zeros((TILE - 1, D), dtype)],
            axis=0,
        )
        sums_ref[:, :] = jnp.pad(sums + fix, ((0, 0), (0, DP - D)))

        last_local = local[TILE - 1]
        carry_ref[0:1, :] = sums_ref[pl.ds(last_local, 1), :]
        carry_seg_ref[0] = first + last_local

        # Window write [first, first + T) at dynamic element offset — the
        # output lives in ANY/HBM, so this is an explicit DMA.
        dma = pltpu.make_async_copy(
            sums_ref, out_ref.at[pl.ds(first, TILE), :], sem
        )
        dma.start()
        dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda i, f: (0, i),
                         memory_space=pltpu.VMEM),           # seg ids
            pl.BlockSpec((1, TILE, D), lambda i, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # row tiles
            pl.BlockSpec(memory_space=pltpu.ANY),            # zero (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((TILE, DP), dtype),                   # tile sums
            pltpu.VMEM((1, DP), dtype),                      # carry row
            pltpu.SMEM((1,), jnp.int32),                     # carry seg id
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_pad, DP), dtype),
        # Alias the zeros buffer to the output (indices count the scalar-
        # prefetch operand, so `zero` is input 3).
        input_output_aliases={3: 0},
        interpret=interpret,
    )(
        first_seg,
        seg_ids.reshape(1, m_pad),
        rows.reshape(n_tiles, TILE, D),
        zero,
    )
    return out[:out_rows, :D]


@functools.partial(jax.jit, static_argnames=("n_segments", "interpret"))
def segmented_rowsum(
    rows: jnp.ndarray,       # [M, D] float rows to reduce
    seg_ids: jnp.ndarray,    # [M] int32, non-decreasing
    n_segments: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [n_segments, D]; empty segments are zero.

    Sparse ids are densified to ranks first (an exact int32 cumsum over the
    id-change flags), the kernel reduces in rank space — which guarantees
    its tile-locality invariant even with arbitrarily many empty segments —
    and the result is expanded back with one binary-search gather.
    """
    M, D = rows.shape
    seg_ids = seg_ids.astype(jnp.int32)
    m_pad = max(pl.cdiv(M, TILE), 1) * TILE
    if m_pad != M:
        rows = jnp.pad(rows, ((0, m_pad - M), (0, 0)))
        # Pad ids with the final id (stays sorted; padded rows are zero).
        seg_ids = jnp.concatenate(
            [seg_ids, jnp.broadcast_to(seg_ids[-1], (m_pad - M,))]
        )
    changed = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (seg_ids[1:] != seg_ids[:-1]).astype(jnp.int32)]
    )
    rank = jnp.cumsum(changed) - 1                            # [m_pad] dense
    out_rows = min(m_pad, n_segments)  # <= n_segments distinct ids assumed
    ranksum = _ranked_rowsum(rows, rank, out_rows, interpret=interpret)

    # Expand rank space -> segment space: for each segment, find its first
    # slot (binary search); empty segments get zero.
    seg_range = jnp.arange(n_segments, dtype=seg_ids.dtype)
    idx = jnp.searchsorted(seg_ids, seg_range)
    idx_c = jnp.minimum(idx, m_pad - 1)
    has = (idx < m_pad) & (seg_ids[idx_c] == seg_range)
    out = ranksum[rank[idx_c]]
    return out * has[:, None].astype(rows.dtype)
