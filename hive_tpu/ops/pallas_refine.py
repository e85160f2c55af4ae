"""Pyramid window-reduce as a Pallas TPU kernel: the refine pass's 5x5 query.

The sparse integrator's band-refinement pass reads, per compacted band
block, a 5x5-cell region of ONE classification-pyramid level —
25 single-u32 XLA gathers per slot, which serialize on this part
(~10 ms/frame of a 27 ms/frame integrate at 512^3 volumes, CLAUDE.md
2026-08-20 attribution). The region is CONTIGUOUS in the flat pyramid:
5 row segments of <= 5 cells spanning < 6 * w_l elements, so per block:

* an async DMA copies the smallest static row class (8..window_rows(width) of
  the ``(P/128, 128)``-viewed flat pyramid) covering the span into VMEM
  scratch (double-buffered, 8 blocks per grid step — out-blocks must be
  (8, 128)-divisible);
* each window element's flat position tests against the 5 segments'
  scalar-prefetched ``[lo_i, hi_i]`` bounds (no dynamic shifts; duplicate
  clamped rows are idempotent under min/max/AND);
* integer per-lane min/dmax/AND reduce, packed into one u32 per
  (block, lane); the final 128-lane reduce and the monotone u16->metres
  decode run in XLA — results are **bit-identical** to the 25-tap path
  (hardware-verified at caps 64/4608/16384).

Measured (scripts/micro_pallas_refine.py, v5e slice, 16-frame scans incl.
the shared pyramid build): 4.96 -> 3.92 ms/frame at cap 16384, 1.74 -> 1.53
at cap 4608. Worth ~2 ms/frame at 512^3-scale volumes; ~4% at the 256^3
bench shape (kept on: bit-identical and never slower in any measured
config).

SMEM constraint: the 12 scalar-prefetch arrays are capped at 1 MB total, so
caps above 8192 split into multiple pallas_call invocations inside the same
jitted body (chunking is free — the calls pipeline back-to-back).

No reference counterpart (the reference's PyCUDA kernel reads depth
per-voxel with hardware gather; the pyramid itself is this rebuild's
structure — see ops/tsdf_sparse.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_KERNEL_BLOCKS = 8192        # 12 prefetch arrays * 8192 * 4 B = 384 KB


def window_rows(width: int) -> int:
    """Static window row count for a frame width.

    Worst span: the 5 row segments sit 4 level-strides apart and each covers
    <= 5 cells, so his[4] - lo[0] <= 4 * w_l + 5 elements with
    w_l <= _next_pow2(width) (level 0); plus one boundary row and up to 7
    rows of r0 round-down slack. 48 rows for VGA-class frames (w_l <= 1024);
    80 for 720p/1080p-class (w_l = 2048) — a fixed 48 silently truncated the
    reduce on >1024-wide frames (non-conservative bounds, caught in review).
    """
    # Lazy import — the canvas rule must stay THE definition the pyramid
    # itself is sized by (module-level import would be circular).
    from hive_tpu.ops.tsdf_sparse import _next_pow2

    wp = _next_pow2(width)
    rows = (4 * wp + 5 + 127) // 128 + 1 + 7
    return ((rows + 7) // 8) * 8


def _row_classes(rmax: int):
    return tuple(r for r in (8, 16, 24, 32, 48, 64, 80, 96, 128)
                 if r < rmax) + (rmax,)


@functools.lru_cache(maxsize=None)
def _build_kernel(num_blocks: int, rmax: int, interpret: bool = False):
    ROW_CLASSES = _row_classes(rmax)  # noqa: N806
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if num_blocks % 8:
        raise ValueError("num_blocks must be a multiple of 8")
    steps = num_blocks // 8

    def kernel(r0_ref, rc_ref, *rest):
        # Ten 1D bounds arrays (a 2D (cap, 5) SMEM operand pads its minor
        # dim to 128 and blows the 1 MB SMEM budget).
        lo_refs, hi_refs = rest[:5], rest[5:10]
        pyr_hbm, out_ref, scratch, sem = rest[10:]
        s = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(s, 2)
        nxt = jax.lax.rem(s + 1, 2)

        def copies(step, slot_idx):
            out = []
            for j in range(8):
                i = step * 8 + j
                r0 = pl.multiple_of(r0_ref[i], 8)
                # Clamp so exactly one ladder class always matches (a rows
                # value past rmax would match NO class: neither start nor
                # wait fires and the slot holds stale bytes). The caller
                # clips too; this is the in-kernel guarantee.
                rows = jnp.minimum(rc_ref[i], rmax)
                for ci, cr in enumerate(ROW_CLASSES):
                    cond = rows <= cr
                    if ci:
                        cond &= rows > ROW_CLASSES[ci - 1]
                    out.append((cond, pltpu.make_async_copy(
                        pyr_hbm.at[pl.ds(r0, cr), :],
                        scratch.at[slot_idx, j, pl.ds(0, cr)],
                        sem.at[slot_idx, j])))
            return out

        def run(cs, op):
            for cond, copy in cs:
                pl.when(cond)(lambda copy=copy: op(copy))

        @pl.when(s == 0)
        def _prime():
            run(copies(0, 0), lambda c: c.start())

        @pl.when(s + 1 < n)
        def _prefetch():
            run(copies(jnp.minimum(s + 1, n - 1), nxt), lambda c: c.start())

        run(copies(s, slot), lambda c: c.wait())

        rr = jax.lax.broadcasted_iota(jnp.int32, (rmax, 128), 0)
        ll = jax.lax.broadcasted_iota(jnp.int32, (rmax, 128), 1)

        for j in range(8):
            b = s * 8 + j
            win = scratch[slot, j]                        # (rmax, 128) u32
            g = r0_ref[b] * 128 + rr * 128 + ll

            mask = jnp.zeros((rmax, 128), jnp.bool_)
            for i in range(5):
                mask |= (g >= lo_refs[i][b]) & (g <= hi_refs[i][b])

            w = win.astype(jnp.int32)  # bit pattern kept for field masks
            dmin = jnp.where(mask, w & 0xFFFF, 0xFFFF)
            dmax = jnp.where(mask, (w >> 16) & 0x7FFF, 0)
            vbit = jnp.where(mask, jax.lax.shift_right_logical(w, 31) & 1, 1)

            lane_min = jnp.min(dmin, axis=0)              # (128,)
            lane_max = jnp.max(dmax, axis=0)
            lane_and = jnp.min(vbit, axis=0)
            out_ref[j, :] = (lane_min.astype(jnp.uint32)
                             | (lane_max.astype(jnp.uint32) << 16)
                             | (lane_and.astype(jnp.uint32) << 31))

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=12,
            grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda s, *_: (s, 0)),
            scratch_shapes=[pltpu.VMEM((2, 8, rmax, 128), jnp.uint32),
                            pltpu.SemaphoreType.DMA((2, 8))],
        ),
        out_shape=jax.ShapeDtypeStruct((num_blocks, 128), jnp.uint32),
        interpret=interpret,
    )


def padded_pyramid_rows(total: int, rmax: int) -> int:
    """Rows of the (rows, 128) pyramid view, padded so every rmax-row window
    whose clipped origin is in range stays in bounds."""
    rows = -(-total // 128)
    return ((rows + rmax - 1 + 7) // 8) * 8 + rmax


def query_flat_pyramid_pallas(pyramid2d, layout, u0, u1, v0, v1,
                              height: int, width: int,
                              interpret: bool = False):
    """Drop-in for ``tsdf_sparse.query_flat_pyramid(grid=5, level_bias=-2)``
    computed via the window kernel — bit-identical (integer min/max/AND
    in-kernel; the monotone u16->metres decode applied once to the reduced
    fields; min/max/AND commute with monotone maps and are idempotent under
    the duplicate clamped rows).

    :param pyramid2d: the flat u32 pyramid padded to
        ``padded_pyramid_rows(total) * 128`` and reshaped ``(rows, 128)``.
    :param layout: :func:`tsdf_sparse.pyramid_layout` arrays.
    """
    # THE cell selection lives in tsdf_sparse.pyramid_cell_bounds — both
    # query paths must pick identical cells to stay bit-identical.
    from hive_tpu.ops.tsdf_sparse import pyramid_cell_bounds

    off, w_l, cu0, cu1, cv0, cv1 = pyramid_cell_bounds(
        layout, u0, u1, v0, v1, height, width, level_bias=-2)

    los, his = [], []
    for i in range(5):
        cv = jnp.minimum(cv0 + i, cv1)
        los.append(off + cv * w_l + cu0)
        his.append(off + cv * w_l + cu1)

    rmax = window_rows(width)
    p_rows = pyramid2d.shape[0]
    # The view's padding must cover THIS width's rmax — rmax grows with the
    # frame width, so a pyramid2d built for a narrower frame would make the
    # r0 clip below bind and masked window rows read stale/zero bytes:
    # silently non-conservative bounds. Refuse loudly instead.
    offsets, widths, heights = layout
    total = int(offsets[-1]) + int(widths[-1]) * int(heights[-1])
    expected_rows = padded_pyramid_rows(total, rmax)
    if p_rows < expected_rows:
        raise ValueError(
            f"pyramid2d has {p_rows} rows but a width-{width} query needs "
            f">= {expected_rows} (= padded_pyramid_rows(total={total}, "
            f"rmax={rmax})); rmax depends on the frame width — rebuild the "
            f"view for this frame size")
    # Memory-safety clips: bounds derive from clamped coords so they are in
    # range for any finite input, but the DMA origin must be provably valid.
    # rows can never exceed rmax by construction (see window_rows); the clip
    # is belt-and-braces, not a truncation.
    r0 = jnp.clip(((los[0] // 128) // 8) * 8, 0, p_rows - rmax)
    rows = jnp.clip(his[4] // 128 - r0 + 1, 1, rmax)

    cap = u0.shape[0]
    if cap % 8:
        raise ValueError("cap must be a multiple of 8")

    def run_chunk(sl):
        kernel_fn = _build_kernel(sl.stop - sl.start, rmax,
                                  interpret=interpret)
        return kernel_fn(
            r0[sl].astype(jnp.int32), rows[sl].astype(jnp.int32),
            *[x[sl].astype(jnp.int32) for x in los],
            *[x[sl].astype(jnp.int32) for x in his], pyramid2d)

    if cap <= MAX_KERNEL_BLOCKS:
        packed = run_chunk(slice(0, cap))
    else:
        starts = list(range(0, cap, MAX_KERNEL_BLOCKS))
        packed = jnp.concatenate(
            [run_chunk(slice(s, min(s + MAX_KERNEL_BLOCKS, cap)))
             for s in starts])

    lane_min = jnp.min(packed & 0xFFFF, axis=1).astype(jnp.float32)
    lane_max = jnp.max((packed >> 16) & 0x7FFF, axis=1).astype(jnp.float32)
    lane_and = jnp.min(packed >> 31, axis=1) == 1

    dmin = lane_min * 1e-3
    dmax = jnp.where(lane_max == 0.0, -jnp.inf,
                     jnp.where(lane_max >= 32767.0, jnp.inf,
                               lane_max * 2e-3))
    return dmin, dmax, lane_and
