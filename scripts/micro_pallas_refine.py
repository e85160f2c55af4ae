#!/usr/bin/env python
"""Can the refine pass's 25-tap pyramid query beat XLA gathers as a Pallas
window-reduce kernel? (VERDICT r3 item #3.)

The refine pass reads, per compacted band block, a 5x5 cell region of ONE
pyramid level (25 single-u32 XLA gathers x refine_cap slots ~= 1.0 ms/frame
at bench shapes). The region is CONTIGUOUS in the flat pyramid: 5 row
segments of <= 5 cells, spanning < 5 * w_l + w_l elements. This micro
measures the alternative:

* per block, an async DMA copies the smallest static row class (8/16/24/
  32/48 rows of the (P/128, 128)-viewed flat pyramid) covering the span
  into VMEM scratch (double-buffered);
* in-kernel, each element's flat position g tests against the 5 row
  segments' [lo_i, hi_i] bounds (scalar-prefetched — no dynamic shifts
  needed; duplicate clamped rows are harmless: min/max/AND are idempotent);
* masked integer reduce per (block, lane): min(dmin16), max(dmax15),
  AND(valid) pack into one u32 output lane; the final 128-lane reduce and
  the u16->metres decode run in XLA (min/max commute with the monotone
  decode, so results are BIT-IDENTICAL to the 25-tap path).

Reference baseline: query_flat_pyramid (the production 25-tap query) over
the same bounds. Both ride a lax.scan over varying frames and return
checksums (LICM/DCE rules).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hive_tpu.ops.tsdf_sparse import (build_flat_pyramid, pyramid_layout,
                                      query_flat_pyramid)

HEIGHT, WIDTH = 480, 640
CAP = int(os.environ.get("MPR_CAP", "4608"))       # bench-scale refine_cap
NUM_FRAMES = int(os.environ.get("MPR_FRAMES", "32"))
RMAX = 48                  # worst span: 5 * w_l(=1024) / 128 + align slack
ROW_CLASSES = (8, 16, 24, 32, 48)


@functools.lru_cache(maxsize=None)
def build_refine_kernel(num_blocks: int, p_rows: int, interpret: bool = False):
    """8 blocks per grid step (out-blocks must be (8, 128)-divisible):
    each step issues 8 laddered window DMAs for the NEXT step while reducing
    the current 8 windows, one output row per block."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if num_blocks % 8:
        raise ValueError("num_blocks must be a multiple of 8")
    steps = num_blocks // 8

    def kernel(r0_ref, rc_ref, *rest):
        # 2D SMEM prefetch operands pad their minor dim to 128 (a (CAP, 5)
        # bounds array blew the 1 MB SMEM budget) — bounds arrive as ten
        # separate 1D arrays.
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
                rows = rc_ref[i]
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

        rr = jax.lax.broadcasted_iota(jnp.int32, (RMAX, 128), 0)
        ll = jax.lax.broadcasted_iota(jnp.int32, (RMAX, 128), 1)

        for j in range(8):
            b = s * 8 + j
            win = scratch[slot, j]                            # (RMAX, 128) u32
            g = r0_ref[b] * 128 + rr * 128 + ll

            mask = jnp.zeros((RMAX, 128), jnp.bool_)
            for i in range(5):
                mask |= (g >= lo_refs[i][b]) & (g <= hi_refs[i][b])

            w = win.astype(jnp.int32)  # bit pattern kept for field masks
            dmin = jnp.where(mask, w & 0xFFFF, 0xFFFF)
            dmax = jnp.where(mask, (w >> 16) & 0x7FFF, 0)
            vbit = jnp.where(mask, jax.lax.shift_right_logical(w, 31) & 1, 1)

            lane_min = jnp.min(dmin, axis=0)                  # (128,)
            lane_max = jnp.max(dmax, axis=0)
            lane_and = jnp.min(vbit, axis=0)
            packed = (lane_min.astype(jnp.uint32)
                      | (lane_max.astype(jnp.uint32) << 16)
                      | (lane_and.astype(jnp.uint32) << 31))
            out_ref[j, :] = packed

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=12,
            grid=(steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda s, *_: (s, 0)),
            scratch_shapes=[pltpu.VMEM((2, 8, RMAX, 128), jnp.uint32),
                            pltpu.SemaphoreType.DMA((2, 8))],
        ),
        out_shape=jax.ShapeDtypeStruct((num_blocks, 128), jnp.uint32),
        interpret=interpret,
    )


def refine_query_pallas(kernel_fn, pyramid2d, layout, u0, u1, v0, v1):
    """Same contract as query_flat_pyramid(grid=5, level_bias=-2), computed
    via the window kernel. Bit-identical: integer min/max/AND in-kernel,
    the monotone u16->metres decode applied once to the reduced fields."""
    offsets, widths, heights = (jnp.asarray(a) for a in layout)
    num_levels = len(layout[0])

    extent = jnp.maximum(u1 - u0, v1 - v0)
    level = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(extent, 1.0))
                              ).astype(jnp.int32) - 2, 0, num_levels - 1)
    off = offsets[level]
    w_l = widths[level]
    h_l = heights[level]
    shift = level

    cu0 = jnp.minimum(jnp.clip(u0, 0, WIDTH - 1).astype(jnp.int32) >> shift,
                      w_l - 1)
    cu1 = jnp.minimum(jnp.clip(u1, 0, WIDTH - 1).astype(jnp.int32) >> shift,
                      w_l - 1)
    cv0 = jnp.minimum(jnp.clip(v0, 0, HEIGHT - 1).astype(jnp.int32) >> shift,
                      h_l - 1)
    cv1 = jnp.minimum(jnp.clip(v1, 0, HEIGHT - 1).astype(jnp.int32) >> shift,
                      h_l - 1)

    los, his = [], []
    for i in range(5):
        cv = jnp.minimum(cv0 + i, cv1)
        los.append(off + cv * w_l + cu0)
        his.append(off + cv * w_l + cu1)
    first = los[0]
    last = his[4]  # hi_i is non-decreasing in i (rows clamp upward)
    r0 = ((first // 128) // 8) * 8
    rows = last // 128 - r0 + 1

    packed = kernel_fn(r0.astype(jnp.int32), rows.astype(jnp.int32),
                       *[x.astype(jnp.int32) for x in los],
                       *[x.astype(jnp.int32) for x in his], pyramid2d)
    lane_min = jnp.min(packed & 0xFFFF, axis=1).astype(jnp.float32)
    lane_max = jnp.max((packed >> 16) & 0x7FFF, axis=1).astype(jnp.float32)
    lane_and = jnp.min(packed >> 31, axis=1) == 1

    dmin = lane_min * 1e-3
    dmax = jnp.where(lane_max == 0.0, -jnp.inf,
                     jnp.where(lane_max >= 32767.0, jnp.inf, lane_max * 2e-3))
    return dmin, dmax, lane_and


def timed(fn, n=5):
    fn()
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def main():
    interpret = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), "(interpret)" if interpret else "")

    layout = pyramid_layout(HEIGHT, WIDTH)
    total = int(layout[0][-1]) + 1
    p_pad = ((total + 1023) // 1024) * 1024
    p_rows = p_pad // 128

    @jax.jit
    def make_frames():
        f = jax.lax.broadcasted_iota(jnp.float32, (NUM_FRAMES, HEIGHT, WIDTH), 0)
        v = jax.lax.broadcasted_iota(jnp.float32, (NUM_FRAMES, HEIGHT, WIDTH), 1)
        u = jax.lax.broadcasted_iota(jnp.float32, (NUM_FRAMES, HEIGHT, WIDTH), 2)
        return 2.5 + 0.4 * jnp.sin(u * 0.02 + f * 0.3) * jnp.cos(v * 0.03)

    depths = make_frames()

    # Synthetic per-block pixel AABBs: band-block-like extents 5..60 px,
    # positions anywhere in the frame, varying per frame via a rolled base.
    rng = np.random.default_rng(0)
    ext_u = rng.uniform(5, 60, CAP).astype(np.float32)
    ext_v = ext_u * rng.uniform(0.6, 1.4, CAP).astype(np.float32)
    u0b = rng.uniform(0, WIDTH - 1 - ext_u).astype(np.float32)
    v0b = rng.uniform(0, HEIGHT - 1 - ext_v).astype(np.float32)
    u0b, u1b = jnp.asarray(u0b), jnp.asarray(u0b + ext_u)
    v0b, v1b = jnp.asarray(v0b), jnp.asarray(v0b + ext_v)

    kernel_fn = build_refine_kernel(CAP, p_rows, interpret=interpret)

    def scan_over(query):
        @jax.jit
        def run(depths):
            def body(acc, depth):
                pyr = build_flat_pyramid(depth, HEIGHT, WIDTH)
                pyr2d = jnp.pad(pyr, (0, p_pad - pyr.shape[0])).reshape(-1, 128)
                dmin, dmax, valid = query(pyr, pyr2d)
                return acc + jnp.sum(jnp.where(jnp.isfinite(dmax), dmax, 0.0)
                                     + dmin) + jnp.sum(valid), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), depths)
            return acc
        return lambda: run(depths)

    def q_taps(pyr, pyr2d):
        return query_flat_pyramid(pyr, layout, u0b, u1b, v0b, v1b,
                                  HEIGHT, WIDTH, grid=5, level_bias=-2)

    def q_pallas(pyr, pyr2d):
        return refine_query_pallas(kernel_fn, pyr2d, layout, u0b, u1b,
                                   v0b, v1b)

    # Value check first (one frame, on host).
    pyr = build_flat_pyramid(depths[0], HEIGHT, WIDTH)
    pyr2d = jnp.pad(pyr, (0, p_pad - pyr.shape[0])).reshape(-1, 128)
    a = [np.asarray(x) for x in q_taps(pyr, pyr2d)]
    c = [np.asarray(x) for x in q_pallas(pyr, pyr2d)]
    ok = (np.array_equal(a[0], c[0]) and np.array_equal(a[1], c[1])
          and np.array_equal(a[2], c[2]))
    print("bit-identical:", ok)
    if not ok:
        for name, x, y in zip(("dmin", "dmax", "valid"), a, c):
            bad = np.flatnonzero(~(x == y) & ~(np.isnan(x) & np.isnan(y)))
            print(f"  {name}: {bad.size} mismatches, first {bad[:5]}",
                  x[bad[:3]], y[bad[:3]])

    t = timed(scan_over(q_taps))
    print(f"25-tap XLA query : {t * 1e3:7.1f} ms total "
          f"{t / NUM_FRAMES * 1e3:6.3f} ms/frame")
    t = timed(scan_over(q_pallas))
    print(f"Pallas window    : {t * 1e3:7.1f} ms total "
          f"{t / NUM_FRAMES * 1e3:6.3f} ms/frame")


if __name__ == "__main__":
    main()
