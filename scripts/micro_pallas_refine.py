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

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hive_tpu.ops.tsdf_sparse import (build_flat_pyramid, pyramid_layout,
                                      query_flat_pyramid)

HEIGHT = int(os.environ.get("MPR_HEIGHT", "480"))
WIDTH = int(os.environ.get("MPR_WIDTH", "640"))   # 1280 = the rmax-80 path
CAP = int(os.environ.get("MPR_CAP", "4608"))       # bench-scale refine_cap
NUM_FRAMES = int(os.environ.get("MPR_FRAMES", "32"))


from hive_tpu.ops.pallas_refine import (  # noqa: E402
    padded_pyramid_rows, query_flat_pyramid_pallas, window_rows)

# The kernel under test now lives in hive_tpu/ops/pallas_refine.py (the
# production integration, round 4). This micro keeps the original A/B
# harness: 25-tap XLA query vs the window kernel over the same bounds.


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
    p_rows = padded_pyramid_rows(total, window_rows(WIDTH))
    p_pad = p_rows * 128

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
        return query_flat_pyramid_pallas(pyr2d, layout, u0b, u1b, v0b, v1b,
                                         HEIGHT, WIDTH, interpret=interpret)

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
