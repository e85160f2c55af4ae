#!/usr/bin/env python
"""Microbench the quarter-tile band-sampling path's two building blocks.

Per banded trip (production shapes: 128 blocks x 512 voxels, split into
1024 (4,4,4) sub-blocks of 64 voxels):

  1. tile fetch: jnp.take of 1024 rows from a (4800, 1024) u32 tile stack
     (overlapping 32x32 tiles at stride 8 over a padded VGA image)
  2. fused compare-select-reduce: per-voxel value = sum_p tile[p] * (p == idx)
     over P=1024 virtual positions, single u32 channel

Compared against the current single-u32 per-voxel gather for the same 65536
voxels. Scan over varying inputs + checksum (LICM/DCE pitfalls).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T = 4800          # tiles (60 x 80 anchors at stride 8)
P = 1024          # 32*32 pixels per tile
K = 1024          # sub-blocks per trip
BV = 64           # voxels per sub-block
TRIPS = 22        # trips per frame-equivalent scan


def timed(fn, n=3):
    fn()
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def main():
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.integers(0, 2**31, (T, P), dtype=np.int64)
                        .astype(np.uint32))
    tid = jnp.asarray(rng.integers(0, T, (TRIPS, K)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, P, (TRIPS, K, BV)), jnp.int32)

    # equivalent flat-image gather workload
    img = jnp.asarray(rng.integers(0, 2**31, (480 * 640,), dtype=np.int64)
                      .astype(np.uint32))
    flat = jnp.asarray(rng.integers(0, 480 * 640, (TRIPS, K, BV)), jnp.int32)

    n_vox = TRIPS * K * BV

    # --- current: per-voxel u32 gather ---------------------------------
    @jax.jit
    def gather_path(img, flat):
        def body(acc, f):
            g = jnp.take(img, f)
            return acc + jnp.sum(g.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), flat)
        return acc

    t = timed(lambda: gather_path(img, flat))
    print(f"per-voxel u32 gather:    {t * 1e3:7.2f} ms  "
          f"({t / n_vox * 1e9:5.2f} ns/voxel)")

    # --- tile fetch only -------------------------------------------------
    @jax.jit
    def fetch_only(tiles, tid):
        def body(acc, f):
            rows = jnp.take(tiles, f, axis=0)          # (K, P) row gather
            return acc + jnp.sum(rows.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), tid)
        return acc

    t = timed(lambda: fetch_only(tiles, tid))
    print(f"tile row-fetch only:     {t * 1e3:7.2f} ms  "
          f"({t / (TRIPS * K) * 1e9:5.0f} ns/row, "
          f"{TRIPS * K * P * 4 / t / 1e9:.1f} GB/s)")

    # --- tile fetch + fused compare-reduce ------------------------------
    @jax.jit
    def tile_path(tiles, tid, idx):
        pio = jax.lax.broadcasted_iota(jnp.int32, (1, 1, P), 2)

        def body(acc, f):
            tid_f, idx_f = f
            rows = jnp.take(tiles, tid_f, axis=0)      # (K, P)
            m = idx_f[:, :, None] == pio               # (K, BV, P) virtual
            vals = jnp.sum(jnp.where(m, rows[:, None, :], jnp.uint32(0)),
                           axis=-1)                    # (K, BV)
            return acc + jnp.sum(vals.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), (tid, idx))
        return acc

    # correctness vs explicit indexing
    got = float(tile_path(tiles, tid, idx))
    want = float(jnp.sum(tiles[tid][
        jnp.arange(TRIPS)[:, None, None],
        jnp.arange(K)[None, :, None], idx].astype(jnp.float32)))
    print(f"tile path match: {abs(got - want) <= 1e-6 * abs(want)}")

    t = timed(lambda: tile_path(tiles, tid, idx))
    print(f"tile fetch + reduce:     {t * 1e3:7.2f} ms  "
          f"({t / n_vox * 1e9:5.2f} ns/voxel)")


if __name__ == "__main__":
    main()
