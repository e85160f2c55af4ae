#!/usr/bin/env python
"""Same-process A/B of the Pallas sampler's small-window class.

The band sampler's per-block cost scales with the window tile count
((PH/8) x (PW/128) masked in-register gathers per 128 voxels, plus the
window DMA bytes), and most band blocks project far below the worst-case
(64, 256) window. The integrator routes each band block to the smallest
window class its clipped AABB fits (HIVE_PALLAS_WIN_S, "0" = single-window
baseline). This sweep measures full-integrate time per config at bench
shapes (VGA x 64 frames, 256^3-class volume) and checks the state checksum
is IDENTICAL across configs — routing must never change a bit.

Run on the TPU: python scripts/ab_pallas_window.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hive_tpu.ops.tsdf_sparse import (SparseTSDFState, SparseTSDFVolume,
                                      pick_compact_cap)
from hive_tpu.utils import enable_compile_cache

enable_compile_cache()

NUM_FRAMES = 64
HEIGHT, WIDTH = 480, 640

CONFIGS = ["0", "48,128", "32,128", "40,128", "56,128", "48,256", "32,256"]


def timed(fn, n=5):
    fn()  # warm/compile
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        float(r[0])  # scalar materialisation forces completion
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def main():
    K = np.array([[580.0, 0, 319.5], [0, 580.0, 239.5], [0, 0, 1.0]],
                 dtype=np.float32)

    @jax.jit
    def make_frames():
        f = jax.lax.broadcasted_iota(jnp.float32, (NUM_FRAMES, HEIGHT, WIDTH), 0)
        v = jax.lax.broadcasted_iota(jnp.float32, (NUM_FRAMES, HEIGHT, WIDTH), 1)
        u = jax.lax.broadcasted_iota(jnp.float32, (NUM_FRAMES, HEIGHT, WIDTH), 2)
        depths = 2.5 + 0.3 * jnp.sin(u * 0.02 + f * 0.3) * jnp.cos(v * 0.03)
        colors = jnp.stack([(u * 0.4) % 255.0, (v * 0.5) % 255.0,
                            (u + v + 30.0 * f) % 255.0], axis=-1)
        return depths, colors

    depths, colors = make_frames()
    jax.block_until_ready((depths, colors))

    poses = np.tile(np.eye(4, dtype=np.float32), (NUM_FRAMES, 1, 1))
    poses[:, 0, 3] = np.linspace(0.0, 0.5, NUM_FRAMES) + 0.0123

    bounds = np.array([[-2.0, 2.0], [-2.0, 2.0], [0.0, 4.0]], dtype=np.float32)
    intr = jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], dtype=jnp.float32)
    w2c = jnp.linalg.inv(jnp.asarray(poses, dtype=jnp.float32))
    obs = jnp.ones((NUM_FRAMES,), dtype=jnp.float32)

    baseline_sums = None
    for cfg in CONFIGS:
        os.environ["HIVE_PALLAS_WIN_S"] = cfg
        volume = SparseTSDFVolume(bounds, voxel_size=4.0 / 256)
        nb, bv = volume.num_blocks, volume.block_voxels
        frac = volume.estimate_candidate_fraction(K, poses, HEIGHT, WIDTH)
        cap = pick_compact_cap(frac)
        integ = volume._build_integrator(HEIGHT, WIDTH, compact_cap=cap)
        bo = volume.block_origins_device

        # Fit split on the middle frame: how many band blocks land in each
        # sampler class (small / large-only / take fallback).
        mid = NUM_FRAMES // 2
        out = jax.jit(integ.classify_refined_full)(
            bo, depths[mid], w2c[mid, :3, :3], w2c[mid, :3, 3], intr)
        classes, windows = out[0], out[4]
        band = int(jnp.sum(classes == SparseTSDFVolume.BAND))
        small, large = windows
        fit_l = int(jnp.sum(large[4]))
        fit_s = int(jnp.sum(small[4])) if small is not None else 0
        split = f"band={band} small={fit_s} large_only={fit_l - fit_s} " \
                f"take={band - fit_l}"

        def fresh_state():
            return SparseTSDFState(tsdf=jnp.ones((nb, bv), jnp.float32),
                                   weight=jnp.zeros((nb, bv), jnp.float32),
                                   color=jnp.zeros((nb, 3 * bv), jnp.float32))

        # depths/colors as ARGUMENTS (closure constants blow the tunnel's
        # remote-compile request limit at 64-frame sizes — HTTP 413).
        jitted = jax.jit(lambda s, d, c: integ.scan_impl(s, bo, d, c, w2c,
                                                         intr, obs))

        def run():
            st = jitted(fresh_state(), depths, colors)
            return (jnp.sum(st.weight.astype(jnp.float32)),
                    jnp.sum(st.tsdf.astype(jnp.float32)),
                    jnp.sum(st.color.astype(jnp.float32)))

        t = timed(run)
        sums = tuple(float(x) for x in run())
        if baseline_sums is None:
            baseline_sums = sums
        match = "OK" if sums == baseline_sums else f"MISMATCH {sums}"
        ups = volume.num_voxels * NUM_FRAMES / t / 1e6
        print(f"WIN_S={cfg:8s}: {t / NUM_FRAMES * 1e3:6.2f} ms/frame "
              f"({ups:5.0f}M upd/s)  checksum {match}  [{split}]")

    os.environ.pop("HIVE_PALLAS_WIN_S", None)


if __name__ == "__main__":
    main()
