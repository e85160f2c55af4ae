#!/usr/bin/env python
"""Generic same-process A/B sweep of one integrator env knob.

Times the full sparse integrate (bench shapes: VGA x 64 frames into a
256^3-class volume, call floor amortised, median of 5) for each value of a
build-time env variable, and checks the state checksum across configs.
Some knobs legitimately change results (e.g. refine-cap overflow leaves
blocks unrefined but still correct); the checksum column says which.

Usage (on the TPU):
    python scripts/ab_env_sweep.py HIVE_TSDF_REFINE_CAP_DIV 8 10 12 14 16
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

NUM_FRAMES = int(os.environ.get("HIVE_AB_FRAMES", "64"))
HEIGHT, WIDTH = 480, 640
DIM = int(os.environ.get("HIVE_AB_DIM", "256"))  # volume = DIM^3


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
    var, values = sys.argv[1], sys.argv[2:]
    if not values:
        raise SystemExit("usage: ab_env_sweep.py ENV_VAR value ...")

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

    saved = os.environ.get(var)
    baseline_sums = None
    for value in values:
        os.environ[var] = value
        volume = SparseTSDFVolume(bounds, voxel_size=4.0 / DIM)
        nb, bv = volume.num_blocks, volume.block_voxels
        frac = volume.estimate_candidate_fraction(K, poses, HEIGHT, WIDTH)
        integ = volume._build_integrator(HEIGHT, WIDTH,
                                         compact_cap=pick_compact_cap(frac))
        bo = volume.block_origins_device

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
        match = "identical" if sums == baseline_sums else "DIFFERS"
        ups = volume.num_voxels * NUM_FRAMES / t / 1e6
        print(f"{var}={value:8s}: {t / NUM_FRAMES * 1e3:6.2f} ms/frame "
              f"({ups:5.0f}M upd/s)  checksum {match}  "
              f"refine_cap={integ.refine_cap}", flush=True)

    if saved is None:
        os.environ.pop(var, None)
    else:
        os.environ[var] = saved


if __name__ == "__main__":
    main()
