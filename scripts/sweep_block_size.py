#!/usr/bin/env python
"""Block-size sweep for the sparse TSDF integrator (bench.py workload)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hive_tpu.ops.tsdf_sparse import SparseTSDFVolume
from scripts.profile_sparse_stages import make_workload


def main():
    K, depths, colors, poses = make_workload()
    num_frames = depths.shape[0]
    bounds = np.array([[-2.0, 2.0], [-2.0, 2.0], [0.0, 4.0]], dtype=np.float32)

    configs = [(block, chunk)
               for block in [(8, 8, 8)]
               for chunk in [1 << 14, 1 << 15, 1 << 16]]
    for block, chunk in configs:
        volume = SparseTSDFVolume(bounds, voxel_size=4.0 / 256,
                                  block_size=block, chunk_voxels=chunk)
        volume.integrate_frames(colors, depths, K, poses)  # warm/compile
        float(jnp.sum(volume.state.weight.astype(jnp.float32)))

        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            volume.integrate_frames(colors, depths, K, poses)
            float(jnp.sum(volume.state.weight.astype(jnp.float32)))
            samples.append(time.perf_counter() - t0)
        el = sorted(samples)[1]

        ups = volume.num_voxels * num_frames / el
        print(f"block={block} chunk={chunk >> 10}K: nb={volume.num_blocks} "
              f"{el / num_frames * 1e3:6.2f} ms/frame  {ups / 1e6:5.0f}M updates/s",
              flush=True)


if __name__ == "__main__":
    main()
