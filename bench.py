#!/usr/bin/env python
"""Benchmark: TSDF fusion throughput (voxel updates/second) on real hardware.

This is the framework's headline kernel (BASELINE.md "TSDF voxels/s"
north-star): the reference integrates VGA RGB-D frames into a voxel volume
with a PyCUDA kernel on an RTX 3060 (reference third_party tsdf-fusion-python,
driven by hive/fusion.py:102-127). Here the same workload — VGA frames into a
~17M-voxel volume — runs through the sparse banded integrator
(hive_tpu.ops.tsdf_sparse) in its production configuration: f32 voxel
storage at this volume size (the pipeline switches to bf16 above ~100M
voxels), rgb565d16 packed sampling, (8,8,8) blocks.

All benchmark inputs are synthesised on device (the hardware may sit behind a
remote tunnel where host->device uploads would dominate and corrupt the
measurement); timing is forced with scalar materialisation because
block_until_ready can return early through such tunnels.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` is the ratio against 1.0e9 voxel updates/s — the throughput
class of the reference's CUDA kernel on an RTX 3060 (estimated: the reference
publishes no numbers, BASELINE.json "published": {}).
"""

import json
import time

import numpy as np

# Estimated reference throughput (PyCUDA TSDF kernel, RTX 3060), voxels/s.
BASELINE_VOXELS_PER_SECOND = 1.0e9


def main():
    import jax

    # If the environment requests a backend that failed to register (e.g. a
    # tunnelled accelerator plugin in a stripped env), fall back to auto.
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")

    import jax.numpy as jnp

    from hive_tpu.ops.tsdf_sparse import SparseTSDFVolume

    # Workload shape: VGA frames (the pipeline's default processing
    # resolution, hive/pipeline.py:194) into a 256^3-class volume.
    height, width = 480, 640
    num_frames = 16

    K = np.array([[580.0, 0, 319.5], [0, 580.0, 239.5], [0, 0, 1.0]], dtype=np.float32)

    # Device-side synthetic scene: a wavy wall 1.5-3.5 m away, textured colour.
    @jax.jit
    def make_frames():
        f = jax.lax.broadcasted_iota(jnp.float32, (num_frames, height, width), 0)
        v = jax.lax.broadcasted_iota(jnp.float32, (num_frames, height, width), 1)
        u = jax.lax.broadcasted_iota(jnp.float32, (num_frames, height, width), 2)

        depths = 2.5 + 0.3 * jnp.sin(u * 0.02 + f * 0.3) * jnp.cos(v * 0.03)
        colors = jnp.stack([(u * 0.4) % 255.0, (v * 0.5) % 255.0,
                            (u + v + 30.0 * f) % 255.0], axis=-1)
        return depths, colors

    depths, colors = make_frames()
    jax.block_until_ready((depths, colors))

    poses = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
    poses[:, 0, 3] = np.linspace(0.0, 0.5, num_frames) + 0.0123

    bounds = np.array([[-2.0, 2.0], [-2.0, 2.0], [0.0, 4.0]], dtype=np.float32)
    # Production configuration: banded/sparse integration — the serialized
    # per-voxel gather only runs on surface-band blocks
    # (see hive_tpu/ops/tsdf_sparse.py).
    volume = SparseTSDFVolume(bounds, voxel_size=4.0 / 256)
    num_voxels = volume.num_voxels

    def force():
        # Scalar materialisation sequences all queued device work.
        return float(jnp.sum(volume.state.weight.astype(jnp.float32)))

    # Warmup: compile the scan.
    volume.integrate_frames(colors, depths, K, poses)
    force()

    # Median of five timed runs (remote-tunnel latency is noisy: +-4%
    # run-to-run observed on identical code).
    samples = []
    for _ in range(5):
        start = time.perf_counter()
        volume.integrate_frames(colors, depths, K, poses)
        force()
        samples.append(time.perf_counter() - start)

    elapsed = sorted(samples)[len(samples) // 2]
    voxel_updates_per_second = (num_voxels * num_frames) / elapsed

    print(json.dumps({
        "metric": "tsdf_voxel_updates_per_second",
        "value": round(voxel_updates_per_second),
        "unit": "voxels/s",
        "vs_baseline": round(voxel_updates_per_second / BASELINE_VOXELS_PER_SECOND, 3),
    }))


if __name__ == "__main__":
    main()
