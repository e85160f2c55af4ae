#!/usr/bin/env python
"""Benchmark: TSDF fusion throughput (voxel updates/second) on real hardware.

This is the framework's headline kernel (BASELINE.md "TSDF voxels/s"
north-star): the reference integrates VGA RGB-D frames into a voxel volume
with a PyCUDA kernel on an RTX 3060 (reference third_party tsdf-fusion-python,
driven by hive/fusion.py:102-127). Here the same workload — VGA frames, a
~38M-voxel volume at the default 5mm scale class — runs as the XLA-fused
integration kernel from hive_tpu.ops.tsdf.

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


def jnp_sum(volume):
    import jax.numpy as jnp

    return jnp.sum(volume.state.weight)


def main():
    import jax

    # If the environment requests a backend that failed to register (e.g. a
    # tunnelled accelerator plugin in a stripped env), fall back to auto.
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")

    from hive_tpu.ops.tsdf import TSDFVolume

    # Workload shape: VGA frames (the pipeline's default processing
    # resolution, hive/pipeline.py:194) into a 384x384x256 volume.
    height, width = 480, 640
    num_frames = 32
    dims = (384, 384, 256)

    rng = np.random.default_rng(0)

    K = np.array([[580.0, 0, 319.5], [0, 580.0, 239.5], [0, 0, 1.0]], dtype=np.float32)
    depths = rng.uniform(0.5, 4.0, size=(num_frames, height, width)).astype(np.float32)
    colors = rng.integers(0, 255, size=(num_frames, height, width, 3)).astype(np.float32)

    # Slowly translating camera (cam-to-world poses).
    poses = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
    poses[:, 0, 3] = np.linspace(0.0, 0.5, num_frames)

    import jax.numpy as jnp

    bounds = np.array([[-2.0, 2.0], [-2.0, 2.0], [0.0, 4.0]], dtype=np.float32)
    # bf16 storage: the production configuration (halves HBM traffic on the
    # bandwidth-bound integrate; ~0.1 mm SDF resolution at these voxel sizes).
    volume = TSDFVolume(bounds, voxel_size=4.0 / dims[2], dtype=jnp.bfloat16)
    num_voxels = volume.num_voxels

    # Warmup: compile the scan. A scalar reduction forces true completion
    # (block_until_ready can return early through remote-device tunnels).
    volume.integrate_frames(colors, depths, K, poses)
    float(jnp_sum(volume))

    # Timed runs. Successive calls chain through the donated volume state, so
    # one final forced materialisation sequences the whole run.
    runs = 3
    start = time.perf_counter()
    for _ in range(runs):
        volume.integrate_frames(colors, depths, K, poses)
    float(jnp_sum(volume))
    elapsed = time.perf_counter() - start

    voxel_updates_per_second = (num_voxels * num_frames * runs) / elapsed

    print(json.dumps({
        "metric": "tsdf_voxel_updates_per_second",
        "value": round(voxel_updates_per_second),
        "unit": "voxels/s",
        "vs_baseline": round(voxel_updates_per_second / BASELINE_VOXELS_PER_SECOND, 3),
    }))


if __name__ == "__main__":
    main()
