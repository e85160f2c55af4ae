#!/usr/bin/env python
"""Same-session A/B of sort- vs nonzero-based compaction in the extraction
path (_emit_core's per-chunk triangle compaction; the integrator's trips and
the dense-path _active_indices share the same knob).

HIVE_TSDF_COMPACT binds at trace time, so each config runs in its own
subprocess, back-to-back in the same tunnel session (same weather). The
child integrates a VGA sphere scene on the accelerator, then times THREE
warm get_mesh() calls (rep 1 discarded: size-class compiles) and prints the
median and a mesh checksum.
"""

import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(root)r)
import numpy as np
from hive_tpu.ops.tsdf_sparse import SparseTSDFVolume
from hive_tpu.utils import enable_compile_cache
enable_compile_cache()

H, W = 480, 640
K = np.array([[580.0, 0, 319.5], [0, 580.0, 239.5], [0, 0, 1.0]], np.float32)
CENTER = np.array([0.0, 0.0, 2.0], np.float32)
RADIUS = 1.1

def look_at(eye, target):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    if abs(fwd @ up) > 0.95:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up); right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, down, fwd, eye
    return m

def sphere_depth(cam_to_world):
    w2c = np.linalg.inv(cam_to_world)
    c = w2c[:3, :3] @ CENTER + w2c[:3, 3]
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    rays = np.stack([(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1],
                     np.ones_like(us, float)], axis=-1)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    b = rays @ c
    disc = b ** 2 - (c @ c - RADIUS ** 2)
    t = b - np.sqrt(np.maximum(disc, 0.0))
    hit = (disc > 0) & (t > 0)
    depth = np.zeros((H, W), np.float32)
    depth[hit] = (t * rays[..., 2])[hit]
    return depth

bounds = np.array([[-2.0, 2.0], [-2.0, 2.0], [0.0, 4.0]], np.float32)
vol = SparseTSDFVolume(bounds, voxel_size=4.0 / float(os.environ.get("ABX_DIM", "320")))
num = 12
depths, colors, poses = [], [], []
for i in range(num):
    angle = 2 * np.pi * i / num
    eye = np.array([1.8 * np.sin(angle), 1.8 * np.cos(angle), 2.0
                    + 0.3 * np.sin(angle)], np.float32)
    pose = look_at(eye, CENTER)
    depths.append(sphere_depth(pose))
    rgb = np.zeros((H, W, 3), np.float32); rgb[..., 0] = 90 + i
    colors.append(rgb); poses.append(pose)
vol.integrate_frames(np.stack(colors), np.stack(depths), K, np.stack(poses))
print("voxels %%.1fM" %% (vol.num_voxels / 1e6), flush=True)

samples = []
for rep in range(3):
    t0 = time.perf_counter()
    verts, faces, norms, cols = vol.get_mesh()
    dt = time.perf_counter() - t0
    samples.append(dt)
    print("rep %%d: %%.2f s  (%%d verts, %%d faces)" %% (rep, dt, len(verts),
                                                     len(faces)), flush=True)
warm = sorted(samples[1:])
print("RESULT %(mode)s median_warm %%.3f s checksum %%.6e" %%
      (warm[len(warm) // 2],
       float(np.sum(verts) + np.sum(faces) + np.sum(cols.astype(np.float64)))),
      flush=True)
"""


def main():
    """argv: [ENV_VAR value ...] — defaults to HIVE_TSDF_COMPACT sort nonzero.
    ABX_DIM sets the volume resolution (voxel = 4/ABX_DIM)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    var = sys.argv[1] if len(sys.argv) > 2 else "HIVE_TSDF_COMPACT"
    values = sys.argv[2:] if len(sys.argv) > 2 else ["sort", "nonzero"]
    for mode in values:
        env = dict(os.environ, **{var: mode})
        code = CHILD % {"root": root, "mode": f"{var}={mode}"}
        print(f"=== {var}={mode} ===", flush=True)
        subprocess.run([sys.executable, "-c", code], env=env, check=True)


if __name__ == "__main__":
    main()
