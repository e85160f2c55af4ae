#!/usr/bin/env python
"""Per-stage cost breakdown of the sparse TSDF integrator on real hardware.

Times, for the bench.py workload (VGA frames into a 256^3-class volume):
  * classify-only scan over the frame stack (pyramid build + block gathers)
  * full integrate scan (classify + band updates + batched free pass)
  * band statistics (band/free/skip block counts per frame)

All inputs are synthesised on device; repetitions ride a lax.scan over
VARYING frames and every timed program returns a full-state checksum
(LICM/DCE pitfalls — see CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hive_tpu.ops.tsdf_sparse import SparseTSDFVolume


def make_workload(num_frames=16, height=480, width=640):
    K = np.array([[580.0, 0, 319.5], [0, 580.0, 239.5], [0, 0, 1.0]],
                 dtype=np.float32)

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

    return K, depths, colors, poses


def timed(fn, n=3):
    fn()  # warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        float(r)  # scalar materialisation forces completion
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def main():
    dim = int(os.environ.get("HIVE_PROFILE_DIM", "256"))  # volume = dim^3
    K, depths, colors, poses = make_workload()
    num_frames = depths.shape[0]

    bounds = np.array([[-2.0, 2.0], [-2.0, 2.0], [0.0, 4.0]], dtype=np.float32)
    volume = SparseTSDFVolume(bounds, voxel_size=4.0 / dim)
    print(f"blocks={volume.num_blocks} block_voxels={volume.block_voxels} "
          f"voxels={volume.num_voxels / 1e6:.1f}M")

    height, width = depths.shape[1:]
    from hive_tpu.ops.tsdf_sparse import pick_compact_cap

    frac = volume.estimate_candidate_fraction(K, poses, height, width)
    cap = pick_compact_cap(frac)
    integ = volume._integrators.setdefault(
        (height, width, cap),
        volume._build_integrator(height, width, compact_cap=cap))
    print(f"chunk(blocks/trip)={integ.chunk} candidate_frac={frac:.3f} "
          f"compact_cap={cap}")

    intr = jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], dtype=jnp.float32)
    w2c = jnp.linalg.inv(jnp.asarray(poses, dtype=jnp.float32))
    obs = jnp.ones((num_frames,), dtype=jnp.float32)
    bo = volume.block_origins_device

    # --- band statistics (once) ---
    def count_classes_fn(classify):
        @jax.jit
        def count_classes(depths, w2c):
            def body(carry, frame):
                depth, m = frame
                classes = classify(bo, depth, m[:3, :3], m[:3, 3], intr)
                counts = jnp.stack([jnp.sum(classes == c) for c in range(4)])
                return carry, counts
            _, counts = jax.lax.scan(body, 0, (depths, w2c))
            return counts
        return count_classes

    counts = np.asarray(count_classes_fn(integ.classify)(depths, w2c))
    print("pass-1 per-frame class counts [skip, free, band, free_edge]:")
    print(counts[:4])
    counts = np.asarray(count_classes_fn(integ.classify_refined)(depths, w2c))
    print("refined per-frame class counts [skip, free, band, free_edge]:")
    print(counts[:4])
    band_blocks = counts[:, 2]
    print(f"mean band blocks/frame: {band_blocks.mean():.0f} "
          f"({band_blocks.mean() * volume.block_voxels / 1e3:.0f}K voxels), "
          f"trips/frame ~ {np.ceil(band_blocks / integ.chunk).mean():.1f}")

    # --- classify-only scan ---
    def classify_scan_fn(classify):
        @jax.jit
        def classify_scan(depths, w2c):
            def body(carry, frame):
                depth, m = frame
                classes = classify(bo, depth, m[:3, :3], m[:3, 3], intr)
                return carry + jnp.sum(classes), None
            total, _ = jax.lax.scan(body, jnp.int32(0), (depths, w2c))
            return total
        return classify_scan

    scan1 = classify_scan_fn(integ.classify)
    t_classify = timed(lambda: scan1(depths, w2c))
    print(f"classify pass-1: {t_classify * 1e3:.1f} ms total, "
          f"{t_classify / num_frames * 1e3:.2f} ms/frame")

    scan2 = classify_scan_fn(integ.classify_refined)
    t_classify = timed(lambda: scan2(depths, w2c))
    print(f"classify+refine: {t_classify * 1e3:.1f} ms total, "
          f"{t_classify / num_frames * 1e3:.2f} ms/frame")

    # --- full integrate scan (fresh state each run; NOT donated here) ---
    def full():
        state = SparseTSDFVolume(bounds, voxel_size=4.0 / dim).state
        out = integ.scan_impl(state, bo, depths, colors, w2c, intr, obs)
        return jnp.sum(out.weight.astype(jnp.float32))

    full_jit = jax.jit(lambda s: integ.scan_impl(s, bo, depths, colors, w2c,
                                                 intr, obs))

    def run_full():
        state = SparseTSDFState_fresh()
        out = full_jit(state)
        return jnp.sum(out.weight.astype(jnp.float32))

    def SparseTSDFState_fresh():
        from hive_tpu.ops.tsdf_sparse import SparseTSDFState
        nb, bv = volume.num_blocks, volume.block_voxels
        return SparseTSDFState(tsdf=jnp.ones((nb, bv), jnp.float32),
                               weight=jnp.zeros((nb, bv), jnp.float32),
                               color=jnp.zeros((nb, 3 * bv), jnp.float32))

    t_full = timed(run_full)
    print(f"full integrate: {t_full * 1e3:.1f} ms total, "
          f"{t_full / num_frames * 1e3:.2f} ms/frame, "
          f"{volume.num_voxels * num_frames / t_full / 1e6:.0f}M voxel-updates/s")
    print(f"band+free residual (full - classify): "
          f"{(t_full - t_classify) / num_frames * 1e3:.2f} ms/frame")

    # --- ablation stubs (see SparseTSDFVolume._build_integrator) -----------
    intr_j, w2c_j, obs_j = intr, w2c, obs

    def full_with(integ_s):
        jitted = jax.jit(lambda s: integ_s.scan_impl(s, bo, depths, colors,
                                                     w2c_j, intr_j, obs_j))

        def run():
            out = jitted(SparseTSDFState_fresh())
            return jnp.sum(out.weight.astype(jnp.float32))
        return run

    for s in ("sample_const", "rows_contig"):
        integ_s = volume._build_integrator(height, width, compact_cap=cap,
                                           stub=s)
        t_s = timed(full_with(integ_s))
        print(f"full integrate [{s}]: {t_s / num_frames * 1e3:.2f} ms/frame "
              f"(saves {(t_full - t_s) / num_frames * 1e3:.2f} ms/frame)")

    integ_c = volume._build_integrator(height, width, compact_cap=cap,
                                       stub="classify_const")
    scan_c = classify_scan_fn(integ_c.classify_refined)
    t_c = timed(lambda: scan_c(depths, w2c))
    print(f"classify+refine [classify_const]: {t_c / num_frames * 1e3:.2f} "
          f"ms/frame (pyramid-gather bill ~ "
          f"{(t_classify - t_c) / num_frames * 1e3:.2f} ms/frame)")

    # --- pyramid build + frame pack, in isolation ---------------------------
    from hive_tpu.ops.tsdf_sparse import build_flat_pyramid

    @jax.jit
    def pyramid_scan(depths):
        def body(carry, depth):
            p = build_flat_pyramid(depth, height, width)
            return carry + jnp.sum(jnp.real(p[-4:])), None
        total, _ = jax.lax.scan(body, jnp.float32(0), depths)
        return total

    t_pyr = timed(lambda: pyramid_scan(depths))
    print(f"pyramid build only: {t_pyr / num_frames * 1e3:.2f} ms/frame")


if __name__ == "__main__":
    main()
