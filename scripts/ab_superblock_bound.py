#!/usr/bin/env python
"""Close the two-level superblock-classification ledger item with a bound.

A superblock pre-pass (classify 4x4x4 groups of blocks first, descend only
into mixed groups) could only reduce two pass-1 costs:

  (a) per-block projection arithmetic over all nb blocks, and
  (b) pass-1 pyramid queries over the compacted candidate list.

It cannot touch the refine-pass queries (those run on band blocks, which a
coarser pass cannot thin), the band pixel gathers, frame packing, or state
updates. So the total pass-1 classification cost is a HARD upper bound on
any superblock win — and the classify_const stub delta (all pyramid queries
removed, pass-1 AND refine) is an even more generous bound on the query
share alone.

Measures, same-process at bench shapes (VGA x 64 frames into a 256^3-class
volume, call floor amortised), median of 5 each:

  1. full integrate (production configuration)        -> T_full
  2. full integrate with stub="classify_const"        -> T_noquery
  3. pass-1 classify scan alone                       -> T_pass1
  4. classify+refine scan                             -> T_classify

Decision (VERDICT r2 #7): superblock_max_win = min(T_pass1, T_full -
T_noquery) / T_full. Keep-threshold is ~5%; below that the item goes to the
measured-dead-ends ledger with these numbers.
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


def timed(fn, n=5):
    fn()  # warm/compile
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        float(r)  # scalar materialisation forces completion
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
    volume = SparseTSDFVolume(bounds, voxel_size=4.0 / 256)
    nb, bv = volume.num_blocks, volume.block_voxels
    print(f"blocks={nb} voxels={volume.num_voxels / 1e6:.1f}M "
          f"frames={NUM_FRAMES}")

    frac = volume.estimate_candidate_fraction(K, poses, HEIGHT, WIDTH)
    cap = pick_compact_cap(frac)
    integ = volume._build_integrator(HEIGHT, WIDTH, compact_cap=cap)
    integ_noq = volume._build_integrator(HEIGHT, WIDTH, compact_cap=cap,
                                         stub="classify_const")
    print(f"candidate_frac={frac:.3f} compact_cap={cap}")

    intr = jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], dtype=jnp.float32)
    w2c = jnp.linalg.inv(jnp.asarray(poses, dtype=jnp.float32))
    obs = jnp.ones((NUM_FRAMES,), dtype=jnp.float32)
    bo = volume.block_origins_device

    def fresh_state():
        return SparseTSDFState(tsdf=jnp.ones((nb, bv), jnp.float32),
                               weight=jnp.zeros((nb, bv), jnp.float32),
                               color=jnp.zeros((nb, 3 * bv), jnp.float32))

    def full_with(i):
        # depths/colors must be ARGUMENTS, not closure constants: closed-over
        # frame stacks get embedded in the serialized program, and this
        # tunnel's remote-compile endpoint rejects the upload (HTTP 413)
        # at 64-frame sizes.
        jitted = jax.jit(lambda s, d, c: i.scan_impl(s, bo, d, c, w2c,
                                                     intr, obs))

        def run():
            out = jitted(fresh_state(), depths, colors)
            return jnp.sum(out.weight.astype(jnp.float32))
        return run

    def classify_scan_fn(classify):
        @jax.jit
        def scan(depths, w2c):
            def body(carry, frame):
                depth, m = frame
                out = classify(bo, depth, m[:3, :3], m[:3, 3], intr)
                classes = out[0] if isinstance(out, tuple) else out
                return carry + jnp.sum(classes), None
            total, _ = jax.lax.scan(body, jnp.int32(0), (depths, w2c))
            return total
        return scan

    t_full = timed(full_with(integ))
    ms = lambda t: t / NUM_FRAMES * 1e3
    ups = volume.num_voxels * NUM_FRAMES / t_full / 1e6
    print(f"T_full      : {ms(t_full):7.2f} ms/frame ({ups:.0f}M upd/s)")

    t_noquery = timed(full_with(integ_noq))
    print(f"T_noquery   : {ms(t_noquery):7.2f} ms/frame "
          f"(all pyramid queries stubbed)")

    scan_p1 = classify_scan_fn(integ.classify)
    t_pass1 = timed(lambda: scan_p1(depths, w2c))
    print(f"T_pass1     : {ms(t_pass1):7.2f} ms/frame (pass-1 classify scan)")

    scan_cr = classify_scan_fn(integ.classify_refined)
    t_classify = timed(lambda: scan_cr(depths, w2c))
    print(f"T_classify  : {ms(t_classify):7.2f} ms/frame (pass-1 + refine)")

    # Pass-1 with its pyramid queries stubbed to constants: what remains is
    # the nb-proportional work (corner projection over all blocks, candidate
    # compaction, scatter-back) — exactly and ONLY the share a superblock
    # pre-pass could reduce. The candidate queries themselves are real
    # surface-adjacent work a coarser pass cannot thin.
    scan_p1s = classify_scan_fn(integ_noq.classify)
    t_pass1_stub = timed(lambda: scan_p1s(depths, w2c))
    print(f"T_pass1_stub: {ms(t_pass1_stub):7.2f} ms/frame "
          f"(pass-1, queries stubbed = nb-proportional share)")

    # Note: T_noquery (full integrate with classify_const) is NOT a clean
    # query-cost isolate — constant depth bounds change the class mix and so
    # the downstream band workload; report it only as context.
    bound = t_pass1_stub
    print(f"\nsuperblock max win = nb-proportional pass-1 share "
          f"= {ms(bound):.2f} ms/frame = {bound / t_full * 100:.1f}% of full "
          f"(and a real pre-pass keeps its own cost + all candidate work)")
    print("keep-threshold 5%:",
          "WORTH IMPLEMENTING" if bound / t_full >= 0.05 else
          "below threshold -> measured dead end")


if __name__ == "__main__":
    main()
