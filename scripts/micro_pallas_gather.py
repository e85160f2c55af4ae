#!/usr/bin/env python
"""Micro-experiment: per-block patch sampling via in-vreg Pallas gather.

The sparse TSDF integrator's remaining bill is dominated by the band pixel
gather (~8.8 of ~13-17 ms/frame at bench shapes): one serialized XLA gather
per band voxel (~7 ns/element in-situ; CLAUDE.md measured facts). Mosaic's
hardware gather works WITHIN one 128-lane vreg, so a block-structured
alternative exists in principle:

  * band voxels come in whole (8,8,8) blocks (512 contiguous voxels);
  * a block's projected footprint is a small image patch; if it fits a
    PH x 256 window whose lane start is 128-aligned, each patch row spans
    exactly two vregs;
  * per 128-voxel lane group: PH x 2 in-vreg gathers + selects replace 128
    serialized element gathers.

This script answers, on real hardware:
  Q1  does `jnp.take` of a (128,)-vreg by per-lane indices compile in a
      (non-interpret) Pallas kernel on this part?
  Q2  throughput of patch-windowed Pallas sampling vs the production XLA
      element gather, same workload, same process.

Run on the TPU: python scripts/micro_pallas_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from hive_tpu.utils import enable_compile_cache

enable_compile_cache()

H, W = 480, 640
PH = 16           # patch rows per block window
PW = 256          # patch cols (two 128-lane vregs)
BV = 512          # voxels per block
NB = 1024         # blocks per timed call (= 512K samples)
REPS = 8          # scan length per timed call


def timed(fn, n=5):
    fn()
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


# --------------------------------------------------------------------- Q1
# Mosaic rejects 1D gathers ("Only 2D gather is supported") — probe the 2D
# forms: take_along_axis over lanes (axis=1, the per-row column gather) and
# over sublanes (axis=0, the per-lane row select).

def q1_lane_kernel(src_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(src_ref[:, :], idx_ref[:, :], axis=1)


def q1_sublane_kernel(src_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(src_ref[:, :], idx_ref[:, :], axis=0)


def q1(interpret=False):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 2**31, (8, 128)).astype(np.uint32))

    ok_lane = ok_sub = False

    idx = jnp.asarray(rng.integers(0, 128, (8, 128)), dtype=jnp.int32)
    try:
        out = pl.pallas_call(
            q1_lane_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            interpret=interpret,
        )(src, idx)
        ok_lane = np.array_equal(
            np.asarray(out),
            np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1))
        print(f"Q1 lane gather (take_along_axis axis=1 on (8,128)): "
              f"{'OK exact' if ok_lane else 'WRONG VALUES'}")
    except Exception as exc:
        print(f"Q1 lane gather FAILED: {type(exc).__name__}: {str(exc)[:200]}")

    ridx = jnp.asarray(rng.integers(0, 8, (8, 128)), dtype=jnp.int32)
    try:
        out = pl.pallas_call(
            q1_sublane_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            interpret=interpret,
        )(src, ridx)
        ok_sub = np.array_equal(
            np.asarray(out),
            np.take_along_axis(np.asarray(src), np.asarray(ridx), axis=0))
        print(f"Q1 sublane gather (axis=0): "
              f"{'OK exact' if ok_sub else 'WRONG VALUES'}")
    except Exception as exc:
        print(f"Q1 sublane gather FAILED: {type(exc).__name__}: "
              f"{str(exc)[:200]}")

    return ok_lane, ok_sub


# --------------------------------------------------------------------- Q2
def make_pallas_fn(use_sublane=True, interpret=False):
    from jax.experimental.pallas import tpu as pltpu

    def kernel(v0_ref, u0_ref, img_ref, vv_ref, uu_ref, out_ref):
        """One grid step = one block: gather BV samples from a PH x PW window.

        v0/u0: per-block window origins (u0 128-aligned), scalar-prefetched.
        vv/uu absolute pixel coords, (1, BV//128, 128) blocks. The whole
        image is VMEM-resident (480x640 u32 = 1.2 MB).

        Mosaic supports only 2D gathers, so sampling runs on (8, 128) vreg
        tiles: per tile ONE lane gather (each of the 8 rows column-gathered
        at the voxel's u) then ONE sublane gather (per-lane row select) —
        8 vector ops per 128 voxels instead of 128 serialized element loads.
        """
        b = pl.program_id(0)
        v0 = v0_ref[b]
        u0 = pl.multiple_of(u0_ref[b], 128)

        patch = img_ref[pl.ds(v0, PH), pl.ds(u0, PW)]    # (PH, PW)

        for g in range(BV // 128):
            pv = vv_ref[0, g, :] - v0                     # (128,) in [0, PH)
            pu = uu_ref[0, g, :] - u0                     # (128,) in [0, PW)

            acc = jnp.zeros((128,), jnp.uint32)
            for s in range(PH // 8):
                rv = pv - 8 * s
                row_ok = (rv >= 0) & (rv < 8)
                rv_c = jnp.clip(rv, 0, 7)
                for h in range(PW // 128):
                    cu = pu - 128 * h
                    col_ok = (cu >= 0) & (cu < 128)
                    cu_c = jnp.clip(cu, 0, 127)
                    tile = patch[8 * s:8 * s + 8, 128 * h:128 * h + 128]
                    colg = jnp.take_along_axis(
                        tile, jnp.broadcast_to(cu_c[None, :], (8, 128)),
                        axis=1)
                    if use_sublane:
                        val = jnp.take_along_axis(colg, rv_c[None, :],
                                                  axis=0)[0]
                    else:
                        val = jnp.zeros((128,), jnp.uint32)
                        for r in range(8):
                            val = jnp.where(rv_c == r, colg[r, :], val)
                    acc = jnp.where(row_ok & col_ok, val, acc)
            out_ref[0, g, :] = acc

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((H, W), lambda b, *_: (0, 0)),  # image in VMEM
                pl.BlockSpec((1, BV // 128, 128), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, BV // 128, 128), lambda b, *_: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BV // 128, 128),
                                   lambda b, *_: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, BV // 128, 128), jnp.uint32),
        interpret=interpret,
    )


def q2(use_sublane=True, interpret=False):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 2**32, (H, W), dtype=np.uint64)
                      .astype(np.uint32))

    # Synthetic block footprints: window origins + in-window voxel coords.
    v0 = rng.integers(0, H - PH, NB).astype(np.int32)
    u0 = (rng.integers(0, (W - PW) // 128, NB) * 128).astype(np.int32)
    vv = (v0[:, None] + rng.integers(0, PH, (NB, BV))).astype(np.int32)
    uu = (u0[:, None] + rng.integers(0, PW, (NB, BV))).astype(np.int32)

    v0j, u0j = jnp.asarray(v0), jnp.asarray(u0)
    vvj = jnp.asarray(vv.reshape(NB, BV // 128, 128))
    uuj = jnp.asarray(uu.reshape(NB, BV // 128, 128))

    try:
        pallas_fn = make_pallas_fn(use_sublane=use_sublane,
                                   interpret=interpret)
        out = pallas_fn(v0j, u0j, img, vvj, uuj)
        jax.block_until_ready(out)
    except Exception as exc:
        print(f"Q2 Pallas kernel FAILED: {type(exc).__name__}: "
              f"{str(exc)[:400]}")
        return

    expected = np.asarray(img)[vv, uu]
    got = np.asarray(out).reshape(NB, BV)
    if not np.array_equal(got, expected):
        bad = np.mean(got != expected)
        print(f"Q2 VALUES WRONG ({bad:.1%} mismatched) — unusable")
        return
    print("Q2 Pallas patch sampling: values exact")

    if interpret:
        print("(interpret mode — skipping timing)")
        return

    # Timed A/B, REPS-deep scans over varying inputs (LICM/DCE safe).
    def pallas_scan():
        def body(carry, r):
            o = pallas_fn(v0j, u0j, img + r, vvj, uuj)
            return carry + jnp.sum(o, dtype=jnp.uint32), None
        total, _ = jax.lax.scan(body, jnp.uint32(0),
                                jnp.arange(REPS, dtype=jnp.uint32))
        return total

    flat = jnp.asarray((vv * W + uu).reshape(-1))

    def take_scan():
        def body(carry, r):
            o = jnp.take((img + r).reshape(-1), flat)
            return carry + jnp.sum(o, dtype=jnp.uint32), None
        total, _ = jax.lax.scan(body, jnp.uint32(0),
                                jnp.arange(REPS, dtype=jnp.uint32))
        return total

    pallas_jit = jax.jit(pallas_scan)
    take_jit = jax.jit(take_scan)

    n_samples = NB * BV * REPS
    t_p = timed(lambda: pallas_jit())
    t_t = timed(lambda: take_jit())
    print(f"Q2 pallas : {t_p * 1e3:8.2f} ms -> {t_p / n_samples * 1e9:6.2f} ns/sample")
    print(f"Q2 take   : {t_t * 1e3:8.2f} ms -> {t_t / n_samples * 1e9:6.2f} ns/sample")
    print(f"Q2 speedup: {t_t / t_p:.2f}x")


if __name__ == "__main__":
    interpret = jax.default_backend() == "cpu"
    print(f"backend: {jax.default_backend()} interpret={interpret}")
    ok_lane, ok_sub = q1(interpret=interpret)
    if ok_lane:
        q2(use_sublane=ok_sub, interpret=interpret)
