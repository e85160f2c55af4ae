#!/usr/bin/env python
"""Micro-experiment: a FULLY-FUSED band-trip Pallas kernel.

The sparse TSDF integrator's remaining bill (CLAUDE.md cost attribution,
2026-08-19 late) is the band+free residual: sampling ~2.6 ms/frame (already
a Pallas window sampler) plus ~2.9 ms/frame of trip machinery — state row
gather/scatter, projection/unpack/update elementwise passes, and the
materialized intermediates between the sampler custom-call and the XLA
update (coords in, packed words out, then a second full pass over the rows).

A fused trip kernel would do, per band row, in ONE kernel:
  state rows in  (dynamic index_map from scalar-prefetched row ids)
  -> window DMA + in-vreg sampling (the proven pallas_sampler recipe)
  -> unpack + TSDF/weight/colour update math
  -> state rows out, aliased in-place (input_output_aliases).

This script answers, on real hardware:
  Q1  do DYNAMIC index_maps (ids from scalar prefetch) work for input AND
      output blocks, with input_output_aliases donating the state arrays?
      (Unvisited rows must keep their values — that's what aliasing buys.)
  Q2  is the in-kernel update math BIT-IDENTICAL to the XLA path?  The
      integrator's sparse-vs-dense contract is bit-exactness; the hazards
      are f32 divide lowering and FMA contraction differences.
  Q3  throughput: fused trip vs the production path (Pallas sampler +
      XLA gather/update/scatter) vs the classic all-XLA take path.

Run on the TPU: python scripts/micro_pallas_fused_band.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hive_tpu.utils import enable_compile_cache

enable_compile_cache()

H, W = 480, 640
PH, PW = 64, 256      # window (matches ops/pallas_sampler defaults)
BV = 512              # voxels per (8,8,8) block
G = BV // 128
K = 128               # rows per trip (the production chunk)
TRIPS = 8             # trips per timed call
NBS = 16384           # state rows (+1 dummy)
TRUNC = 0.08
REPS = 4


def timed(fn, n=5):
    # float() forces a scalar device->host transfer: block_until_ready can
    # return early through this tunnelled backend (CLAUDE.md measurement
    # rule), which would make these numbers read optimistically.
    float(fn())
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def unpack_words(w):
    depth = (w & 0xFFFF).astype(jnp.float32) * 1e-3
    r = ((w >> 16) & 31).astype(jnp.float32) * (255.0 / 31.0)
    g = ((w >> 21) & 63).astype(jnp.float32) * (255.0 / 63.0)
    b = ((w >> 27) & 31).astype(jnp.float32) * (255.0 / 31.0)
    return depth, r, g, b


def update_math(t_old, w_old, c_old, depth, rgb, cz, in_view, valid_row,
                obs_weight):
    """The production band update (band_update_values), shared verbatim by
    the XLA reference and (per 128-lane group) the Pallas kernel so any
    final-state mismatch isolates Mosaic-vs-XLA lowering, not formula skew."""
    sdf = depth - cz
    valid = in_view & (depth > 0.0) & (sdf >= -TRUNC) & valid_row
    dist = jnp.minimum(1.0, sdf / TRUNC)
    w_obs = jnp.where(valid, obs_weight, 0.0)
    w_new = w_old + w_obs
    safe_w = jnp.maximum(w_new, 1e-12)
    t_new = jnp.where(valid, (t_old * w_old + dist * w_obs) / safe_w, t_old)
    c_new = [jnp.where(valid, (c * w_old + rv * w_obs) / safe_w, c)
             for c, rv in zip(c_old, rgb)]
    return t_new, w_new, c_new


# ------------------------------------------------------------------ fused
def make_fused(interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ids_ref, v0_ref, u0_ref, obs_ref,
               img_hbm, vv_ref, uu_ref, cz_ref, t_ref, w_ref, c_ref,
               ot_ref, ow_ref, oc_ref, scratch, sem):
        b = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(b, 2)
        nxt = jax.lax.rem(b + 1, 2)

        @pl.when(b == 0)
        def _prime():
            v00 = pl.multiple_of(v0_ref[0], 8)
            u00 = pl.multiple_of(u0_ref[0], 128)
            pltpu.make_async_copy(
                img_hbm.at[pl.ds(v00, PH), pl.ds(u00, PW)],
                scratch.at[0], sem.at[0]).start()

        @pl.when(b + 1 < n)
        def _prefetch():
            i = jnp.minimum(b + 1, n - 1)
            v0n = pl.multiple_of(v0_ref[i], 8)
            u0n = pl.multiple_of(u0_ref[i], 128)
            pltpu.make_async_copy(
                img_hbm.at[pl.ds(v0n, PH), pl.ds(u0n, PW)],
                scratch.at[nxt], sem.at[nxt]).start()

        v0b = pl.multiple_of(v0_ref[b], 8)
        u0b = pl.multiple_of(u0_ref[b], 128)
        pltpu.make_async_copy(
            img_hbm.at[pl.ds(v0b, PH), pl.ds(u0b, PW)],
            scratch.at[slot], sem.at[slot]).wait()

        patch = scratch[slot]
        valid_row = ids_ref[b] < NBS
        obs_weight = obs_ref[0]

        for g in range(G):
            u = uu_ref[0, g, :]
            v = vv_ref[0, g, :]
            cz = cz_ref[0, g, :]
            in_view = ((cz > 1e-6) & (u >= 0) & (u < W)
                       & (v >= 0) & (v < H))
            vc = jnp.clip(v, 0, H - 1)
            uc = jnp.clip(u, 0, W - 1)
            pv = jnp.clip(vc - v0b, 0, PH - 1)
            pu = jnp.clip(uc - u0b, 0, PW - 1)

            acc = jnp.zeros((128,), jnp.uint32)
            for s in range(PH // 8):
                rv = pv - 8 * s
                row_ok = (rv >= 0) & (rv < 8)
                rv_c = jnp.broadcast_to(jnp.clip(rv, 0, 7)[None, :],
                                        (8, 128))
                for h in range(PW // 128):
                    cu = pu - 128 * h
                    col_ok = (cu >= 0) & (cu < 128)
                    cu_c = jnp.broadcast_to(jnp.clip(cu, 0, 127)[None, :],
                                            (8, 128))
                    tile = patch[8 * s:8 * s + 8, 128 * h:128 * h + 128]
                    colg = jnp.take_along_axis(tile, cu_c, axis=1)
                    val = jnp.take_along_axis(colg, rv_c, axis=0)[0]
                    acc = jnp.where(row_ok & col_ok, val, acc)

            depth, r, gg, bb = unpack_words(acc)
            sl = pl.ds(g * 128, 128)
            t_old = t_ref[0, sl]
            w_old = w_ref[0, sl]
            c_old = [c_ref[0, pl.ds(ch * BV + g * 128, 128)]
                     for ch in range(3)]
            t_new, w_new, c_new = update_math(
                t_old, w_old, c_old, depth, (r, gg, bb), cz, in_view,
                valid_row, obs_weight)
            ot_ref[0, sl] = t_new
            ow_ref[0, sl] = w_new
            for ch in range(3):
                oc_ref[0, pl.ds(ch * BV + g * 128, 128)] = c_new[ch]

    nrows = NBS + 1

    def row_map(b, ids, v0, u0, obs):
        return (ids[b], 0)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(K,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),               # frame HBM
                pl.BlockSpec((1, G, 128), lambda b, *_: (b, 0, 0)),   # v
                pl.BlockSpec((1, G, 128), lambda b, *_: (b, 0, 0)),   # u
                pl.BlockSpec((1, G, 128), lambda b, *_: (b, 0, 0)),   # camz
                pl.BlockSpec((1, BV), row_map),                  # tsdf rows
                pl.BlockSpec((1, BV), row_map),                  # weight rows
                pl.BlockSpec((1, 3 * BV), row_map),              # colour rows
            ],
            out_specs=[
                pl.BlockSpec((1, BV), row_map),
                pl.BlockSpec((1, BV), row_map),
                pl.BlockSpec((1, 3 * BV), row_map),
            ],
            scratch_shapes=[pltpu.VMEM((2, PH, PW), jnp.uint32),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=[jax.ShapeDtypeStruct((nrows, BV), jnp.float32),
                   jax.ShapeDtypeStruct((nrows, BV), jnp.float32),
                   jax.ShapeDtypeStruct((nrows, 3 * BV), jnp.float32)],
        # scalars ids/v0/u0/obs are inputs 0-3; img 4; v/u/cz 5-7;
        # tsdf/weight/colour 8-10 alias outputs 0-2.
        input_output_aliases={8: 0, 9: 1, 10: 2},
        interpret=interpret,
    )


# ------------------------------------------------------------ XLA mirrors
def xla_trip(state, ids, vv, uu, cz, img, obs_weight, sampler=None,
             win_v0=None, win_u0=None):
    """The production trip: row gather -> sample -> update -> row scatter.
    ``sampler`` None = classic take path; else the pallas window sampler."""
    st, sw, sc = state
    nrows = st.shape[0] - 1
    valid = ids < nrows
    rid = jnp.minimum(ids, nrows - 1)

    t_old = st[rid]
    w_old = sw[rid]
    c_old = sc[rid].reshape(K, 3, BV)

    in_view = ((cz > 1e-6) & (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H))
    vc = jnp.clip(vv, 0, H - 1)
    uc = jnp.clip(uu, 0, W - 1)
    if sampler is None:
        w = jnp.take(img.reshape(-1), vc * W + uc)
    else:
        w = sampler(win_v0, win_u0, img,
                    vc.reshape(K, G, 128), uc.reshape(K, G, 128)
                    ).reshape(K, BV)
    depth, r, g, b = unpack_words(w)
    t_new, w_new, c_new = update_math(
        t_old, w_old, [c_old[:, 0], c_old[:, 1], c_old[:, 2]],
        depth, (r, g, b), cz, in_view, valid[:, None], obs_weight)

    sid = jnp.where(valid, rid, nrows)
    return (st.at[sid].set(t_new, mode="drop"),
            sw.at[sid].set(w_new, mode="drop"),
            sc.at[sid].set(jnp.stack(c_new, 1).reshape(K, 3 * BV),
                           mode="drop"))


def main():
    interpret = jax.default_backend() == "cpu"
    print(f"backend: {jax.default_backend()} interpret={interpret}")
    rng = np.random.default_rng(0)

    img = jnp.asarray(rng.integers(0, 2**32, (H, W), dtype=np.uint64)
                      .astype(np.uint32))
    nrows = NBS + 1
    st = jnp.asarray(rng.normal(size=(nrows, BV)).astype(np.float32))
    sw = jnp.asarray(rng.uniform(0, 20, (nrows, BV)).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0, 255, (nrows, 3 * BV)).astype(np.float32))

    # Trip inputs: unique row ids (last 16 are padding -> dummy row), window
    # origins, coords mostly inside windows with some out-of-view lanes.
    ids = rng.choice(NBS, K - 16, replace=False).astype(np.int32)
    ids = np.concatenate([ids, np.full(16, NBS, np.int32)])
    v0 = (rng.integers(0, (H - PH) // 8, K) * 8).astype(np.int32)
    u0 = (rng.integers(0, (W - PW) // 128, K) * 128).astype(np.int32)
    vv = (v0[:, None] + rng.integers(0, PH, (K, BV))).astype(np.int32)
    uu = (u0[:, None] + rng.integers(0, PW, (K, BV))).astype(np.int32)
    oov = rng.random((K, BV)) < 0.05           # out-of-view lanes
    vv = np.where(oov, -3, vv)
    cz = rng.uniform(0.3, 4.0, (K, BV)).astype(np.float32)
    cz[rng.random((K, BV)) < 0.02] = 0.0       # behind-camera lanes

    idsj = jnp.asarray(ids)
    v0j, u0j = jnp.asarray(v0), jnp.asarray(u0)
    vvj, uuj, czj = jnp.asarray(vv), jnp.asarray(uu), jnp.asarray(cz)
    vvg = vvj.reshape(K, G, 128)
    uug = uuj.reshape(K, G, 128)
    czg = czj.reshape(K, G, 128)
    obs = jnp.asarray([1.0], jnp.float32)

    try:
        fused = make_fused(interpret=interpret)
        # No donation here: the XLA reference below needs st/sw/sc intact
        # (the alias forces a copy — correctness is unaffected).
        ft, fw, fc = jax.jit(lambda *a: fused(*a))(
            idsj, v0j, u0j, obs, img, vvg, uug, czg, st, sw, sc)
        jax.block_until_ready(ft)
    except Exception as exc:
        print(f"Q1 fused kernel FAILED: {type(exc).__name__}: "
              f"{str(exc)[:600]}")
        return

    # Pallas sampling clamps coords into the WINDOW while the take path
    # clamps into the IMAGE — masked lanes may sample different words, but
    # the masked update must make final state identical.
    xt, xw, xc = jax.jit(xla_trip)((st, sw, sc), idsj, vvj, uuj, czj, img,
                                   jnp.float32(1.0))

    # Row NBS is the dummy padding target: the fused kernel writes back its
    # original values, the XLA mirror scatters padded-lane junk into it.
    # Both are discard semantics — compare REAL rows only.
    ok = all(np.array_equal(np.asarray(a)[:NBS], np.asarray(b)[:NBS])
             for a, b in ((ft, xt), (fw, xw), (fc, xc)))
    if ok:
        print("Q1+Q2 fused trip: final state BIT-IDENTICAL to the XLA path")
    else:
        for name, a, b in (("tsdf", ft, xt), ("weight", fw, xw),
                           ("color", fc, xc)):
            a, b = np.asarray(a)[:NBS], np.asarray(b)[:NBS]
            bad = a != b
            print(f"Q2 {name}: {bad.mean():.2%} mismatched, "
                  f"max |d| {np.abs(a - b).max():.3e}, "
                  f"rows touched {np.unique(np.nonzero(bad)[0])[:8]}")
        print("Q2 NOT bit-identical — fused path would break the "
              "sparse-vs-dense contract unless relaxed")

    if interpret:
        print("(interpret mode — skipping timing)")
        return

    # ---------------------------------------------------------------- Q3
    from hive_tpu.ops.pallas_sampler import build_patch_sampler
    sampler = build_patch_sampler(H, W, K, G)

    ids_t = jnp.asarray(
        np.stack([np.concatenate([
            rng.choice(NBS, K - 16, replace=False).astype(np.int32),
            np.full(16, NBS, np.int32)]) for _ in range(TRIPS)]))

    def scan_of(trip_fn):
        def call(state0):
            def rep(state, rr):
                def body(state, trip_ids):
                    return trip_fn(state, trip_ids, rr), None
                state, _ = jax.lax.scan(body, state, ids_t)
                return state, None
                # varying rr defeats LICM across reps
            state, _ = jax.lax.scan(rep, state0,
                                    jnp.arange(REPS, dtype=jnp.uint32))
            return jnp.sum(state[1], dtype=jnp.float32)
        return jax.jit(call, donate_argnums=(0,))

    fused_scan = scan_of(
        lambda state, trip_ids, rr: tuple(fused(
            trip_ids, v0j, u0j, obs, img + rr, vvg, uug, czg, *state)))
    prod_scan = scan_of(
        lambda state, trip_ids, rr: xla_trip(
            state, trip_ids, vvj, uuj, czj, img + rr, jnp.float32(1.0),
            sampler=sampler, win_v0=v0j, win_u0=u0j))
    take_scan = scan_of(
        lambda state, trip_ids, rr: xla_trip(
            state, trip_ids, vvj, uuj, czj, img + rr, jnp.float32(1.0)))

    n_vox = K * BV * TRIPS * REPS

    def timed_donated(fn, n=5):
        # Donated buffers are consumed per call — rebuild fresh device
        # copies OUTSIDE the timed region each rep (identical cost across
        # the three variants, so the A/B is unaffected).
        def once():
            state = (jnp.array(st), jnp.array(sw), jnp.array(sc))
            jax.block_until_ready(state)
            t0 = time.perf_counter()
            float(fn(state))
            return time.perf_counter() - t0

        once()  # compile
        return sorted(once() for _ in range(n))[n // 2]

    for name, fn in (("fused ", fused_scan), ("prod  ", prod_scan),
                     ("take  ", take_scan)):
        t = timed_donated(fn)
        print(f"Q3 {name}: {t * 1e3:8.2f} ms -> "
              f"{t / n_vox * 1e9:6.2f} ns/voxel")


if __name__ == "__main__":
    main()
