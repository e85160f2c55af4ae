#!/usr/bin/env python
"""Micro-experiment: a FUSED band-trip Pallas kernel.

The sparse TSDF integrator's remaining bill (CLAUDE.md cost attribution,
2026-08-19 late) is the band+free residual: sampling ~2.6 ms/frame (already
a Pallas window sampler) plus ~2.9 ms/frame of trip machinery — of which
state ROW gather/scatter is only ~0.06 (rows_contig stub), so the real cost
is the XLA elementwise passes and their materialized intermediates:
projection coords (K, BV) i32 x2, in_view masks, sampled words, unpacked
rgb, and a second full pass over the rows for the update math.

The fused trip kernel here takes the XLA-gathered state rows (row
gather/scatter STAYS in XLA — a (1, BV) state block does not lower, and
rows are cheap anyway) and does, per 8-row block of the trip, in ONE kernel:

  per-block window DMA (the proven pallas_sampler recipe, 8 windows/step,
  double-buffered) -> IN-KERNEL projection (origins + voxel-offset iotas ->
  cam coords -> u/v) -> in-vreg sampling -> u32 unpack -> TSDF/weight/colour
  update math -> rows out (aliased in-place).

This script answers, on real hardware:
  Q1  does the (8, BV)-block kernel with 8 window DMAs/step + in-kernel
      projection LOWER on this Mosaic version?
  Q2  is the result BIT-IDENTICAL to the XLA path? The integrator's
      sparse-vs-dense contract is bit-exactness; the hazards are f32
      divide/round lowering and FMA contraction differences — projection
      in particular (u = round(fx*x/z + cx)) now runs on the VPU.
  Q2b if full-projection bit-identity fails, a HALF-FUSED variant (coords
      computed by XLA outside, sampling+unpack+update in-kernel) isolates
      whether the update math alone is exact.
  Q3  throughput: fused trip vs the production path (Pallas sampler +
      XLA project/unpack/update) vs the classic all-XLA take path.

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

if os.environ.get("HIVE_FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")  # interpreter sanity runs
enable_compile_cache()

H, W = 480, 640
PH, PW = 64, 256      # window (matches ops/pallas_sampler defaults)
BV = 512              # voxels per (8,8,8) block
G = BV // 128
K = 128               # rows per trip (the production chunk)
TRIPS = 8             # trips per timed call
NBS = 16384           # state rows (+1 dummy)
TRUNC = 0.08
VOXEL = 0.0156
REPS = 4

FX, FY, CX, CY = 580.0, 580.0, 319.5, 239.5

# Flat in-block voxel index i -> (ix, iy, iz) iotas, z-major like the
# integrator (i = iz*Bx*By + ix*By + iy with Bx=By=Bz=8).
_flat = np.arange(BV)
IOTA = np.stack([((_flat // 8) % 8).astype(np.float32),
                 (_flat % 8).astype(np.float32),
                 (_flat // 64).astype(np.float32)]) * VOXEL  # (3, BV)


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
    # Every field fits in int32, and the cast chain u32 -> i32 -> f32 is
    # value-exact for them — Mosaic has no direct u32 -> f32 cast.
    def f32(x):
        return x.astype(jnp.int32).astype(jnp.float32)

    depth = f32(w & 0xFFFF) * 1e-3
    r = f32((w >> 16) & 31) * (255.0 / 31.0)
    g = f32((w >> 21) & 63) * (255.0 / 63.0)
    b = f32((w >> 27) & 31) * (255.0 / 31.0)
    return depth, r, g, b


def project(origins, R, t):
    """Camera coords + rounded pixel coords for every voxel of each row.
    ``origins`` (K, 3); returns cam_z, u, v as (K, BV) — shared verbatim by
    the XLA reference and (per row) the Pallas kernel."""
    wx = origins[:, 0:1] + IOTA[0][None, :]
    wy = origins[:, 1:2] + IOTA[1][None, :]
    wz = origins[:, 2:3] + IOTA[2][None, :]
    cam_x = R[0, 0] * wx + R[0, 1] * wy + R[0, 2] * wz + t[0]
    cam_y = R[1, 0] * wx + R[1, 1] * wy + R[1, 2] * wz + t[1]
    cam_z = R[2, 0] * wx + R[2, 1] * wy + R[2, 2] * wz + t[2]
    safe_z = jnp.where(cam_z > 1e-6, cam_z, 1.0)
    u = jnp.round(FX * cam_x / safe_z + CX).astype(jnp.int32)
    v = jnp.round(FY * cam_y / safe_z + CY).astype(jnp.int32)
    return cam_z, u, v


def update_math(t_old, w_old, c_old, depth, rgb, cz, in_view, valid_row,
                obs_weight):
    """The production band update (band_update_values), shared verbatim by
    the XLA reference and the Pallas kernel so any final-state mismatch
    isolates Mosaic-vs-XLA lowering, not formula skew."""
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
def make_fused(project_in_kernel=True, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SUBB = 8  # trip rows per grid step (sublane-aligned state blocks)

    def kernel(v0_ref, u0_ref, valid_ref, scal_ref, org_ref,
               *rest):
        if project_in_kernel:
            img_hbm, iota_ref, t_ref, w_ref, c_ref, ot_ref, ow_ref, \
                oc_ref, scratch, sem = rest
            vv_ref = uu_ref = cz_ref = None
        else:
            img_hbm, vv_ref, uu_ref, cz_ref, t_ref, w_ref, c_ref, \
                ot_ref, ow_ref, oc_ref, scratch, sem = rest
        b = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(b, 2)
        nxt = jax.lax.rem(b + 1, 2)

        def start_windows(step, slot_):
            for j in range(SUBB):
                i = step * SUBB + j
                v0 = pl.multiple_of(v0_ref[i], 8)
                u0 = pl.multiple_of(u0_ref[i], 128)
                pltpu.make_async_copy(
                    img_hbm.at[pl.ds(v0, PH), pl.ds(u0, PW)],
                    scratch.at[slot_, j], sem.at[slot_, j]).start()

        def wait_windows(step, slot_):
            for j in range(SUBB):
                i = step * SUBB + j
                v0 = pl.multiple_of(v0_ref[i], 8)
                u0 = pl.multiple_of(u0_ref[i], 128)
                pltpu.make_async_copy(
                    img_hbm.at[pl.ds(v0, PH), pl.ds(u0, PW)],
                    scratch.at[slot_, j], sem.at[slot_, j]).wait()

        @pl.when(b == 0)
        def _prime():
            start_windows(0, 0)

        @pl.when(b + 1 < n)
        def _prefetch():
            start_windows(b + 1, nxt)

        wait_windows(b, slot)

        obs_weight = scal_ref[0]
        R00, R01, R02 = scal_ref[1], scal_ref[2], scal_ref[3]
        R10, R11, R12 = scal_ref[4], scal_ref[5], scal_ref[6]
        R20, R21, R22 = scal_ref[7], scal_ref[8], scal_ref[9]
        t0, t1, t2 = scal_ref[10], scal_ref[11], scal_ref[12]

        for j in range(SUBB):
            i = b * SUBB + j
            v0b = v0_ref[i]
            u0b = u0_ref[i]
            valid_row = valid_ref[i] > 0

            for g in range(G):
                sl = pl.ds(g * 128, 128)
                if project_in_kernel:
                    ox, oy, oz = org_ref[i, 0], org_ref[i, 1], org_ref[i, 2]
                    wx = ox + iota_ref[0, g]
                    wy = oy + iota_ref[1, g]
                    wz = oz + iota_ref[2, g]
                    cam_x = R00 * wx + R01 * wy + R02 * wz + t0
                    cam_y = R10 * wx + R11 * wy + R12 * wz + t1
                    cz = R20 * wx + R21 * wy + R22 * wz + t2
                    safe_z = jnp.where(cz > 1e-6, cz, 1.0)
                    u = jnp.round(FX * cam_x / safe_z + CX).astype(jnp.int32)
                    v = jnp.round(FY * cam_y / safe_z + CY).astype(jnp.int32)
                else:
                    u = uu_ref[j, sl]
                    v = vv_ref[j, sl]
                    cz = cz_ref[j, sl]
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
                        tile = scratch[slot, j, 8 * s:8 * s + 8,
                                       128 * h:128 * h + 128]
                        colg = jnp.take_along_axis(tile, cu_c, axis=1)
                        val = jnp.take_along_axis(colg, rv_c, axis=0)[0]
                        acc = jnp.where(row_ok & col_ok, val, acc)

                depth, r, gg, bb = unpack_words(acc)
                t_old = t_ref[j, sl]
                w_old = w_ref[j, sl]
                c_old = [c_ref[j, pl.ds(ch * BV + g * 128, 128)]
                         for ch in range(3)]
                t_new, w_new, c_new = update_math(
                    t_old, w_old, c_old, depth, (r, gg, bb), cz, in_view,
                    valid_row, obs_weight)
                ot_ref[j, sl] = t_new
                ow_ref[j, sl] = w_new
                for ch in range(3):
                    oc_ref[j, pl.ds(ch * BV + g * 128, 128)] = c_new[ch]

    row_block = lambda b, *_: (b, 0)  # noqa: E731

    coord_specs = ([pl.BlockSpec((3, G, 128), lambda b, *_: (0, 0, 0))]
                   if project_in_kernel else [
        pl.BlockSpec((SUBB, BV), row_block),   # v
        pl.BlockSpec((SUBB, BV), row_block),   # u
        pl.BlockSpec((SUBB, BV), row_block),   # cam z
    ])
    n_coord = len(coord_specs)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            # v0, u0, valid, scalars(obs+R+t), origins — all SMEM prefetch.
            num_scalar_prefetch=5,
            grid=(K // SUBB,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + coord_specs + [
                pl.BlockSpec((SUBB, BV), row_block),       # tsdf rows
                pl.BlockSpec((SUBB, BV), row_block),       # weight rows
                pl.BlockSpec((SUBB, 3 * BV), row_block),   # colour rows
            ],
            out_specs=[
                pl.BlockSpec((SUBB, BV), row_block),
                pl.BlockSpec((SUBB, BV), row_block),
                pl.BlockSpec((SUBB, 3 * BV), row_block),
            ],
            scratch_shapes=[pltpu.VMEM((2, SUBB, PH, PW), jnp.uint32),
                            pltpu.SemaphoreType.DMA((2, SUBB))],
        ),
        out_shape=[jax.ShapeDtypeStruct((K, BV), jnp.float32),
                   jax.ShapeDtypeStruct((K, BV), jnp.float32),
                   jax.ShapeDtypeStruct((K, 3 * BV), jnp.float32)],
        # prefetch scalars are inputs 0-4; img 5; [coords 6-8;] state rows
        # alias outputs.
        input_output_aliases={6 + n_coord: 0, 7 + n_coord: 1,
                              8 + n_coord: 2},
        interpret=interpret,
    )


# ------------------------------------------------------------ XLA mirrors
def xla_trip(state, ids, origins, R, t, img, obs_weight, sampler=None,
             win_v0=None, win_u0=None):
    """The production trip: row gather -> project -> sample -> update ->
    row scatter. ``sampler`` None = classic take path; else the pallas
    window sampler."""
    st, sw, sc = state
    nrows = st.shape[0] - 1
    valid = ids < nrows
    rid = jnp.minimum(ids, nrows - 1)

    t_old = st[rid]
    w_old = sw[rid]
    c_old = sc[rid].reshape(K, 3, BV)

    cz, uu, vv = project(origins, R, t)
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


def fused_trip(fused, project_in_kernel, state, ids, origins, R, t, img,
               obs_weight, win_v0, win_u0):
    """Row gather (XLA) -> fused kernel -> row scatter (XLA)."""
    st, sw, sc = state
    nrows = st.shape[0] - 1
    valid = ids < nrows
    rid = jnp.minimum(ids, nrows - 1)

    scal = jnp.concatenate([jnp.asarray([obs_weight], jnp.float32),
                            R.reshape(-1), t.reshape(-1)])
    args = [win_v0, win_u0, valid.astype(jnp.int32), scal,
            origins, img]
    if project_in_kernel:
        args += [jnp.asarray(IOTA.reshape(3, G, 128))]
    else:  # half-fused: ship coords
        cz, uu, vv = project(origins, R, t)
        args += [vv, uu, cz]
    t_new, w_new, c_new = fused(*args, st[rid], sw[rid], sc[rid])

    sid = jnp.where(valid, rid, nrows)
    return (st.at[sid].set(t_new, mode="drop"),
            sw.at[sid].set(w_new, mode="drop"),
            sc.at[sid].set(c_new, mode="drop"))


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

    # Camera: identity-ish rotation with a small tilt, origin offsets chosen
    # so block footprints land inside windows and some voxels fall out of
    # view (negative coords / behind camera).
    theta = 0.05
    R = np.array([[np.cos(theta), 0, np.sin(theta)],
                  [0, 1, 0],
                  [-np.sin(theta), 0, np.cos(theta)]], np.float32)
    t = np.array([0.01, -0.02, 0.05], np.float32)

    ids = rng.choice(NBS, K - 16, replace=False).astype(np.int32)
    ids = np.concatenate([ids, np.full(16, NBS, np.int32)])

    # Block origins: mostly in front of the camera at 1.5-3.5 m, spread so
    # the projected AABB fits a 64x256 window; a few behind-camera rows.
    origins = np.stack([
        rng.uniform(-0.8, 0.8, K),
        rng.uniform(-0.6, 0.6, K),
        rng.uniform(1.5, 3.5, K)], axis=-1).astype(np.float32)
    origins[rng.random(K) < 0.03, 2] = -0.5

    # Window origins from the projected corner hulls (mirrors refine_band's
    # fit logic, host-side for the experiment).
    cz, uu, vv = jax.jit(project)(jnp.asarray(origins), jnp.asarray(R),
                                  jnp.asarray(t))
    uu = np.asarray(uu); vv = np.asarray(vv)
    v0 = np.clip((vv.min(axis=1) - 1) // 8 * 8, 0, H - PH).astype(np.int32)
    u0 = np.clip((uu.min(axis=1) - 1) // 128 * 128, 0,
                 W - PW).astype(np.int32)
    # Rows whose footprint cannot fit are clamped like the sampler would —
    # their out-of-window lanes read wrong words BUT the same holds for the
    # production sampler path; the A/B compares fused vs sampler, and the
    # take path only on rows that fit.
    fits = ((np.clip(vv, 0, H - 1).max(axis=1) <= v0 + PH - 1)
            & (np.clip(uu, 0, W - 1).max(axis=1) <= u0 + PW - 1))
    print(f"rows fitting the {PH}x{PW} window: {fits.sum()}/{K}")

    idsj = jnp.asarray(ids)
    orgj = jnp.asarray(origins)
    Rj, tj = jnp.asarray(R), jnp.asarray(t)
    v0j, u0j = jnp.asarray(v0), jnp.asarray(u0)

    from hive_tpu.ops.pallas_sampler import build_patch_sampler
    sampler = build_patch_sampler(H, W, K, G, interpret=interpret)

    # ------------------------------------------------------------- Q1 + Q2
    results = {}
    for name, pik in (("full-fused", True), ("half-fused", False)):
        try:
            fused = make_fused(project_in_kernel=pik, interpret=interpret)
            out = jax.jit(lambda *a, _f=fused, _p=pik: fused_trip(
                _f, _p, (a[0], a[1], a[2]), *a[3:], win_v0=v0j, win_u0=u0j))(
                st, sw, sc, idsj, orgj, Rj, tj, img, jnp.float32(1.0))
            jax.block_until_ready(out)
            results[name] = out
            print(f"Q1 {name}: lowered + ran")
        except Exception as exc:
            print(f"Q1 {name} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:500]}")

    if not results:
        return

    ref = jax.jit(lambda *a: xla_trip(
        (a[0], a[1], a[2]), *a[3:], sampler=sampler,
        win_v0=v0j, win_u0=u0j))(
        st, sw, sc, idsj, orgj, Rj, tj, img, jnp.float32(1.0))
    jax.block_until_ready(ref)

    for name, out in results.items():
        ok = all(np.array_equal(np.asarray(a)[:NBS], np.asarray(b)[:NBS])
                 for a, b in zip(out, ref))
        if ok:
            print(f"Q2 {name}: final state BIT-IDENTICAL to the "
                  f"production (sampler) path")
        else:
            for label, a, b in zip(("tsdf", "weight", "color"), out, ref):
                a, b = np.asarray(a)[:NBS], np.asarray(b)[:NBS]
                bad = a != b
                if bad.any():
                    print(f"Q2 {name} {label}: {bad.mean():.2%} mismatched, "
                          f"max |d| {np.abs(a - b).max():.3e}")

    if interpret:
        print("(interpret mode — skipping timing)")
        return

    # ---------------------------------------------------------------- Q3
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

    variants = []
    if "full-fused" in results:
        fused_full = make_fused(project_in_kernel=True)
        variants.append(("fused ", scan_of(
            lambda state, trip_ids, rr: fused_trip(
                fused_full, True, state, trip_ids, orgj, Rj, tj, img + rr,
                jnp.float32(1.0), v0j, u0j))))
    variants.append(("prod  ", scan_of(
        lambda state, trip_ids, rr: xla_trip(
            state, trip_ids, orgj, Rj, tj, img + rr, jnp.float32(1.0),
            sampler=sampler, win_v0=v0j, win_u0=u0j))))
    variants.append(("take  ", scan_of(
        lambda state, trip_ids, rr: xla_trip(
            state, trip_ids, orgj, Rj, tj, img + rr, jnp.float32(1.0)))))

    n_vox = K * BV * TRIPS * REPS

    def timed_donated(fn, n=5):
        # Donated buffers are consumed per call — rebuild fresh device
        # copies OUTSIDE the timed region each rep (identical cost across
        # the variants, so the A/B is unaffected).
        def once():
            state = (jnp.array(st), jnp.array(sw), jnp.array(sc))
            jax.block_until_ready(state)
            t0 = time.perf_counter()
            float(fn(state))
            return time.perf_counter() - t0

        once()  # compile
        return sorted(once() for _ in range(n))[n // 2]

    for name, fn in variants:
        tm = timed_donated(fn)
        print(f"Q3 {name}: {tm * 1e3:8.2f} ms -> "
              f"{tm / n_vox * 1e9:6.2f} ns/voxel")


if __name__ == "__main__":
    main()
