#!/usr/bin/env python
"""Microbench: per-voxel pixel sampling strategies for the band update.

Production shape: per while_loop trip, K blocks x BV voxels sample
(depth, packed colour) at computed pixel coordinates from a VGA image.

Strategies:
  A. two plain per-element gathers (current production)
  B. patch extraction (vmap dynamic_slice, one patch per block) + fused
     compare-select-reduce sampling inside the patch (no serialized gather)
  C. patch extraction alone (to isolate its cost)

Anti-LICM/DCE: every repetition rides a lax.scan whose per-trip pixel
coordinates derive from the loop index, and the timed value is a checksum
over ALL outputs. Values are also cross-checked A vs B.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 480, 640
K_BLOCKS = 512          # blocks per trip
BV = 256                # voxels per block
TRIPS = 16              # scan length (simulates trips across frames)


def timed(fn, n=3):
    fn()
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def main():
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(1.0, 4.0, (H, W)).astype(np.float32))
    packed = jnp.asarray(rng.integers(0, 2**24, (H, W), dtype=np.int64)
                         .astype(np.uint32))

    # Per-block patch anchor (top-left), per-voxel offsets within patch.
    base_v = jnp.asarray(rng.integers(0, H - 64, (TRIPS, K_BLOCKS)), jnp.int32)
    base_u = jnp.asarray(rng.integers(0, W - 64, (TRIPS, K_BLOCKS)), jnp.int32)

    for P in (16, 32, 48, 64):
        off_v = jnp.asarray(rng.integers(0, P, (TRIPS, K_BLOCKS, BV)), jnp.int32)
        off_u = jnp.asarray(rng.integers(0, P, (TRIPS, K_BLOCKS, BV)), jnp.int32)
        vv = base_v[:, :, None] + off_v      # absolute pixel coords
        uu = base_u[:, :, None] + off_u

        # --- A: two plain gathers -----------------------------------------
        @jax.jit
        def strat_a(depth, packed, vv, uu):
            def body(acc, frame):
                v, u = frame
                flat = v * W + u
                d = jnp.take(depth.reshape(-1), flat)
                c = jnp.take(packed.reshape(-1), flat)
                return (acc + jnp.sum(d) + jnp.sum(c.astype(jnp.float32)),
                        None)
            acc, _ = jax.lax.scan(body, jnp.float32(0), (vv, uu))
            return acc

        # --- B: patches + fused compare-reduce ----------------------------
        @jax.jit
        def strat_b(depth, packed, bv_, bu_, ov, ou):
            pix_iota_v = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
            pix_iota_u = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)

            def slice_patch(img):
                def one(v0, u0):
                    return jax.lax.dynamic_slice(img, (v0, u0), (P, P))
                return jax.vmap(one)

            def body(acc, frame):
                v0, u0, ovf, ouf = frame
                dpatch = slice_patch(depth)(v0, u0)            # (K, P, P)
                cpatch = slice_patch(packed)(v0, u0)           # (K, P, P)

                # (K, BV, P, P) virtual mask, fused into the reduce.
                mv = ovf[:, :, None, None] == pix_iota_v[None, None]
                mu = ouf[:, :, None, None] == pix_iota_u[None, None]
                m = mv & mu
                d = jnp.sum(jnp.where(m, dpatch[:, None], 0.0), axis=(2, 3))
                c = jnp.sum(jnp.where(m, cpatch[:, None], jnp.uint32(0)),
                            axis=(2, 3))
                return (acc + jnp.sum(d) + jnp.sum(c.astype(jnp.float32)),
                        None)

            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  (bv_, bu_, ov, ou))
            return acc

        # --- C: patch extraction only --------------------------------------
        @jax.jit
        def strat_c(depth, packed, bv_, bu_):
            def slice_patch(img):
                def one(v0, u0):
                    return jax.lax.dynamic_slice(img, (v0, u0), (P, P))
                return jax.vmap(one)

            def body(acc, frame):
                v0, u0 = frame
                dpatch = slice_patch(depth)(v0, u0)
                cpatch = slice_patch(packed)(v0, u0)
                return (acc + jnp.sum(dpatch)
                        + jnp.sum(cpatch.astype(jnp.float32)), None)

            acc, _ = jax.lax.scan(body, jnp.float32(0), (bv_, bu_))
            return acc

        # --- A2: ONE u32 gather (the packed RGB565+D16 candidate) ----------
        @jax.jit
        def strat_a2(packed, vv, uu):
            def body(acc, frame):
                v, u = frame
                flat = v * W + u
                c = jnp.take(packed.reshape(-1), flat)
                return acc + jnp.sum(c.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), (vv, uu))
            return acc

        # --- A3: ONE complex64 gather (both words in one take) -------------
        cpx = jax.lax.complex(depth, packed.view(jnp.float32))

        @jax.jit
        def strat_a3(cpx, vv, uu):
            def body(acc, frame):
                v, u = frame
                flat = v * W + u
                g = jnp.take(cpx.reshape(-1), flat)
                d = jnp.real(g)
                c = jnp.imag(g).view(jnp.uint32)
                return (acc + jnp.sum(d) + jnp.sum(c.astype(jnp.float32)),
                        None)
            acc, _ = jax.lax.scan(body, jnp.float32(0), (vv, uu))
            return acc

        a = float(strat_a(depth, packed, vv, uu))
        b = float(strat_b(depth, packed, base_v, base_u, off_v, off_u))
        a3 = float(strat_a3(cpx, vv, uu))
        ok = abs(a - b) <= 1e-6 * max(abs(a), 1.0)
        ok3 = abs(a - a3) <= 1e-6 * max(abs(a), 1.0)
        print(f"P={P}: values A={a:.6g} B={b:.6g} match={ok} cpx_match={ok3}")
        n_el = TRIPS * K_BLOCKS * BV
        ta2 = timed(lambda: strat_a2(packed, vv, uu))
        ta3 = timed(lambda: strat_a3(cpx, vv, uu))
        print(f"P={P}: A2(one u32)={ta2 * 1e3:7.2f} ms "
              f"({ta2 / n_el * 1e9:5.1f} ns/voxel) | "
              f"A3(one cpx64)={ta3 * 1e3:7.2f} ms "
              f"({ta3 / n_el * 1e9:5.1f} ns/voxel)")

        n_el = TRIPS * K_BLOCKS * BV
        ta = timed(lambda: strat_a(depth, packed, vv, uu))
        tb = timed(lambda: strat_b(depth, packed, base_v, base_u,
                                   off_v, off_u))
        tc = timed(lambda: strat_c(depth, packed, base_v, base_u))
        print(f"P={P}: A(gather x2)={ta * 1e3:7.2f} ms "
              f"({ta / n_el * 1e9:5.1f} ns/voxel) | "
              f"B(patch+reduce)={tb * 1e3:7.2f} ms "
              f"({tb / n_el * 1e9:5.1f} ns/voxel) | "
              f"C(patch only)={tc * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
