#!/usr/bin/env python
"""Measure device-side mask-compaction strategies at integrator shapes.

The sparse integrator compacts block-id lists from boolean masks up to FIVE
times per frame (classify candidates, refine band ids, band-fit trips,
band-unfit trips, edge trips — tsdf_sparse.py), each via
``jnp.nonzero(mask, size=K, fill_value=n)``, which lowers to cumsum +
scatter; scatters serialize on this part (CLAUDE.md: the extraction-era
full-capacity nonzero measured 158 ns/element).

Candidates, all returning the EXACT nonzero contract (ascending ids, tail
filled with n):

* ``nonzero``   — the current jnp.nonzero(size=K).
* ``sort``      — jnp.sort(where(mask, iota, n)) (bitonic, no scatter).
* ``sort3``     — ONE sort with a 3-way key (band-fit < band-unfit < edge)
                  replacing the three full-size trip compactions; segment
                  starts come from two mask sums.
* ``cumsum``    — cumsum of the mask alone (lower bound of nonzero's
                  non-scatter half).

Timings ride a lax.scan over VARYING masks (LICM/DCE rules, CLAUDE.md) and
return id-sum checksums.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_BLOCKS = 36864          # bench-scale slab-row count (nb * SUB)
N_FRAMES = 64
BAND_FRAC = 0.055         # ~2K band rows / 37K, as on the bench scene
EDGE_FRAC = 0.02
FIT_FRAC = 0.8            # fraction of band rows that fit a Pallas window


def make_masks(key):
    """(frames, N) varying masks: band, fit-within-band, edge."""
    ks = jax.random.split(key, 3)
    r = jax.random.uniform(ks[0], (N_FRAMES, N_BLOCKS))
    band = r < BAND_FRAC
    fit = band & (jax.random.uniform(ks[1], (N_FRAMES, N_BLOCKS)) < FIT_FRAC)
    edge = (~band) & (jax.random.uniform(ks[2], (N_FRAMES, N_BLOCKS))
                      < EDGE_FRAC)
    return band, fit, edge


def timed(fn, n=5):
    fn()
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[len(samples) // 2]


def main():
    print("backend:", jax.default_backend())
    band, fit, edge = make_masks(jax.random.PRNGKey(0))
    jax.block_until_ready(band)
    n = N_BLOCKS
    iota = jnp.arange(n, dtype=jnp.int32)

    def scan_over(fn):
        @jax.jit
        def run(band, fit, edge):
            def body(acc, frame):
                return acc + fn(*frame), None
            acc, _ = jax.lax.scan(body, jnp.int64(0) if False else
                                  jnp.float32(0), (band, fit, edge))
            return acc
        return lambda: run(band, fit, edge)

    def checksum(ids):
        return jnp.sum(ids.astype(jnp.float32) * 1e-3)

    # --- current: three full-size nonzeros (band-fit, band-unfit, edge) ---
    def three_nonzero(b, f, e):
        a = jnp.nonzero(b & f, size=n, fill_value=n)[0]
        c = jnp.nonzero(b & ~f, size=n, fill_value=n)[0]
        d = jnp.nonzero(e, size=n, fill_value=n)[0]
        return checksum(a) + checksum(c) + checksum(d)

    # --- three full-size sorts -------------------------------------------
    def three_sort(b, f, e):
        a = jnp.sort(jnp.where(b & f, iota, n))
        c = jnp.sort(jnp.where(b & ~f, iota, n))
        d = jnp.sort(jnp.where(e, iota, n))
        return checksum(a) + checksum(c) + checksum(d)

    # --- ONE 3-way-key sort ----------------------------------------------
    def one_sort3(b, f, e):
        key = jnp.where(b & f, iota,
                        jnp.where(b & ~f, iota + n,
                                  jnp.where(e, iota + 2 * n, iota + 3 * n)))
        order = jnp.sort(key)
        # Segment boundaries from two sums (ids recover via & (n-1) when n
        # is a power of two; here n may not be, use subtraction instead).
        return checksum(order % n) + jnp.sum(b & f) + jnp.sum(e) * 0.5

    # --- single nonzero / single sort (per-call cost) ----------------------
    def one_nonzero(b, f, e):
        return checksum(jnp.nonzero(b, size=n, fill_value=n)[0])

    def one_nonzero_small(b, f, e):
        return checksum(jnp.nonzero(b, size=4608, fill_value=n)[0])

    def one_sort(b, f, e):
        return checksum(jnp.sort(jnp.where(b, iota, n)))

    def one_cumsum(b, f, e):
        return checksum(jnp.cumsum(b.astype(jnp.int32)))

    cases = [
        ("3x nonzero(size=n)  [current trips]", three_nonzero),
        ("3x sort             [drop-in]", three_sort),
        ("1x 3-key sort       [merged trips]", one_sort3),
        ("1x nonzero(size=n)", one_nonzero),
        ("1x nonzero(size=n/8) [refine-style]", one_nonzero_small),
        ("1x sort", one_sort),
        ("1x cumsum            [floor]", one_cumsum),
    ]
    for name, fn in cases:
        t = timed(scan_over(fn))
        print(f"{name:40s} {t * 1e3:8.2f} ms total  "
              f"{t / N_FRAMES * 1e3:6.3f} ms/frame")

    # Contract check: sort == nonzero output, on host.
    b0 = np.asarray(band[0])
    a = np.asarray(jnp.nonzero(jnp.asarray(b0), size=n, fill_value=n)[0])
    c = np.asarray(jnp.sort(jnp.where(jnp.asarray(b0), iota, n)))
    print("sort == nonzero:", bool((a == c).all()))


def sweep_widths():
    """Crossover sweep: sort vs nonzero per mask width (the extraction A/B
    found nonzero wins at ~400K-wide emission masks while sort wins 2.7x at
    37K integrator rows — find the boundary for the width-gated default)."""
    for n in (36864, 131072, 262144, 524288, 1048576):
        key = jax.random.PRNGKey(n)
        band = jax.random.uniform(key, (16, n)) < BAND_FRAC
        jax.block_until_ready(band)
        iota = jnp.arange(n, dtype=jnp.int32)

        def scan_over(fn):
            @jax.jit
            def run(band):
                def body(acc, mask):
                    return acc + fn(mask), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), band)
                return acc
            return lambda: run(band)

        def cs(ids):
            return jnp.sum(ids.astype(jnp.float32) * 1e-3)

        t_nz = timed(scan_over(
            lambda m: cs(jnp.nonzero(m, size=n, fill_value=n)[0])))
        t_st = timed(scan_over(
            lambda m: cs(jnp.sort(jnp.where(m, iota, n)))))
        print(f"n={n:8d}: nonzero {t_nz / 16 * 1e3:7.3f} ms/frame   "
              f"sort {t_st / 16 * 1e3:7.3f} ms/frame   "
              f"{'sort' if t_st < t_nz else 'nonzero'} wins", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "widths":
        sweep_widths()
    else:
        main()
