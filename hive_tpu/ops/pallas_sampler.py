"""Block-windowed image sampling as a Pallas TPU kernel.

The sparse TSDF integrator's dominant cost is the band pixel gather: one
packed u32 per band voxel, fetched with XLA's element gather, which
serializes at ~(11 ns + 2 ns/byte) per element on this part (CLAUDE.md
measured facts; ~4.9 of ~13.4 ms/frame at bench shapes). Mosaic cannot lower
arbitrary gathers — but it CAN do 2D in-register gathers, and explicit DMAs
CAN move arbitrary tile-aligned windows. Band voxels arrive in whole blocks
whose image footprint is small, so per block:

* an async DMA copies a ``(PH, PW)`` window of the packed frame from HBM
  into VMEM scratch (double-buffered: block b+1's window loads while block
  b computes). Window origins must be tile-aligned: rows to 8, lanes to 128
  (Mosaic requires provable divisibility of memref slice indices);
* sampling runs on (8, 128) vreg tiles: ONE lane gather
  (``take_along_axis`` axis=1 — every patch row column-gathered at the
  voxel's u) then ONE sublane gather (axis=0, FULL-shape indices — a
  (1, 128) index array hits a Mosaic lowering assert) per tile, plus masked
  combines. 128 voxels cost ``2 * (PH/8) * (PW/128)`` vector gathers
  instead of 128 serialized element loads.

Measured on the v5e slice (tpu sessions 2026-08-19, NB=1024 blocks x 512
samples x 8 reps): 6.7 ns/sample double-buffered vs 13.8-14.6 ns/sample for
the XLA element gather — ~2x. Values bit-exact vs ``img[v, u]``.

Constraints (the integrator gates on them and falls back to the XLA take):
``height % 8 == 0``, ``width % 128 == 0``, ``height >= PH``,
``width >= PW``, block voxel count a multiple of 128, and per-block
footprints that fit the window after alignment (checked per frame in the
refine pass; oversized blocks take the classic path).

No reference counterpart: the reference's CUDA kernel
(third_party tsdf-fusion-python) relies on hardware scatter/gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Large window: covers the bench workload's worst block footprint (53 x 58 px
# at 15.6 mm voxels) after 8/128 alignment. VMEM cost: 2 x PH x PW x 4 B =
# 128 KB double-buffered.
PH = 64
PW = 256

# Small window (A/B knob HIVE_TSDF_PALLAS + HIVE_PALLAS_WIN_S, default OFF):
# in principle most band blocks project far smaller than the worst case and
# sampling cost scales with the (PH/8) x (PW/128) tile count, so routing
# small-footprint blocks to e.g. a (48, 128) window (6 tiles vs 16) should
# win. MEASURED DEAD END on the v5e slice (2026-08-19, same-process N=64
# bench sweep, bit-identical checksums): single 64x256 window 7.15 ms/frame
# vs 7.44-7.66 for every small-window config tried ((32|40|48|56),128 and
# (32|48),256) — splitting the band into two trip streams costs more in
# extra while_loop trips, partially-filled chunks, and kernel dispatches
# than the smaller tiles save. The routing machinery stays (env-gated,
# bit-identity under test) for re-evaluation on hardware with cheaper
# dispatch.
PH_SMALL = 48
PW_SMALL = 128


@functools.lru_cache(maxsize=None)
def build_patch_sampler(height: int, width: int, num_blocks: int,
                        groups: int, ph: int = PH, pw: int = PW,
                        dynamic_tiles: bool = False,
                        dma_bound: bool = False,
                        interpret: bool = False):
    """Compile a per-block window sampler.

    :param height, width: packed-frame shape (rows % 8 == 0, cols % 128 == 0).
    :param num_blocks: blocks per call (the integrator's trip chunk).
    :param groups: 128-voxel groups per block (block_voxels // 128).
    :param ph, pw: window shape (rows % 8 == 0, cols % 128 == 0).
    :param dynamic_tiles: bound the per-block sampling loops by the block's
        ACTUAL footprint tile counts instead of the full window's. The
        static kernel pays ``(PH/8) * (PW/128)`` tile visits per 128-voxel
        group no matter how small the block projects; most band blocks
        touch a fraction of that (the failed two-class-window experiment
        showed routing between kernels loses to trip-stream splitting, but
        an IN-KERNEL dynamic bound keeps one stream). The returned fn then
        takes two extra per-block arrays ``n_rows``/``n_cols`` (8-row strip
        / 128-lane column counts covering every in-view coordinate; an
        overestimate is sound). Out-of-view lanes whose clamped coords fall
        beyond the counted tiles return word 0 — callers mask those lanes
        (depth 0 is invalid), so final states are unchanged.
    :param dma_bound: keep the STATIC sampling loops (the A/B winner over
        ``dynamic_tiles`` on the v5e slice) but bound the window DMA's ROW
        extent by the block's footprint: the copy moves the smallest row
        class from ``(8, 16, 32, ..., ph)`` covering ``n_rows * 8`` rows
        instead of the full ``ph`` (DMA shapes must be static, hence the
        ``pl.when`` ladder). Scratch strips beyond the copied rows hold
        STALE bytes from an earlier block; only out-of-view lanes can clamp
        into them (``n_rows`` covers every in-view coordinate), and callers
        mask those lanes, so final states are unchanged. Takes the same two
        extra arrays as ``dynamic_tiles`` (``n_cols`` is accepted and
        ignored). Mutually exclusive with ``dynamic_tiles``.
    :param interpret: run in the Pallas interpreter (CPU tests).
    :return: fn(win_v0 (K,) i32, win_u0 (K,) i32, [n_rows (K,) i32,
        n_cols (K,) i32,] packed (H, W) u32,
        v (K, G, 128) i32, u (K, G, 128) i32) -> (K, G, 128) u32 with
        out[k, g, l] = packed[v[k, g, l], u[k, g, l]] for coords inside the
        block's window (coords outside are clamped into it — callers mask
        those voxels anyway).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PH, PW = ph, pw  # noqa: N806 — shadow the defaults with this build's shape
    if PH % 8 or PW % 128:
        raise ValueError(f"window {PH}x{PW} not tile-aligned (8, 128)")
    if height % 8 or width % 128 or height < PH or width < PW:
        raise ValueError(f"frame {height}x{width} unsupported by the "
                         f"{PH}x{PW} window sampler")
    if dynamic_tiles and dma_bound:
        raise ValueError("dynamic_tiles and dma_bound are mutually exclusive")
    # Row classes for the bounded DMA: doubling ladder capped at PH.
    row_classes = tuple(r for r in (8, 16, 32, 64, 128) if r < PH) + (PH,)

    def tile_sample(tile, pv, pu, s, h, acc):
        """One (8, 128) tile's masked gather-combine — THE tile sampling
        sequence (full-shape indices, axis-1 then axis-0 gather, masked
        select; see module docstring for the Mosaic constraints). Shared by
        the static and dynamic-tiles paths so the HIVE_PALLAS_DYN
        bit-identity contract has a single definition."""
        rv = pv - 8 * s
        row_ok = (rv >= 0) & (rv < 8)
        rv_c = jnp.broadcast_to(jnp.clip(rv, 0, 7)[None, :], (8, 128))
        cu = pu - 128 * h
        col_ok = (cu >= 0) & (cu < 128)
        cu_c = jnp.broadcast_to(jnp.clip(cu, 0, 127)[None, :], (8, 128))
        colg = jnp.take_along_axis(tile, cu_c, axis=1)
        val = jnp.take_along_axis(colg, rv_c, axis=0)[0]
        return jnp.where(row_ok & col_ok, val, acc)

    def sample_from_patch(patch, pv, pu):
        acc = jnp.zeros((128,), jnp.uint32)
        for s in range(PH // 8):
            for h in range(PW // 128):
                tile = patch[8 * s:8 * s + 8, 128 * h:128 * h + 128]
                acc = tile_sample(tile, pv, pu, s, h, acc)
        return acc

    def kernel(v0_ref, u0_ref, *rest):
        if dynamic_tiles or dma_bound:
            nr_ref, nc_ref, img_hbm, vv_ref, uu_ref, out_ref, scratch, sem = rest
        else:
            nr_ref = nc_ref = None
            img_hbm, vv_ref, uu_ref, out_ref, scratch, sem = rest
        b = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(b, 2)
        nxt = jax.lax.rem(b + 1, 2)

        def window_copy(i, slot_idx):
            """The async copy descriptor(s) for block ``i``'s window into
            ``slot_idx`` — start and wait sides must agree byte-for-byte, so
            both call this. With ``dma_bound`` the row extent is the
            smallest static class covering the block's footprint (a
            ``pl.when`` ladder: DMA shapes must be static)."""
            v0 = pl.multiple_of(v0_ref[i], 8)
            u0 = pl.multiple_of(u0_ref[i], 128)
            if not dma_bound:
                return [(None,
                         pltpu.make_async_copy(
                             img_hbm.at[pl.ds(v0, PH), pl.ds(u0, PW)],
                             scratch.at[slot_idx], sem.at[slot_idx]))]
            # Clamp so exactly ONE ladder class always matches: an n_rows
            # overestimate past PH//8 (the documented 'overestimates are
            # sound' contract) would otherwise match NO class — neither
            # start nor wait fires and the block samples the previous
            # block's stale window bytes, silently (review finding, r5).
            rows = jnp.minimum(nr_ref[i] * 8, PH)
            out = []
            for ci, cr in enumerate(row_classes):
                cond = rows <= cr
                if ci:
                    cond &= rows > row_classes[ci - 1]
                out.append((cond, pltpu.make_async_copy(
                    img_hbm.at[pl.ds(v0, cr), pl.ds(u0, PW)],
                    scratch.at[slot_idx, pl.ds(0, cr)], sem.at[slot_idx])))
            return out

        def run_laddered(copies, op):
            for cond, copy in copies:
                if cond is None:
                    op(copy)
                else:
                    pl.when(cond)(lambda copy=copy: op(copy))

        @pl.when(b == 0)
        def _prime():
            run_laddered(window_copy(0, 0), lambda c: c.start())

        @pl.when(b + 1 < n)
        def _prefetch():
            # The clamp cannot bind under the guard; it stays as insurance
            # against the scalar index read executing if pl.when ever
            # lowers to predication instead of a branch.
            i = jnp.minimum(b + 1, n - 1)
            run_laddered(window_copy(i, nxt), lambda c: c.start())

        v0b = pl.multiple_of(v0_ref[b], 8)
        u0b = pl.multiple_of(u0_ref[b], 128)
        run_laddered(window_copy(b, slot), lambda c: c.wait())

        if not dynamic_tiles:
            patch = scratch[slot]
            for g in range(groups):
                pv = jnp.clip(vv_ref[0, g, :] - v0b, 0, PH - 1)
                pu = jnp.clip(uu_ref[0, g, :] - u0b, 0, PW - 1)
                out_ref[0, g, :] = sample_from_patch(patch, pv, pu)
            return

        # Dynamic variant: visit only the n_rows x n_cols tiles the block's
        # footprint covers. All groups share each tile visit (one ref-level
        # tile load per (strip, column), 2 * groups vector gathers on it).
        pv = [jnp.clip(vv_ref[0, g, :] - v0b, 0, PH - 1)
              for g in range(groups)]
        pu = [jnp.clip(uu_ref[0, g, :] - u0b, 0, PW - 1)
              for g in range(groups)]

        def strip(s, accs):
            base_s = pl.multiple_of(s * 8, 8)

            def col(h, accs):
                base_h = pl.multiple_of(h * 128, 128)
                tile = scratch[slot, pl.ds(base_s, 8), pl.ds(base_h, 128)]
                return [tile_sample(tile, pv[g], pu[g], s, h, accs[g])
                        for g in range(groups)]

            return jax.lax.fori_loop(0, jnp.minimum(nc_ref[b], PW // 128),
                                     col, accs)

        accs = [jnp.zeros((128,), jnp.uint32) for _ in range(groups)]
        # Loop bounds clamp to the scratch extents: an n_rows/n_cols
        # overestimate (documented as sound) would otherwise drive the
        # ref-level pl.ds reads past the (2, PH, PW) window — out-of-bounds
        # VMEM whose garbage is never selected, making it invisible to
        # checksum tests (review finding, r5).
        accs = jax.lax.fori_loop(0, jnp.minimum(nr_ref[b], PH // 8),
                                 strip, accs)
        for g in range(groups):
            out_ref[0, g, :] = accs[g]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4 if (dynamic_tiles or dma_bound) else 2,
            grid=(num_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),     # frame stays in HBM
                pl.BlockSpec((1, groups, 128), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, groups, 128), lambda b, *_: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, groups, 128),
                                   lambda b, *_: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((2, PH, PW), jnp.uint32),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((num_blocks, groups, 128), jnp.uint32),
        interpret=interpret,
    )
