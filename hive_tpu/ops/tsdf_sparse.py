"""Sparse (banded) TSDF fusion: per-block classification + compacted updates.

Measured on v5e, XLA lowers the per-voxel depth gather at ~15 ns/element and
Mosaic's hardware gather is restricted to a single 128-lane register — so the
dense integrate (hive_tpu.ops.tsdf) is gather-issue-bound at ~0.07 G
voxel-updates/s regardless of precision. The TPU-native answer is to not
gather for most voxels:

For every frame, each fixed-size voxel block is classified with conservative
bounds (block corners projected into the camera + a min/max/validity mip
pyramid of the depth image), then the surviving band blocks are RE-queried
with 5x5 cells two pyramid levels finer (the first pass reads bounds from a
region up to ~3-5x the footprint, which over-widens the depth window ~2.5x
on sloped surfaces — the refinement pass compacts the band ids and pays 25
cheap gathers per band block to avoid ~2x that many banded voxel gathers):

* **skip** — outside the view, footprint has no valid depth, or entirely
  behind the surface band (``z_min > d_max + trunc``): no update at all;
* **free space** — entirely in front of every surface in its footprint
  (``z_max < d_min - trunc``) with a fully-valid, fully-in-image footprint:
  the update is uniform (dist = 1, weight += 1) — **no gather**, applied as a
  masked elementwise pass over the whole volume (bandwidth-bound, fast);
* **free edge** — provably free (``z_max < d_min - trunc`` over the
  *clamped* footprint, all depth valid there) but only PARTIALLY inside the
  image: the frustum-border shell through open space. These blocks used to
  fall through to the band path purely because the uniform free pass cannot
  mask per-voxel visibility; they now take a dedicated gather-free chunked
  pass (projection arithmetic decides ``in_view``; dist = 1) — measured
  ~25-40% of band blocks on real camera trajectories, i.e. a large slice of
  the dominant per-voxel gather bill removed;
* **band** — everything else: the exact gather path, compacted to a
  fixed-capacity block list so only the thin truncation shell pays the
  serialized gather cost. Blocks that straddle or sit behind the camera
  plane (where projected AABBs are meaningless) are culled by an exact
  hull-vs-frustum-plane test instead of defaulting to the band path.

TPU-specific implementation notes:

* the depth pyramid builds with strided-slice 2x2 pooling on a power-of-two
  padded canvas (``lax.reduce_window`` measured ~5 s/frame on this backend,
  and reshape-reduce forms tile-pad their 2-wide minor dims 64x);
* pyramid levels are flattened into ONE packed-uint32 buffer and each
  classification query is four (nb,)-shaped gathers (one per cell: min in
  the real part, max in the imag part with the all-valid flag in its sign),
  not per-level loops;
* the band path fetches per-voxel frame values with a SINGLE u32 gather
  (u16-mm depth + dithered RGB565, ``color_mode="rgb565d16"``) — gather
  cost here is ~(11 ns + 2 ns/byte)/element, so one 4-byte take beats the
  exact two-take mode (``"rgb888"``) by ~30% on the dominant cost;
* the volume is stored block-major with a FLAT per-block voxel axis
  ``(nb, Bx*By*Bz)`` and colour as per-block channel segments
  ``(nb, 3*Bx*By*Bz)``.
  This is load-bearing on TPU: the physical layout tiles the two minor dims
  to (8, 128), so a blocked ``(nb, 8, 8, 4)`` array pads its minor dim
  4 → 128 (a measured 16-32x HBM expansion — a 41M-voxel volume OOM'd a
  16 GB part under the 16x variant) while flat ``(nb, 256)`` is exactly
  tile-aligned: zero padding, and every full-state elementwise pass moves
  an order of magnitude less memory. Likewise
  ``(..., 3)`` colour would pad 3 → 128 (42x); channel planes don't.
  Band blocks update via whole-block gather/scatter (contiguous rows),
  processed in fixed-width chunks inside a ``lax.while_loop`` — one trip in
  the common case, more trips when a frame's band exceeds the chunk width.
  There is no dense fallback and no giant-N gather shape in the program;
  correctness never depends on the classification heuristics.

Colour in free-space blocks is not updated (no surface can live strictly
inside free space; band frames write colour wherever surfaces appear).
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class SparseTSDFState(NamedTuple):
    tsdf: jnp.ndarray    # (nb, BV) where BV = Bx * By * Bz (tile-aligned)
    weight: jnp.ndarray  # (nb, BV)
    color: jnp.ndarray   # (nb, 3*BV): per-block R|G|B channel segments —
                         # row-major so band blocks gather/scatter on the
                         # leading axis (axis-1 scatter lowers poorly)


# Pass-1 classification compaction capacities, as fractions of the block
# count (see ``classify`` in ``_build_integrator``): per frame batch the
# host-side frustum estimate picks the smallest level that fits the batch's
# candidate fraction plus a sampling margin (each level is a separately
# compiled program; trajectories are stable, so a run compiles 1-2 levels).
# ~34% of blocks are candidates on inside-looking trajectories; outside-in
# cameras can reach ~100%, where compaction buys nothing and is skipped.
COMPACT_LEVELS = (0.375, 0.5, 0.625, 0.75)
COMPACT_MARGIN = 0.02  # ~4096-sample estimate: stat error ~0.7%, stride bias ~1%


def pick_compact_cap(candidate_fraction: float):
    """Smallest compaction level covering ``candidate_fraction`` + margin,
    or None (query every block) when no level fits."""
    for level in COMPACT_LEVELS:
        if candidate_fraction + COMPACT_MARGIN <= level:
            return level
    return None


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def build_flat_pyramid(depth, height: int, width: int,
                       packed_u16: bool = False):
    """Min/max/valid mip pyramid, flattened level-major into ONE buffer.

    ``packed_u16`` selects the validity semantics of the rgb565d16 sampling
    mode (u16-mm range test matching ``pack_frame``); False keeps the
    rgb888/raw-f32 semantics (``depth > 0``). See the inline comment.

    The image pads to a power-of-two canvas (min: +inf, max: -inf,
    valid: False — all conservative), and every level halves both axes via
    strided-slice 2x2 pooling (``lax.reduce_window`` measured ~5 s/frame on
    this backend, and reshape-reduce forms tile-pad their 2-wide minor dims).

    The three per-cell quantities pack into ONE uint32 word so every
    classification query is a SINGLE 4-byte gather (gather cost on this
    part is ~11 ns + 2 ns/BYTE per element, so one u32 beats the previous
    one-complex64 pack by ~30% and two separate buffers by ~2x):

    * bits 0..15 — cell depth min, FLOORED to u16 millimetres (rounding
      down only loosens the free test: conservative). 65535 when the cell
      has no valid pixel (harmless in the min-reduction).
    * bits 16..30 — cell depth max, CEILED to 2 mm units (rounding up only
      loosens the behind/skip test). 0 = no valid pixel (decodes -inf);
      0x7FFF = at/above the 65.534 m range cap (decodes +inf so far
      surfaces can never cause a wrong skip).
    * bit 31 — all-pixels-valid flag.

    :return: uint32 flat buffer; level layout per :func:`pyramid_layout`.
    """
    hp, wp = _next_pow2(height), _next_pow2(width)
    num_levels = int(math.log2(max(hp, wp))) + 1

    # Validity must mirror what the SAMPLING paths will treat as valid, or
    # the classification's "conservative" bounds stop bounding (review
    # finding, round 5):
    # * packed (rgb565d16) mode samples u16-mm depth: valid iff
    #   1 <= round(depth*1000) <= 65535, exactly pack_frame's range test
    #   (a finite 100 m depth is INVALID to the sampler — treating it as
    #   valid here licensed FREE updates the band path would reject).
    # * rgb888 mode samples raw f32: valid iff depth > 0 (a +inf depth is
    #   valid far space — dist saturates to 1, same as the dense path).
    # NaN fails every comparison -> invalid in both modes.
    if packed_u16:
        d_mm = jnp.round(depth * 1000.0)
        valid = (d_mm >= 1.0) & (d_mm <= 65535.0)
    else:
        valid = depth > 0.0

    # The dmax channel caps at a finite value past the u16 encode range: a
    # +inf (or huge) valid pixel must saturate the cell's max into the
    # 0x7FFF far-cap sentinel (decodes +inf, skip test never fires) — NOT
    # poison max_flat to +inf, which the no-valid test (~isfinite) would
    # misread as "cell has no valid pixel" and wrongly SKIP blocks in
    # front of a real surface sharing the cell.
    depth_capped = jnp.minimum(depth, 70.0)

    # All three per-cell reductions phrase as MAX — min via negation, the
    # "any invalid pixel" flag via max over a 0/1 channel — so each level
    # pools the channel-stacked (3, h, w) array with ONE op per axis instead
    # of six separate min/max/and pools (measured on-device: bit-identical,
    # same ~2.2 ms/frame — the cost is the strided-slice relayouts, not op
    # count; channel-major stacking keeps the tiled minor dims (h, w)).
    stacked = jnp.stack([
        jnp.where(valid, -depth, -jnp.inf),          # -dmin
        jnp.where(valid, depth_capped, -jnp.inf),    # dmax
        jnp.where(valid, 0.0, 1.0),                  # any-invalid flag
    ])
    stacked = jnp.pad(
        stacked, ((0, 0), (0, hp - height), (0, wp - width)),
        constant_values=((0, 0), (0, -jnp.inf), (0, -jnp.inf)))
    # Padding cells must read as INVALID (flag 1) but not poison min/max.
    pad_flag = jnp.zeros((hp, wp), stacked.dtype).at[height:, :].set(1.0)
    pad_flag = pad_flag.at[:, width:].set(1.0)
    stacked = stacked.at[2].max(pad_flag)

    levels = [stacked]
    h, w = hp, wp
    for _ in range(num_levels - 1):
        # 2x2 pooling via strided slices (``lax.reduce_window`` measured ~5 s
        # per frame on this backend; the reshape form (h2, 2, w2, 2) ->
        # reduce puts a 2-wide minor dim on every intermediate, which
        # tile-pads 2 -> 128 = 64x HBM).
        if stacked.shape[1] > 1:
            stacked = jnp.maximum(stacked[:, 0::2], stacked[:, 1::2])
        if stacked.shape[2] > 1:
            stacked = jnp.maximum(stacked[:, :, 0::2], stacked[:, :, 1::2])
        levels.append(stacked)
        h, w = max(h // 2, 1), max(w // 2, 1)

    min_flat = -jnp.concatenate([lv[0].reshape(-1) for lv in levels])
    max_flat = jnp.concatenate([lv[1].reshape(-1) for lv in levels])
    all_valid = jnp.concatenate([lv[2].reshape(-1) for lv in levels]) == 0.0
    no_valid = ~jnp.isfinite(max_flat)  # max == -inf: no valid pixel at all

    dmin_mm = jnp.clip(jnp.floor(min_flat * 1000.0), 0.0, 65535.0)
    dmin_mm = jnp.where(no_valid, 65535.0, dmin_mm).astype(jnp.uint32)

    dmax_units = jnp.clip(jnp.ceil(max_flat * 500.0), 1.0, 32767.0)
    dmax_units = jnp.where(no_valid, 0.0, dmax_units).astype(jnp.uint32)

    valid_bit = jnp.where(all_valid & ~no_valid, jnp.uint32(1), jnp.uint32(0))

    return dmin_mm | (dmax_units << 16) | (valid_bit << 31)


def compact_ids(mask, size: int, fill: int):
    """Ascending indices of ``mask``'s True entries, tail-filled with ``fill``
    — the exact ``jnp.nonzero(mask, size=size, fill_value=fill)[0]`` contract.

    Implemented as a SORT of masked indices instead of nonzero: nonzero
    lowers to cumsum + scatter, and scatters serialize on this part. Measured
    2026-08-20 (scripts/micro_compaction.py, 37K-row masks in a 64-frame
    scan, same-process): one full-width nonzero 0.85 ms/frame vs sort 0.43;
    the integrator's three full-width trip compactions 1.41 ms/frame as
    nonzero vs 0.52 as sorts. Requires ``fill >= mask.size`` (true for every
    integrator call site: fill is the row count) so real ids always sort
    ahead of the filler. Truncation at ``size`` keeps the smallest ids, same
    as nonzero. A/B knob: HIVE_TSDF_COMPACT=nonzero restores jnp.nonzero.
    """
    n = mask.shape[0]
    if os.environ.get("HIVE_TSDF_COMPACT", "sort") == "nonzero":
        return jnp.nonzero(mask, size=size, fill_value=fill)[0]
    ids = jnp.sort(jnp.where(mask, jnp.arange(n, dtype=jnp.int32),
                             jnp.int32(fill)))
    if size < n:
        return ids[:size]
    if size > n:  # nonzero pads past the mask width with fill
        return jnp.concatenate(
            [ids, jnp.full((size - n,), fill, dtype=ids.dtype)])
    return ids


def pyramid_layout(height: int, width: int):
    """Static (offsets, widths, heights) arrays per pyramid level."""
    hp, wp = _next_pow2(height), _next_pow2(width)
    num_levels = int(math.log2(max(hp, wp))) + 1

    offsets, widths, heights = [], [], []
    offset = 0
    h, w = hp, wp

    for _ in range(num_levels):
        offsets.append(offset)
        widths.append(w)
        heights.append(h)
        offset += h * w
        h, w = max(h // 2, 1), max(w // 2, 1)

    return (np.asarray(offsets, np.int32), np.asarray(widths, np.int32),
            np.asarray(heights, np.int32))


def pyramid_cell_bounds(layout, u0, u1, v0, v1, height: int, width: int,
                        level_bias: int):
    """Covering-level cell ranges for per-block pixel AABBs.

    THE single definition of the level pick and cell clamping — shared by
    the take path (:func:`query_flat_pyramid`) and the Pallas window kernel
    (:mod:`hive_tpu.ops.pallas_refine`), which must select identical cells
    for their results to stay bit-identical.

    The MAX edge widens by the sampling paths' +0.5 px nearest-pixel
    rounding before the level pick and cell clamp: the band/dense updates
    sample ``round(u)``, which lands one pixel PAST ``floor(u1)`` whenever
    ``frac(u1) >= 0.5`` — without the margin the covered cells do not bound
    what actually gets sampled, and a depth discontinuity in the uncovered
    pixel column makes a "conservative" SKIP/FREE classification silently
    wrong (review finding, round 5). The MIN edge needs no margin:
    ``round(u) >= floor(u0)`` for every ``u >= u0``, and cells cover from
    ``floor(u0)``. A/B knob HIVE_TSDF_ROUND_MARGIN: 1 (default, max edge),
    2 (both edges), 0 (round-4 behaviour, unsound at sub-half-pixel voxel
    footprints).
    """
    num_levels = len(layout[0])
    offsets, widths, heights = (jnp.asarray(a) for a in layout)

    margin = os.environ.get("HIVE_TSDF_ROUND_MARGIN", "1")
    if margin != "0":
        u1 = u1 + 0.5
        v1 = v1 + 0.5
        if margin == "2":
            u0 = u0 - 0.5
            v0 = v0 - 0.5

    extent = jnp.maximum(u1 - u0, v1 - v0)
    level = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(extent, 1.0))).astype(jnp.int32)
                     + level_bias, 0, num_levels - 1)

    off = offsets[level]
    w_l = widths[level]
    h_l = heights[level]
    shift = level  # cell size = 1 << level

    cu0 = jnp.minimum((jnp.clip(u0, 0, width - 1).astype(jnp.int32)) >> shift, w_l - 1)
    cu1 = jnp.minimum((jnp.clip(u1, 0, width - 1).astype(jnp.int32)) >> shift, w_l - 1)
    cv0 = jnp.minimum((jnp.clip(v0, 0, height - 1).astype(jnp.int32)) >> shift, h_l - 1)
    cv1 = jnp.minimum((jnp.clip(v1, 0, height - 1).astype(jnp.int32)) >> shift, h_l - 1)
    return off, w_l, cu0, cu1, cv0, cv1


def query_flat_pyramid(pyramid, layout, u0, u1, v0, v1, height: int, width: int,
                       grid: int = 2, level_bias: int = 0):
    """Conservative (dmin, dmax, all_valid) over per-block AABBs.

    With ``grid=2, level_bias=0`` (the first classification pass) the level
    whose cell covers the AABB extent is queried with 2x2 cells; the bounds
    then come from a region up to ~3x the footprint, which over-widens the
    depth window on sloped surfaces (measured ~2.5x band inflation on the
    benchmark scene). ``grid=5, level_bias=-2`` (the band refinement pass)
    queries 5x5 cells two levels finer — cell size in [extent/4, extent/2),
    so 5 cells always cover — and tightens the region to <= 1.5x the
    footprint. Costs grid^2 single-u32 gathers per queried block
    (validity rides the sign of the max channel, see
    :func:`build_flat_pyramid`).
    """
    # Soundness: at cell size >= extent / 2^(-bias), an AABB can touch up to
    # 2^(-bias) + 1 cells per axis (span plus one boundary crossing); fewer
    # taps leave cells UNREAD and the returned "bounds" stop bounding —
    # free/skip classification then silently corrupts the volume (observed:
    # a grid=3, bias=-2 experiment ran 9% faster with a drifting checksum).
    if grid < (1 << max(0, -level_bias)) + 1:
        raise ValueError(f"grid={grid} cannot cover an AABB at level bias "
                         f"{level_bias}; need >= "
                         f"{(1 << max(0, -level_bias)) + 1}")

    off, w_l, cu0, cu1, cv0, cv1 = pyramid_cell_bounds(
        layout, u0, u1, v0, v1, height, width, level_bias)

    # Per-cell (nb,) gathers reduced incrementally — a stacked (nb, grid^2)
    # gather output would tile-pad its minor dim to 128. Cells past the AABB
    # clamp onto the last covered cell (duplicate reads are conservative).
    # Each tap is ONE u32 gather (see build_flat_pyramid's packing); the
    # unpack is elementwise VPU work, negligible next to the gather.
    dmin = dmax = all_valid = None
    for i in range(grid):
        cv = jnp.minimum(cv0 + i, cv1)
        for j in range(grid):
            cu = jnp.minimum(cu0 + j, cu1)
            g = jnp.take(pyramid, off + cv * w_l + cu)
            cmin = (g & 0xFFFF).astype(jnp.float32) * 1e-3
            units = ((g >> 16) & 0x7FFF).astype(jnp.float32)
            cvalid = (g >> 31) == 1
            cmax = jnp.where(units == 0.0, -jnp.inf,
                             jnp.where(units >= 32767.0, jnp.inf,
                                       units * 2e-3))
            if dmin is None:
                dmin, dmax, all_valid = cmin, cmax, cvalid
            else:
                dmin = jnp.minimum(dmin, cmin)
                dmax = jnp.maximum(dmax, cmax)
                all_valid = all_valid & cvalid

    return dmin, dmax, all_valid


def prepare_integration_inputs(colors, depths, camera_matrix,
                               cam_to_world_poses, obs_weights=None):
    """THE frame-stack preprocessing for integration — shared by the
    single-device path and the shard_map wrapper
    (hive_tpu.parallel.fusion.integrate_frames_sharded), whose bit-identical
    contract depends on both sides preparing inputs identically.

    jnp.asarray only: device-resident inputs must NOT round-trip through
    the host (np.asarray on a jax.Array downloads ~80 MB per VGA scan — it
    dominated integration time behind a remote device tunnel).

    :return: (depths (N,H,W) f32, colors (N,H,W,3) f32, world_to_cams
        (N,4,4) f32, intr (4,) f32, obs_weights (N,) f32), all jnp arrays.
    """
    depths = jnp.asarray(depths, dtype=jnp.float32)
    n = depths.shape[0]

    colors = jnp.asarray(colors, dtype=jnp.float32)[..., :3]

    K = np.asarray(camera_matrix, dtype=np.float32)
    intr = jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], dtype=jnp.float32)

    world_to_cams = jnp.linalg.inv(
        jnp.asarray(cam_to_world_poses, dtype=jnp.float32))

    if obs_weights is None:
        obs_weights = np.ones((n,), dtype=np.float32)

    return (depths, colors, world_to_cams, intr,
            jnp.asarray(obs_weights, dtype=jnp.float32))


class SparseTSDFVolume:
    """Block-major TSDF volume with banded integration.

    API mirrors :class:`hive_tpu.ops.tsdf.TSDFVolume` (bounds + voxel size in,
    ``integrate_frames`` + ``get_mesh`` out); dims round up to block multiples.

    :param block_size: voxels per block along (x, y, z). Small blocks track
        the truncation band tightly because the per-voxel pixel gather — the
        dominant cost — scales with band-block volume, but each block also
        pays fixed classification-gather cost. With the band-refinement pass
        (tight depth windows), (8, 8, 8) measured fastest on VGA x 256^3:
        ~6% over (8, 8, 4) (half the classification), ~25% over (16, 16, 8).
    """

    SKIP, FREE, BAND, FREE_EDGE = 0, 1, 2, 3

    def __init__(self, volume_bounds, voxel_size: float,
                 trunc_margin: Optional[float] = None,
                 block_size: Union[int, Sequence[int]] = (8, 8, 8),
                 band_capacity_fraction: float = 0.25,
                 chunk_voxels: int = 1 << 16,
                 color_mode: str = "rgb565d16",
                 gather_split: Optional[int] = None,
                 pallas_sampler: Optional[Union[bool, str]] = None,
                 dtype=jnp.float32):
        """
        :param band_capacity_fraction: upper bound on the banded update's
            per-trip width, as a fraction of the block count (the trip width
            is additionally capped by ``chunk_voxels`` — see the ``chunk``
            comment in ``_build_integrator``). Bands wider than one trip take
            more ``while_loop`` trips — never a dense pass.
        :param chunk_voxels: voxel budget per banded-update trip (~64K
            measured fastest on v5e; the per-voxel pixel gather dominates and
            its cost is ceil(band/chunk) * chunk * BV, so a small chunk hugs
            the true band size).
        :param color_mode: per-voxel frame sampling layout. Gather cost on
            this part is ~(11 ns + 2 ns/byte) per element, so ONE u32 take
            beats the two takes (f32 depth + u32 RGB) by ~30%:

            * ``"rgb565d16"`` (production default): depth quantised to u16
              millimetres (the native precision of TUM/StrayScanner sensor
              depth and of the reference's own inputs) and colour to RGB565
              with a per-pixel 2x2 ordered dither, packed into one u32 word.
              The dither makes the *running mean* voxel colour converge to
              the true mean over multiple frames (quantisation error is
              +-4/255 per frame but alternates sign across the 2x2 pattern).
            * ``"rgb888"``: bit-exact f32 depth + 8-bit colour, two takes —
              matches the dense integrator's arithmetic exactly.
        :param dtype: storage dtype for the voxel arrays. ``jnp.bfloat16``
            halves HBM (a 320M-voxel volume drops to ~3.2 GB); updates always
            accumulate in float32.
        """
        volume_bounds = np.asarray(volume_bounds, dtype=np.float32)

        if volume_bounds.shape != (3, 2):
            raise ValueError(f"volume_bounds must be (3, 2), got {volume_bounds.shape}")

        if isinstance(block_size, int):
            block_size = (block_size,) * 3

        self.voxel_size = float(voxel_size)
        self.trunc_margin = float(trunc_margin if trunc_margin is not None
                                  else 5.0 * voxel_size)
        self.block_size: Tuple[int, int, int] = tuple(int(b) for b in block_size)

        B = np.asarray(self.block_size)
        dims = np.ceil((volume_bounds[:, 1] - volume_bounds[:, 0]) / voxel_size)
        dims = (np.ceil(dims / B) * B).astype(int)
        self.dims: Tuple[int, int, int] = tuple(int(d) for d in np.maximum(dims, B))
        self.origin = volume_bounds[:, 0].copy()
        self.volume_bounds = volume_bounds

        self.grid_blocks = tuple(int(d // b) for d, b in zip(self.dims, self.block_size))
        nb = int(np.prod(self.grid_blocks))
        self.num_blocks = nb

        bx, by, bz = np.meshgrid(*[np.arange(g) for g in self.grid_blocks], indexing="ij")
        block_index = np.stack([bx, by, bz], axis=-1).reshape(nb, 3)
        self.block_origins = (self.origin
                              + block_index * B * voxel_size).astype(np.float32)

        self.band_capacity = max(64, int(nb * band_capacity_fraction))
        # HIVE_TSDF_CHUNK overrides for A/B sweeps (scripts/ab_env_sweep.py);
        # the 2^16 default was measured fastest in both the XLA-gather and
        # Pallas-sampler eras (see CLAUDE.md ledger).
        self.chunk_voxels = (int(os.environ.get("HIVE_TSDF_CHUNK", "0"))
                             or int(chunk_voxels))

        if color_mode not in ("rgb565d16", "rgb888"):
            raise ValueError(f"unknown color_mode {color_mode!r}")
        self.color_mode = color_mode

        # Number of independent gather ops the band pass's per-voxel pixel
        # take is issued as. Gathers serialize per element on this part, but
        # INDEPENDENT gather ops in one program partially overlap (two
        # standalone u32 takes measured ~29 ns per element pair vs ~20 ns for
        # one) — splitting the one big take shortens the serialized critical
        # path without changing any value.
        if gather_split is None:
            gather_split = int(os.environ.get("HIVE_TSDF_GATHER_SPLIT", "1"))
        self.gather_split = max(1, int(gather_split))

        # Band pixel sampling backend: the Pallas block-window sampler
        # (ops/pallas_sampler.py, ~2x the XLA element gather on this part)
        # vs the classic per-voxel take. None = auto (Pallas on TPU when the
        # frame/block shapes qualify); True/False force; "interpret" runs
        # the kernel in the Pallas interpreter (CPU equivalence tests). Env
        # HIVE_TSDF_PALLAS (0/1/interpret) overrides the argument.
        env_sampler = os.environ.get("HIVE_TSDF_PALLAS", "")
        if env_sampler:
            pallas_sampler = {"0": False, "1": True}.get(env_sampler,
                                                         env_sampler)
        self.pallas_sampler = pallas_sampler

        Bx, By, Bz = self.block_size
        self.block_voxels = Bx * By * Bz
        self.dtype = dtype
        self.state = SparseTSDFState(
            tsdf=jnp.ones((nb, self.block_voxels), dtype=dtype),
            weight=jnp.zeros((nb, self.block_voxels), dtype=dtype),
            color=jnp.zeros((nb, 3 * self.block_voxels), dtype=dtype),
        )

        self._integrators = {}  # built lazily, keyed on image size
        # Row r of the state holds block _block_perm[r] of the canonical
        # x-major block grid (None = identity). Every integration stage is
        # permutation-invariant (block_origins rides along as data); only
        # dense extraction needs the inverse. Used for block-cyclic
        # placement across a device mesh (hive_tpu.parallel.fusion).
        self._block_perm: Optional[np.ndarray] = None

    @property
    def num_voxels(self) -> int:
        return int(np.prod(self.dims))

    def apply_block_permutation(self, perm) -> None:
        """Reorder the state's block rows so row r holds block ``perm[r]``.

        Integration semantics are unchanged (blocks are independent and
        carry their origins); the row order only affects how blocks land on
        devices when the leading axis is sharded — a block-cyclic ``perm``
        interleaves spatially-adjacent blocks across devices so a surface
        band concentrated in one region of the grid still spreads evenly.
        """
        perm = np.asarray(perm, dtype=np.int64)
        if perm.shape != (self.num_blocks,) or \
                not np.array_equal(np.sort(perm), np.arange(self.num_blocks)):
            raise ValueError("perm must be a permutation of arange(num_blocks)")

        perm_dev = jnp.asarray(perm)
        self.state = SparseTSDFState(tsdf=self.state.tsdf[perm_dev],
                                     weight=self.state.weight[perm_dev],
                                     color=self.state.color[perm_dev])
        self.block_origins = self.block_origins[perm]
        self._block_origins_dev = None

        self._block_perm = (perm if self._block_perm is None
                            else self._block_perm[perm])

    # -- frame integration ----------------------------------------------------
    def _build_integrator(self, height: int, width: int,
                          compact_cap: Optional[float] = COMPACT_LEVELS[0],
                          stub: str = ""):
        """Build the compiled integrator closures for one image size.

        :param stub: profiling-only ablation knob (NEVER set in production —
            every value produces WRONG results by design; used by
            scripts/profile_sparse_stages.py to attribute the per-frame cost
            between the serialized-gather stages and everything else):

            * ``"sample_const"``: the band pass skips the per-voxel pixel
              gather (constant depth/colour) — bounds the gather bill.
            * ``"rows_contig"``: state row gathers/scatters of the band and
              edge trips use contiguous row ids — bounds the cost of
              arbitrary-row index ops on the voxel state.
            * ``"classify_const"``: pyramid queries return constant depth
              windows — bounds the classification-gather bill (classify-only
              timings; band composition changes, so full-integrate timings
              are not comparable).
        """
        if stub not in ("", "sample_const", "rows_contig", "classify_const"):
            raise ValueError(f"unknown stub {stub!r}")

        Bx, By, Bz = self.block_size
        trunc = self.trunc_margin
        voxel = self.voxel_size
        band_capacity = self.band_capacity
        layout = pyramid_layout(height, width)

        # Every stage takes ``block_origins`` as a traced argument and derives
        # the block count from array shapes, so the same compiled body also
        # runs inside ``shard_map`` on a per-device slab of blocks (blocks are
        # independent — integration shards over space with no collectives).

        corner_offsets_np = np.asarray(
            [[x * Bx, y * By, z * Bz] for x in (0.0, 1.0) for y in (0.0, 1.0)
             for z in (0.0, 1.0)], dtype=np.float32) * voxel

        # Flat in-block voxel index i -> (ix, iy, iz), precomputed as
        # constants so camera coordinates stay elementwise on the flat axis.
        # The layout is Z-MAJOR (i = iz*Bx*By + ix*By + iy) so a block's SUB
        # z-slabs are CONTIGUOUS column ranges: the banded update runs at
        # z-slab granularity — classification amortises over whole blocks
        # while the expensive per-voxel gathers only run on slabs whose
        # camera-depth range intersects the refined surface window.
        #
        # SUB is the largest divisor of Bz keeping slab rows >= 512 voxels
        # wide. The threshold is a MEASURED trade-off, not tile alignment:
        # on this part row-granular gathers/scatters carry ~us-class per-ROW
        # overhead, so splitting the default (8,8,8) block (512-voxel rows)
        # into 4x128 slabs cut gathered band voxels ~20% but ran the whole
        # integrator at 765M updates/s vs 903M unsplit (861M at 2x256) —
        # the extra rows cost more than the skipped voxels saved. Blocks
        # with >= 1024 voxels do split down to 512-voxel slabs.
        BV = Bx * By * Bz
        SUB = 1
        for d in range(Bz, 0, -1):
            if Bz % d == 0 and BV // d >= 512:
                SUB = d
                break
        BVS = BV // SUB
        slab_z = (Bz // SUB) * voxel  # world-z thickness of one slab

        # Band pixel sampling backend: Pallas block-window sampler (~2x the
        # XLA element gather on this part — see ops/pallas_sampler.py) when
        # the shapes qualify; blocks whose footprint cannot fit the sampler
        # window (checked per frame in refine_band) take the classic path.
        from hive_tpu.ops import pallas_sampler as _ps

        shapes_ok = (self.color_mode == "rgb565d16" and stub == ""
                     and BVS % 128 == 0
                     and height % 8 == 0 and width % 128 == 0
                     and height >= _ps.PH and width >= _ps.PW)
        sampler_pref = self.pallas_sampler
        pallas_interpret = sampler_pref == "interpret"
        if sampler_pref is None:  # auto: compiled kernel on real TPUs only
            try:
                backend = jax.default_backend()
            except Exception:  # pragma: no cover — no backend at all
                backend = "none"
            use_pallas = shapes_ok and backend == "tpu"
        else:
            use_pallas = shapes_ok and bool(sampler_pref)

        # Small-window sampler class: MEASURED DEAD END at default (see
        # pallas_sampler.PH_SMALL — every dual-window config ran 4-7% slower
        # than the single 64x256 window on the v5e slice; trip-stream split
        # overhead beats the tile savings). Kept env-gated for A/B on future
        # hardware: HIVE_PALLAS_WIN_S="ph,pw" enables routing.
        win_small = None
        if use_pallas:
            spec = os.environ.get("HIVE_PALLAS_WIN_S", "0")
            if spec not in ("", "0"):
                ph_s, pw_s = (int(x) for x in spec.split(","))
                if (ph_s % 8 == 0 and pw_s % 128 == 0 and height >= ph_s
                        and width >= pw_s and (ph_s, pw_s) != (_ps.PH, _ps.PW)):
                    win_small = (ph_s, pw_s)

        # Dynamic-tile sampling: bound each block's in-kernel tile loops by
        # its footprint's strip/column counts (ops/pallas_sampler.py).
        # Default OFF until a TPU run records (a) successful Mosaic lowering,
        # (b) checksum bit-identity vs the static kernel over a >=64-frame
        # scan, and (c) a same-process A/B win — CPU CI runs the interpreter
        # and can catch neither a lowering failure nor a miscompile (this
        # backend is documented to silently miscompile some gather patterns).
        # HIVE_PALLAS_DYN=1 enables the dynamic bounds for that A/B.
        # TPU-validated 2026-08-20: lowers fine, checksum-identical, but
        # LOSES (8.25 vs 6.97 ms/frame) — stays default OFF (CLAUDE.md).
        pallas_dyn = (use_pallas
                      and os.environ.get("HIVE_PALLAS_DYN", "0") == "1")
        # Bounded-DMA sampling: static tile loops (the A/B winner) but the
        # window DMA copies only the smallest 8/16/32/64-row class covering
        # the block's footprint (ops/pallas_sampler.py dma_bound). Same
        # validation bar as HIVE_PALLAS_DYN before flipping the default.
        pallas_dmab = (use_pallas and not pallas_dyn
                       and os.environ.get("HIVE_PALLAS_DMAB", "0") == "1")

        # Refine-query backend: the 25-tap pyramid gather of the band
        # refinement as a Pallas window-reduce (ops/pallas_refine.py) —
        # bit-identical, measured 4.96 -> 3.92 ms/frame at cap 16384 and
        # 1.74 -> 1.53 at cap 4608 (the gather bill is ~10 of 27 ms/frame
        # at 512^3 volumes). Shares the sampler's backend gating; only the
        # default (5, -2) query shape is expressible (the kernel reduces the
        # exact [cv0..cv1] x [cu0..cu1] region 5 row segments cover).
        # HIVE_PALLAS_REFINE=0 restores the take path; =interpret runs the
        # kernel in the Pallas interpreter (tests — NOT the default in the
        # CPU suite: unlike the sampler, the refine kernel's per-step python
        # cost in interpret mode is material, and the take path is
        # bit-identical anyway). Gated on the BACKEND only, not the
        # sampler's shape/colour-mode predicate — the pyramid window-reduce
        # has no rgb565d16/BVS/frame-size preconditions (review finding:
        # piggybacking the sampler gate silently lost the win under
        # color_mode="rgb888").
        from hive_tpu.ops import pallas_refine as _pr

        # Backend test only — NOT derived from sampler_pref: routing the
        # refine gate through the sampler preference meant
        # pallas_sampler=False / HIVE_TSDF_PALLAS=0 silently disabled the
        # refine kernel too, so a sampler-only A/B toggled BOTH kernels and
        # misattributed the refine win (review finding, round 5).
        try:
            _backend_tpu = jax.default_backend() == "tpu"
        except Exception:  # pragma: no cover — no backend at all
            _backend_tpu = False

        _pr_pref = os.environ.get("HIVE_PALLAS_REFINE", "1")
        pallas_refine_on = (_backend_tpu and stub == ""
                            and (_pr_pref == "interpret"
                                 or (_pr_pref == "1"
                                     and not pallas_interpret)))
        refine_interpret = pallas_interpret or _pr_pref == "interpret"

        flat_s = np.arange(BVS)
        iota_axes = [jnp.asarray(((flat_s // By) % Bx).astype(np.float32)),
                     jnp.asarray((flat_s % By).astype(np.float32)),
                     jnp.asarray((flat_s // (Bx * By)).astype(np.float32))]

        def project_corners(origins, R, t, intr):
            """Per-block camera-space hull bounds from the 8 block corners.

            Returns (in_front, z_max, z_min, u0, u1, v0, v1,
            outside_frustum) where ``outside_frustum`` is an exact hull test
            against the four image-border planes through the camera centre —
            valid for blocks that straddle or sit behind the camera plane,
            where the projected AABB (u/v bounds) is meaningless. All
            quantities stay (nb,)-shaped and reduce incrementally over the 8
            corners: a stacked (nb, 8, 3) corner tensor tile-pads its minor
            dims to (8, 128) — 42x physical HBM, ~270 MB at 65K blocks, which
            made classification cost as much as the banded update it guards.
            """
            fx, fy, cx, cy = intr
            bx_, by_, bz_ = (origins[:, a] for a in range(3))

            z_min = z_max = None
            u0 = u1 = v0 = v1 = None
            # Hull-vs-plane accumulators (2 px conservative margin): a convex
            # hull entirely outside one border plane contains no voxel that
            # projects into the image, whatever side of z=0 it is on.
            l_max = r_min = t_max = b_min = None

            for k in range(8):
                ox, oy, oz = corner_offsets_np[k]
                cxw, cyw, czw = bx_ + ox, by_ + oy, bz_ + oz
                x = R[0, 0] * cxw + R[0, 1] * cyw + R[0, 2] * czw + t[0]
                y = R[1, 0] * cxw + R[1, 1] * cyw + R[1, 2] * czw + t[1]
                z = R[2, 0] * cxw + R[2, 1] * cyw + R[2, 2] * czw + t[2]

                safe_z = jnp.maximum(z, 1e-6)
                us = fx * x / safe_z + cx
                vs = fy * y / safe_z + cy

                lin_l = fx * x + (cx + 2.0) * z
                lin_r = fx * x + (cx - width - 2.0) * z
                lin_t = fy * y + (cy + 2.0) * z
                lin_b = fy * y + (cy - height - 2.0) * z

                if k == 0:
                    z_min = z_max = z
                    u0 = u1 = us
                    v0 = v1 = vs
                    l_max, r_min, t_max, b_min = lin_l, lin_r, lin_t, lin_b
                else:
                    z_min = jnp.minimum(z_min, z)
                    z_max = jnp.maximum(z_max, z)
                    u0 = jnp.minimum(u0, us)
                    u1 = jnp.maximum(u1, us)
                    v0 = jnp.minimum(v0, vs)
                    v1 = jnp.maximum(v1, vs)
                    l_max = jnp.maximum(l_max, lin_l)
                    r_min = jnp.minimum(r_min, lin_r)
                    t_max = jnp.maximum(t_max, lin_t)
                    b_min = jnp.minimum(b_min, lin_b)

            in_front = z_min > 1e-6
            outside_frustum = ((z_max <= 1e-6) | (l_max < 0) | (r_min > 0)
                               | (t_max < 0) | (b_min > 0))

            return in_front, z_min, z_max, u0, u1, v0, v1, outside_frustum

        def classes_from_bounds(in_front, z_min, z_max, u0, u1, v0, v1,
                                outside_frustum, dmin, dmax, all_valid):
            nb = in_front.shape[0]
            # Half-pixel rounding semantics (review finding, round 5): the
            # band/dense updates test round(u) against [0, width), so a
            # voxel at u in [-0.5, 0) IS in view (rounds to 0) and one at
            # u in [width-0.5, width) is NOT (rounds to width). ``overlaps``
            # must admit everything that COULD round in (else SKIP loses
            # real updates) and ``fully_inside`` — which licenses the
            # maskless elementwise FREE update — must guarantee every voxel
            # rounds in (u0 >= 0 is kept as the stricter-than-(-0.5) lower
            # bound; ties at width-0.5 round half-to-even, so strict < is
            # the safe exclusion).
            overlaps = ((u1 >= -0.5) & (u0 <= width - 0.5)
                        & (v1 >= -0.5) & (v0 <= height - 0.5))
            fully_inside = ((u0 >= 0) & (u1 < width - 0.5)
                            & (v0 >= 0) & (v1 < height - 0.5))

            classes = jnp.full((nb,), SparseTSDFVolume.BAND, dtype=jnp.int32)

            free = in_front & fully_inside & all_valid & (z_max < dmin - trunc)
            classes = jnp.where(free, SparseTSDFVolume.FREE, classes)

            # Partially-inside blocks that are provably free over their
            # CLAMPED footprint (query_flat_pyramid clamps the AABB to the
            # image, so dmin/all_valid cover exactly the visible pixels):
            # every in-view voxel has sdf > trunc -> uniform dist = 1, no
            # per-voxel depth needed — only a visibility mask, which is pure
            # projection arithmetic. Handled by the gather-free edge pass.
            free_edge = (in_front & ~fully_inside & overlaps & all_valid
                         & (z_max < dmin - trunc))
            classes = jnp.where(free_edge, SparseTSDFVolume.FREE_EDGE, classes)

            # dmax semantics: -inf = no valid pixel in the region (skip);
            # +inf = surface at/past the u16 range cap (far, but real — the
            # behind test is then never satisfied, which is the conservative
            # direction).
            no_surface = dmax == -jnp.inf
            behind = in_front & (z_min > dmax + trunc)
            # Projected AABBs are only trustworthy when the whole block is in
            # front of the camera; camera-straddling blocks stay on the band
            # path unless the exact hull test proves them outside the frustum
            # (without it, every block cut by the camera plane — e.g. the
            # whole z=0 layer when the camera sits on the volume boundary —
            # pays the banded gather path for nothing).
            skip = ((in_front & ~overlaps) | (in_front & no_surface) | behind
                    | (~in_front & outside_frustum))
            return jnp.where(skip, SparseTSDFVolume.SKIP, classes)

        def classify(block_origins, pyramid, R, t, intr):
            """Pass-1 classification with frustum-compacted pyramid queries.

            Projection arithmetic alone (no gathers) already decides every
            block that is outside the frustum or does not overlap the image
            — typically ~2/3 of the volume for an inside-looking camera
            (~34% candidates measured on the benchmark trajectory). Pyramid
            gathers dominate pass-1 cost and serialize per element on this
            part, so the 4-cell query runs only on a compacted candidate
            list (same pattern as ``refine_band``: compact ids, re-gather
            origins, re-project — re-projecting ~25 flops/corner is far
            cheaper than gathering the 8 precomputed bound arrays).

            ``compact_cap`` (a COMPACT_LEVELS fraction, or None = query all)
            is a BUILD-time choice made host-side per frame batch
            (``integrate_frames`` samples the block grid against the batch's
            frustums): a device-side ``lax.cond`` fallback measured ~2.2
            ms/frame of pure branch overhead inside the scan — more than
            the compaction saves. If a batch still overflows the capacity
            (host estimate beaten by more than its margin), overflow
            candidates conservatively stay BAND — correct, and the
            refinement pass still reclassifies up to ``refine_cap`` of them.
            """
            bounds = project_corners(block_origins, R, t, intr)
            in_front, z_min, z_max, u0, u1, v0, v1, outside = bounds
            nb = in_front.shape[0]

            def query(pu0, pu1, pv0, pv1, **kw):
                if stub == "classify_const":
                    return (jnp.full_like(pu0, 2.2), jnp.full_like(pu0, 2.8),
                            jnp.ones(pu0.shape, bool))
                return query_flat_pyramid(pyramid, layout, pu0, pu1, pv0, pv1,
                                          height, width, **kw)

            cap = (nb if compact_cap is None
                   else max(1024, int(nb * compact_cap)))
            if cap >= nb:
                dmin, dmax, all_valid = query(u0, u1, v0, v1)
                return classes_from_bounds(*bounds, dmin, dmax, all_valid)

            overlaps = (u1 >= 0) & (u0 < width) & (v1 >= 0) & (v0 < height)
            candidate = (in_front & overlaps) | (~in_front & ~outside)

            ids = compact_ids(candidate, cap, nb)
            id_valid = ids < nb
            safe_ids = jnp.minimum(ids, nb - 1)

            sub_bounds = project_corners(block_origins[safe_ids], R, t, intr)
            _, _, _, su0, su1, sv0, sv1, _ = sub_bounds
            dmin, dmax, all_valid = query(su0, su1, sv0, sv1)
            sub_classes = classes_from_bounds(*sub_bounds, dmin, dmax,
                                              all_valid)

            # Non-candidates are SKIP by construction: in front but off the
            # image, or hull-proven outside the frustum. Candidates default
            # BAND so capacity overflow degrades to correct-but-slower.
            out = jnp.where(candidate, jnp.int32(SparseTSDFVolume.BAND),
                            jnp.int32(SparseTSDFVolume.SKIP))
            return out.at[jnp.where(id_valid, ids, nb)].set(
                sub_classes, mode="drop")

        # Fixed capacity of the refinement pass: band blocks beyond it simply
        # stay band (correct, just unrefined — but also unrouted to the
        # Pallas sampler, so overflow pays twice; keep headroom). Sized ~2x
        # the typical band-after-pass-1 fraction. Every one of the grid^2
        # refine gathers runs on ALL cap slots (padding ids clamp to a real
        # row), so cap size is a direct gather-bill multiplier — A/B the
        # divisor with HIVE_TSDF_REFINE_CAP_DIV (default 8).
        cap_div = int(os.environ.get("HIVE_TSDF_REFINE_CAP_DIV", "8"))
        refine_cap = min(self.num_blocks,
                         max(1024, self.num_blocks // max(1, cap_div)))

        # Refinement query shape (taps-per-axis, pyramid level bias), A/B
        # knob HIVE_TSDF_REFINE="taps,bias". MEASURED 2026-08-19 with the
        # Pallas sampler live (same-process, N=64 bench shapes): (5,-2)
        # 8.10 ms/frame vs (3,-1) 8.54 (coarser cells inflate the band
        # 1939 -> 2335 blocks) vs (7,-2) 9.96 — the default is optimal, and
        # it is also the MINIMAL sound tap count at bias -2
        # (query_flat_pyramid rejects under-covered configs).
        refine_spec = os.environ.get("HIVE_TSDF_REFINE", "5,-2")
        refine_grid, refine_bias = (int(x) for x in refine_spec.split(","))

        # The window kernel expresses exactly the default query shape (its
        # 5 row segments reduce the full [cv0..cv1] x [cu0..cu1] region —
        # identical to the clamped 5x5 taps at bias -2); any A/B override of
        # HIVE_TSDF_REFINE keeps the take path.
        pallas_refine_on = (pallas_refine_on
                            and (refine_grid, refine_bias) == (5, -2))
        # Always 8-align the cap (the kernel requires it, and a
        # conditionally different cap would refine a different block set
        # under HIVE_PALLAS_REFINE=1 vs 0 — breaking the checksum-identity
        # A/B contract; review finding).
        refine_cap = min(self.num_blocks, ((refine_cap + 7) // 8) * 8)
        if pallas_refine_on:
            # The flat pyramid pads so any clipped window-rows DMA is in
            # bounds (row count derives from the frame width — a fixed 48
            # silently truncated the reduce on >1024-wide frames).
            total_pyr = int(layout[0][-1]) + int(layout[2][-1]) * int(layout[1][-1])
            pyr_rows = _pr.padded_pyramid_rows(total_pyr,
                                               _pr.window_rows(width))

            def refine_pyramid_view(pyramid):
                flat = jnp.pad(pyramid,
                               (0, pyr_rows * 128 - pyramid.shape[0]))
                return flat.reshape(pyr_rows, 128)

            def refine_query(pyramid2d, u0, u1, v0, v1):
                return _pr.query_flat_pyramid_pallas(
                    pyramid2d, layout, u0, u1, v0, v1, height, width,
                    interpret=refine_interpret)

        def refine_band(classes, block_origins, pyramid, R, t, intr):
            """Re-query band blocks with 5x5 cells two pyramid levels finer.

            Pass 1 reads depth bounds from a region up to ~3x the block
            footprint (2x2 cells at the covering level), which on sloped
            surfaces widens the apparent depth window enough to misclassify
            ~2-3x more blocks as band than a tight query would (measured on
            the benchmark scene). Re-querying just the compacted band blocks
            costs 25 single-u32 gathers x refine_cap ids — far less than
            the banded voxel gathers those extra blocks would pay.

            Returns ``(classes, dmin_blk, dmax_blk, free_ok_blk)``: the
            per-block refined depth window and the free-classification
            precondition (in-front, fully inside the image, all depth valid),
            used by the z-slab culling of the banded update. Unrefined band
            blocks carry the conservative defaults (-inf, +inf, False) — no
            slab of theirs is ever culled.
            """
            nb = classes.shape[0]
            # nb comes from the traced shape so the same body serves
            # shard_map slabs (which see a fraction of the global blocks).
            cap = min(refine_cap, nb)
            band_ids = compact_ids(classes == SparseTSDFVolume.BAND, cap, nb)
            id_valid = band_ids < nb
            safe_ids = jnp.minimum(band_ids, nb - 1)

            origins = block_origins[safe_ids]
            bounds = project_corners(origins, R, t, intr)
            in_front, z_min, z_max, u0, u1, v0, v1, outside = bounds
            if stub == "classify_const":
                dmin, dmax, all_valid = (jnp.full_like(u0, 2.2),
                                         jnp.full_like(u0, 2.8),
                                         jnp.ones(u0.shape, bool))
            elif pallas_refine_on and cap % 8 == 0:
                dmin, dmax, all_valid = refine_query(
                    refine_pyramid_view(pyramid), u0, u1, v0, v1)
            else:
                dmin, dmax, all_valid = query_flat_pyramid(
                    pyramid, layout, u0, u1, v0, v1, height, width,
                    grid=refine_grid, level_bias=refine_bias)
            refined = classes_from_bounds(*bounds, dmin, dmax, all_valid)

            # Straddling blocks keep their pass-1 class (their AABBs are
            # meaningless and the frustum test already ran in pass 1).
            refined = jnp.where(in_front, refined, SparseTSDFVolume.BAND)

            scatter_ids = jnp.where(id_valid, band_ids, nb)
            classes = classes.at[scatter_ids].set(refined, mode="drop")

            if use_pallas:
                # Per-block sampler windows from the (clipped) corner-hull
                # pixel AABB. Voxel-centre projections lie inside the hull
                # (perspective of a z>0 box attains extremes at corners) and
                # the band update clips coords into the image the same way,
                # so a block "fits" iff every sampled coordinate lands in its
                # tile-aligned PH x PW window (+-1 rounding margin). Each
                # block routes to the SMALLEST window class it fits (sampling
                # cost scales with the window's tile count); unfit,
                # unrefined, and straddling blocks keep the take path.
                u0c = jnp.clip(u0, 0.0, width - 1.0)
                u1c = jnp.clip(u1, 0.0, width - 1.0)
                v0c = jnp.clip(v0, 0.0, height - 1.0)
                v1c = jnp.clip(v1, 0.0, height - 1.0)

                def fit_window(ph, pw):
                    wv = jnp.clip(jnp.floor(v0c) - 1.0, 0.0,
                                  float(height - ph)).astype(jnp.int32)
                    wv = (wv // 8) * 8
                    wu = jnp.clip(jnp.floor(u0c) - 1.0, 0.0,
                                  float(width - pw)).astype(jnp.int32)
                    wu = (wu // 128) * 128
                    fit = (in_front
                           & (refined == SparseTSDFVolume.BAND)
                           & (jnp.ceil(v1c) + 1.0
                              <= wv.astype(jnp.float32) + (ph - 1))
                           & (jnp.ceil(u1c) + 1.0
                              <= wu.astype(jnp.float32) + (pw - 1)))
                    # Footprint tile counts for the dynamic-tile sampler:
                    # every in-view coordinate (incl. the fit check's +-1
                    # rounding margin) lies within the first n_rows 8-row
                    # strips / n_cols 128-lane columns of the window.
                    # Out-of-view lanes may clamp beyond them — the sampler
                    # returns word 0 there, and depth 0 is masked invalid
                    # exactly like the sampled-garbage word was.
                    vmax = jnp.ceil(v1c) + 1.0 - wv.astype(jnp.float32)
                    umax = jnp.ceil(u1c) + 1.0 - wu.astype(jnp.float32)
                    n_rows = jnp.clip(vmax.astype(jnp.int32) // 8 + 1,
                                      1, ph // 8)
                    n_cols = jnp.clip(umax.astype(jnp.int32) // 128 + 1,
                                      1, pw // 128)

                    def scat(x, fill):
                        return (jnp.full((nb,), fill, x.dtype)
                                .at[scatter_ids].set(x, mode="drop"))

                    return (scat(wv, 0), scat(wu, 0), scat(n_rows, 0),
                            scat(n_cols, 0), scat(fit, False))

                windows = (fit_window(*win_small) if win_small else None,
                           fit_window(_ps.PH, _ps.PW))
            else:
                windows = None

            if SUB == 1:  # slab culling unused — skip the extra scatters
                return classes, None, None, None, windows

            # Same half-pixel-aware bound as classes_from_bounds: free slabs
            # take the maskless elementwise update.
            fully_inside = ((u0 >= 0) & (u1 < width - 0.5)
                            & (v0 >= 0) & (v1 < height - 0.5))
            free_ok = in_front & fully_inside & all_valid

            dmin_blk = jnp.full((nb,), -jnp.inf).at[scatter_ids].set(
                jnp.where(in_front, dmin, -jnp.inf), mode="drop")
            dmax_blk = jnp.full((nb,), jnp.inf).at[scatter_ids].set(
                jnp.where(in_front, dmax, jnp.inf), mode="drop")
            free_ok_blk = jnp.zeros((nb,), bool).at[scatter_ids].set(
                free_ok, mode="drop")

            return classes, dmin_blk, dmax_blk, free_ok_blk, windows

        def classify_refined(block_origins, pyramid, R, t, intr):
            classes = classify(block_origins, pyramid, R, t, intr)
            return refine_band(classes, block_origins, pyramid, R, t, intr)

        def slab_masks(block_origins, classes, dmin_blk, dmax_blk, free_ok_blk,
                       R, t, obs_weight):
            """Per-z-slab band/free decisions for band blocks.

            The refined depth window is a block-footprint bound, so it is
            valid for every slab (slab footprint is a subset). Each slab's
            camera-depth range comes from linear interpolation of the block
            corner depths (exact — the world->camera map is affine), so a
            slab entirely in front of the window is FREE (dist = 1, no
            gather; needs the block-level free precondition) and one entirely
            behind it is SKIP.

            :return: (band_flat (nb*SUB,) bool, free_w_flat (nb*SUB,) f32,
                edge_flat (nb*SUB,) bool) where free_w_flat carries the
                observation weight for both block-level FREE blocks and free
                slabs of band blocks, and edge_flat marks FREE_EDGE rows for
                the gather-free masked pass.
            """
            nb = classes.shape[0]
            band_blk = classes == SparseTSDFVolume.BAND
            free_blk = classes == SparseTSDFVolume.FREE
            edge_blk = classes == SparseTSDFVolume.FREE_EDGE

            if SUB == 1:
                return band_blk, jnp.where(free_blk, obs_weight, 0.0), edge_blk

            # Camera-space z of the 8 block corners (k = 4x + 2y + z bits).
            bx_, by_, bz_ = (block_origins[:, a] for a in range(3))
            zc = []
            for k in range(8):
                ox, oy, oz = corner_offsets_np[k]
                zc.append(R[2, 0] * (bx_ + ox) + R[2, 1] * (by_ + oy)
                          + R[2, 2] * (bz_ + oz) + t[2])

            band_cols, free_cols = [], []
            for s in range(SUB):
                z_min_s = z_max_s = None
                for xb in (0, 4):
                    for yb in (0, 2):
                        z0, z1 = zc[xb + yb], zc[xb + yb + 1]
                        for f in (s / SUB, (s + 1) / SUB):
                            zf = z0 + f * (z1 - z0)
                            if z_min_s is None:
                                z_min_s = z_max_s = zf
                            else:
                                z_min_s = jnp.minimum(z_min_s, zf)
                                z_max_s = jnp.maximum(z_max_s, zf)

                free_s = band_blk & free_ok_blk & (z_max_s < dmin_blk - trunc)
                skip_s = band_blk & (z_min_s > dmax_blk + trunc)
                band_cols.append(band_blk & ~free_s & ~skip_s)
                free_cols.append(free_blk | free_s)

            band_flat = jnp.stack(band_cols, axis=1).reshape(nb * SUB)
            free_flat = jnp.stack(free_cols, axis=1).reshape(nb * SUB)
            # Every slab of a FREE_EDGE block takes the masked edge pass
            # (the per-voxel in_view mask subsumes slab-level culling).
            edge_flat = jnp.repeat(edge_blk, SUB)
            return band_flat, jnp.where(free_flat, obs_weight, 0.0), edge_flat

        def slab_camera_coords(block_origins, sub_ids, R, t):
            rows = sub_ids // SUB
            s = (sub_ids % SUB).astype(jnp.float32)

            origins = block_origins[rows]                            # (K, 3)
            base = origins @ R.T + t                                 # (K, 3)
            # A slab's origin shifts along WORLD z by s * slab_z, which in
            # camera space is s * slab_z * R[:, 2].
            base = base + s[:, None] * (slab_z * R[:, 2])[None, :]
            step = R * voxel                                         # cam delta per index

            def axis_term(axis):
                return (base[:, axis][:, None]                       # (K, BVS)
                        + iota_axes[0] * step[axis, 0]
                        + iota_axes[1] * step[axis, 1]
                        + iota_axes[2] * step[axis, 2])

            return axis_term(0), axis_term(1), axis_term(2)

        # The banded update runs on a SLAB-SHAPED view of the state:
        # tsdf/weight (nb*SUB, BVS), colour (nb*3*SUB, BVS). The (nb, BV) ->
        # (nb*SUB, BVS) reshape is NOT free on TPU — the (8, 128)-tiled
        # physical layout differs, so XLA relays out the full state (~20
        # bytes/voxel). Doing it inside the per-trip while_loop body measured
        # a 3x whole-integrator regression; instead the state converts ONCE
        # per scan (to_slabs/from_slabs below) and every stage works on the
        # slab shape.
        if SUB == 1:
            # Identity: keeps colour as (nb, 3*BV) rows so a band trip
            # fetches/scatters ONE colour row per block instead of three
            # (row-granular index ops carry per-row overhead here).
            def to_slabs(state):
                return state

            def from_slabs(state):
                return state
        else:
            def to_slabs(state):
                nb = state.tsdf.shape[0]
                return SparseTSDFState(
                    tsdf=state.tsdf.reshape(nb * SUB, BVS),
                    weight=state.weight.reshape(nb * SUB, BVS),
                    color=state.color.reshape(nb * 3 * SUB, BVS))

            def from_slabs(state):
                nb = state.tsdf.shape[0] // SUB
                return SparseTSDFState(
                    tsdf=state.tsdf.reshape(nb, BV),
                    weight=state.weight.reshape(nb, BV),
                    color=state.color.reshape(nb, 3 * BV))

        def apply_free_weights(state, free_weights):
            """Elementwise dist=1 update with per-z-slab accumulated weights.

            Free slabs are fully inside the image with valid depth everywhere
            in their footprint and strictly in front of every surface: every
            voxel updates with dist 1 — no index ops at all. ``state`` is
            slab-shaped.
            """
            store = state.tsdf.dtype
            k = free_weights[:, None]

            w_old = state.weight.astype(jnp.float32)
            w_new = w_old + k
            tsdf = state.tsdf.astype(jnp.float32)
            tsdf_new = jnp.where(k > 0, (tsdf * w_old + k)
                                 / jnp.maximum(w_new, 1e-12), tsdf)

            return SparseTSDFState(tsdf=tsdf_new.astype(store),
                                   weight=w_new.astype(store),
                                   color=state.color)

        # -- frame sampling ------------------------------------------------
        # ``pack_frame`` builds the per-frame sampling image(s); the band
        # path fetches per-voxel values with ``sample_values``. Gathers on
        # this part cost ~(11 ns + 2 ns/byte) per element, so the packed
        # single-u32 mode saves ~30% of the dominant band cost vs the exact
        # two-take mode. NOTE: do NOT "optimise" two f32 takes into a 2-wide
        # f32 slab gather — jnp.take of a (2, HW) axis=1 / (HW, 2) axis=0
        # pair SILENTLY returns component 0 for both lanes on this TPU
        # backend (miscompiles). A complex64 pack gathers both words
        # correctly but costs the same as two plain takes (cost is
        # per-byte).
        split = self.gather_split

        def split_take(src, flat):
            """The per-voxel pixel gather, issued as ``split`` independent
            takes over contiguous row ranges of ``flat`` (K, BVS).

            Identical values to one big take — only the op decomposition
            changes, letting the hardware overlap the serialized gather
            streams (see ``gather_split`` in ``__init__``).
            """
            k = flat.shape[0]
            if split <= 1 or k % split:
                return jnp.take(src, flat)
            step = k // split
            parts = [jnp.take(src, flat[i * step:(i + 1) * step])
                     for i in range(split)]
            return jnp.concatenate(parts, axis=0)

        # Pyramid validity must mirror the sampling mode (see
        # build_flat_pyramid).
        packed_u16 = self.color_mode == "rgb565d16"

        if self.color_mode == "rgb565d16":

            def pack_frame(depth, color_im):
                # Depths beyond the u16-mm range (65.535 m) become INVALID
                # (0) rather than clamping — a clamp would fabricate a valid
                # 65.535 m surface along far-plane rays. The condition is
                # phrased as <= so NaN (which fails every comparison) also
                # lands on the invalid branch instead of reaching the uint
                # cast undefined. Mirrors build_flat_pyramid's validity.
                d_mm = jnp.round(depth * 1000.0)
                d_mm = jnp.where(d_mm <= 65535.0, jnp.clip(d_mm, 0.0, 65535.0),
                                 0.0)
                d_mm = d_mm.astype(jnp.uint32)

                # 2x2 ordered dither (0, .5 / .75, .25), computed
                # arithmetically — a table lookup would be a gather.
                vv = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 0) & 1
                uu = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 1) & 1
                dith = (0.5 * uu + 0.75 * vv - 1.0 * (uu * vv)).astype(
                    jnp.float32)

                c = jnp.clip(color_im, 0.0, 255.0)
                r5 = jnp.floor(c[..., 0] * (31.0 / 255.0) + dith)
                g6 = jnp.floor(c[..., 1] * (63.0 / 255.0) + dith)
                b5 = jnp.floor(c[..., 2] * (31.0 / 255.0) + dith)
                r5 = jnp.clip(r5, 0.0, 31.0).astype(jnp.uint32)
                g6 = jnp.clip(g6, 0.0, 63.0).astype(jnp.uint32)
                b5 = jnp.clip(b5, 0.0, 31.0).astype(jnp.uint32)

                return (d_mm | (r5 << 16) | (g6 << 21) | (b5 << 27),)

            def unpack_packed(w):
                depth_val = (w & 0xFFFF).astype(jnp.float32) * 1e-3
                rgb = jnp.stack(
                    [((w >> 16) & 31).astype(jnp.float32) * (255.0 / 31.0),
                     ((w >> 21) & 63).astype(jnp.float32) * (255.0 / 63.0),
                     ((w >> 27) & 31).astype(jnp.float32) * (255.0 / 31.0)],
                    axis=1)
                return depth_val, rgb

            def sample_values(sample, flat):
                if stub == "sample_const":
                    return (jnp.full(flat.shape, 2.6, jnp.float32),
                            jnp.full((flat.shape[0], 3, flat.shape[1]), 128.0,
                                     jnp.float32))
                return unpack_packed(split_take(sample[0].reshape(-1), flat))

        else:  # rgb888: exact f32 depth + one packed-u32 colour take

            def pack_frame(depth, color_im):
                c = jnp.clip(color_im, 0.0, 255.0).astype(jnp.uint32)
                return (depth, c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16))

            def sample_values(sample, flat):
                if stub == "sample_const":
                    return (jnp.full(flat.shape, 2.6, jnp.float32),
                            jnp.full((flat.shape[0], 3, flat.shape[1]), 128.0,
                                     jnp.float32))
                depth, packed_color = sample
                depth_val = split_take(depth.reshape(-1), flat)
                packed = split_take(packed_color.reshape(-1), flat)
                rgb = jnp.stack([(packed & 0xFF).astype(jnp.float32),
                                 ((packed >> 8) & 0xFF).astype(jnp.float32),
                                 ((packed >> 16) & 0xFF).astype(jnp.float32)],
                                axis=1)
                return depth_val, rgb

        def band_update_values(block_origins, slab_tsdf, slab_weight,
                               slab_color, sub_ids, slab_valid, sample,
                               R, t, intr, obs_weight, windows=None):
            # Accumulate in fp32 regardless of storage dtype.
            slab_tsdf = slab_tsdf.astype(jnp.float32)
            slab_weight = slab_weight.astype(jnp.float32)
            slab_color = slab_color.astype(jnp.float32)   # (K, 3, BVS)
            fx, fy, cx, cy = intr
            cam_x, cam_y, cam_z = slab_camera_coords(block_origins, sub_ids,
                                                     R, t)

            safe_z = jnp.where(cam_z > 1e-6, cam_z, 1.0)
            u = jnp.round(fx * cam_x / safe_z + cx).astype(jnp.int32)
            v = jnp.round(fy * cam_y / safe_z + cy).astype(jnp.int32)

            in_view = (cam_z > 1e-6) & (u >= 0) & (u < width) & (v >= 0) & (v < height)

            vc = jnp.clip(v, 0, height - 1)
            uc = jnp.clip(u, 0, width - 1)

            if windows is not None:
                # Pallas block-window sampler: every row of this trip is a
                # block whose (clipped) coords fit its PH x PW window, so the
                # sampled words are identical to the take path's — only the
                # fetch mechanism differs (see ops/pallas_sampler.py). In
                # dynamic-tile mode the kernel additionally bounds its
                # per-block tile loops by the footprint's strip/column
                # counts; out-of-footprint (= out-of-view) lanes read word 0,
                # which the ``valid`` mask below discards identically.
                win_v0_all, win_u0_all, win_nr_all, win_nc_all, sampler_fn = \
                    windows
                rows = sub_ids // SUB
                k = sub_ids.shape[0]
                groups = BVS // 128
                if win_nr_all is None:
                    w = sampler_fn(
                        win_v0_all[rows], win_u0_all[rows], sample[0],
                        vc.reshape(k, groups, 128),
                        uc.reshape(k, groups, 128))
                else:
                    w = sampler_fn(
                        win_v0_all[rows], win_u0_all[rows],
                        win_nr_all[rows], win_nc_all[rows], sample[0],
                        vc.reshape(k, groups, 128),
                        uc.reshape(k, groups, 128))
                depth_val, rgb = unpack_packed(w.reshape(k, BVS))
            else:
                flat = vc * width + uc
                # (depth_val (K, BVS), rgb (K, 3, BVS)).
                depth_val, rgb = sample_values(sample, flat)

            sdf = depth_val - cam_z
            valid = (in_view & (depth_val > 0.0) & (sdf >= -trunc)
                     & slab_valid[:, None])

            dist = jnp.minimum(1.0, sdf / trunc)
            w_obs = jnp.where(valid, obs_weight, 0.0)

            w_new = slab_weight + w_obs
            safe_w = jnp.maximum(w_new, 1e-12)

            # w_obs > 0 guard: a zero obs_weight frame must be a no-op
            # ((tsdf*0 + dist*0)/1e-12 would ZERO the tsdf — the isosurface
            # value — at never-observed voxels, and the FREE/edge passes
            # already guard, so the state would also become
            # classification-dependent). Bit-identical for w_obs > 0.
            upd = valid & (w_obs > 0.0)
            tsdf_new = jnp.where(upd, (slab_tsdf * slab_weight + dist * w_obs)
                                 / safe_w, slab_tsdf)

            color_new = jnp.where(upd[:, None],
                                  (slab_color * slab_weight[:, None]
                                   + rgb * w_obs[:, None]) / safe_w[:, None],
                                  slab_color)

            return tsdf_new, w_new, color_new

        def update_band(state, block_origins, sub_ids, slab_valid, sample,
                        R, t, intr, obs_weight, windows=None):
            """One banded trip over slab row ids. ``state`` is slab-shaped;
            colour rows interleave as (block, channel, slab)."""
            nbs = state.tsdf.shape[0]
            store = state.tsdf.dtype
            k = sub_ids.shape[0]

            # Profiling ablation: state row index ops on CONTIGUOUS rows
            # (projection/sampling still use the real band ids).
            row_ids = (jnp.arange(k, dtype=sub_ids.dtype)
                       if stub == "rows_contig" else sub_ids)

            if SUB == 1:
                # One (K, 3*BV) colour row per block.
                slab_color = state.color[row_ids].astype(jnp.float32)
                slab_color = slab_color.reshape(k, 3, BVS)
            else:
                rows = row_ids // SUB
                subs = row_ids % SUB
                color_ids = [(rows * 3 + ch) * SUB + subs for ch in range(3)]
                slab_color = jnp.stack([state.color[ids]
                                        for ids in color_ids], axis=1)

            tsdf_new, w_new, color_new = band_update_values(
                block_origins, state.tsdf[row_ids], state.weight[row_ids],
                slab_color, sub_ids, slab_valid, sample, R, t, intr,
                obs_weight, windows=windows)

            scatter_ids = jnp.where(slab_valid, row_ids, nbs)
            color = state.color
            if SUB == 1:
                color = color.at[scatter_ids].set(
                    color_new.reshape(k, 3 * BVS).astype(store), mode="drop")
            else:
                for ch in range(3):
                    ch_ids = jnp.where(slab_valid, color_ids[ch], nbs * 3)
                    color = color.at[ch_ids].set(
                        color_new[:, ch].astype(store), mode="drop")

            return SparseTSDFState(
                tsdf=state.tsdf.at[scatter_ids].set(tsdf_new.astype(store),
                                                    mode="drop"),
                weight=state.weight.at[scatter_ids].set(w_new.astype(store),
                                                        mode="drop"),
                color=color)

        # Per-trip width of the banded update (in z-slab rows). There is NO
        # dense fallback: a band bigger than one chunk just takes more trips
        # of the same compiled body (a while_loop), so no giant-N gather
        # shape ever exists in the program regardless of volume size.
        # ~64K voxels per trip measured fastest on v5e: the per-voxel pixel
        # gather dominates, and its cost is ceil(band/chunk) * chunk_voxels —
        # a small chunk hugs the true band size (swept 29 ms/frame at 64K
        # vs 45 ms/frame at 256K voxels per trip, VGA x 256^3, (8,8,8)).
        chunk = min(band_capacity * SUB,
                    max(64, self.chunk_voxels // max(1, BVS)))

        if use_pallas:
            from hive_tpu.ops.pallas_sampler import build_patch_sampler

            _pallas_sample_fn = build_patch_sampler(
                height, width, chunk, BVS // 128,
                dynamic_tiles=pallas_dyn, dma_bound=pallas_dmab,
                interpret=pallas_interpret)
            _pallas_sample_small = (build_patch_sampler(
                height, width, chunk, BVS // 128,
                ph=win_small[0], pw=win_small[1],
                dynamic_tiles=pallas_dyn, dma_bound=pallas_dmab,
                interpret=pallas_interpret) if win_small else None)
        else:
            _pallas_sample_fn = None
            _pallas_sample_small = None

        # Empty-stream gate (MEASURED DEAD END 2026-08-21, default OFF): a
        # lax.cond that skips a zero-count trip stream's compact+loop body
        # sounded like a free ~0.17 ms/frame (the take-path stream is empty
        # on most frames but still paid its full-width compaction sort) —
        # but the A/B LOST: 5.47 ms/frame gated vs 5.26 ungated
        # (ab_env_sweep, same-process, checksums identical). The cond's
        # pass-through branch returns the carried state unchanged, which
        # breaks XLA's in-place buffer aliasing through the scan — the
        # state copies it forces cost more than the skipped sorts save.
        # Knob kept for re-testing on other parts/compilers.
        skip_empty = os.environ.get("HIVE_TSDF_SKIP_EMPTY", "0") == "1"

        def count_gated(count, run, state):
            if not skip_empty:
                return run(state)
            return jax.lax.cond(count > 0, run, lambda s: s, state)

        def update_band_chunked(state, block_origins, band_flat, sample,
                                R, t, intr, obs_weight, windows=None):
            # ``state`` is slab-shaped: tsdf rows ARE the slab rows.
            nbs = state.tsdf.shape[0]
            nbs_pad = ((nbs + chunk - 1) // chunk) * chunk
            band_count = jnp.sum(band_flat)

            def run(state):
                band_ids = compact_ids(band_flat, nbs, nbs)
                # Pad so dynamic_slice never clamps (a clamped slice would
                # re-read ids from the previous trip and double-integrate
                # those slabs).
                padded = jnp.concatenate(
                    [band_ids, jnp.full((nbs_pad - nbs,), nbs,
                                        dtype=band_ids.dtype)])
                num_trips = (band_count + chunk - 1) // chunk

                def trip(carry):
                    state, i = carry
                    ids = jax.lax.dynamic_slice(padded, (i * chunk,), (chunk,))
                    valid = ids < nbs
                    ids = jnp.minimum(ids, nbs - 1)
                    state = update_band(state, block_origins, ids, valid,
                                        sample, R, t, intr, obs_weight,
                                        windows=windows)
                    return state, i + 1

                state_out, _ = jax.lax.while_loop(
                    lambda c: c[1] < num_trips, trip, (state, jnp.int32(0)))
                return state_out

            return count_gated(band_count, run, state)

        # The edge pass pays no per-voxel gather, so a wider trip is nearly
        # free (padding rows cost only contiguous row movement + VPU math).
        edge_chunk = min(band_capacity * SUB, 4 * chunk)

        def update_edge(state, block_origins, sub_ids, slab_valid,
                        R, t, intr, obs_weight):
            """One gather-free trip over FREE_EDGE slab rows.

            The block is provably free over its visible footprint (see
            ``classes_from_bounds``): every in-view voxel updates with
            dist = 1 and all depth pixels under the footprint are valid, so
            the only per-voxel work is the projection arithmetic for the
            ``in_view`` mask — the same rounding as the band path, keeping
            results bit-identical to the dense integrator's free voxels.
            Colour is untouched (FREE semantics, module docstring).
            """
            nbs = state.tsdf.shape[0]
            store = state.tsdf.dtype
            fx, fy, cx, cy = intr

            row_ids = (jnp.arange(sub_ids.shape[0], dtype=sub_ids.dtype)
                       if stub == "rows_contig" else sub_ids)
            slab_tsdf = state.tsdf[row_ids].astype(jnp.float32)
            slab_weight = state.weight[row_ids].astype(jnp.float32)

            cam_x, cam_y, cam_z = slab_camera_coords(block_origins, sub_ids,
                                                     R, t)
            safe_z = jnp.where(cam_z > 1e-6, cam_z, 1.0)
            u = jnp.round(fx * cam_x / safe_z + cx).astype(jnp.int32)
            v = jnp.round(fy * cam_y / safe_z + cy).astype(jnp.int32)
            in_view = ((cam_z > 1e-6) & (u >= 0) & (u < width) & (v >= 0)
                       & (v < height))

            w_obs = jnp.where(in_view & slab_valid[:, None], obs_weight, 0.0)
            w_new = slab_weight + w_obs
            safe_w = jnp.maximum(w_new, 1e-12)
            tsdf_new = jnp.where(w_obs > 0,
                                 (slab_tsdf * slab_weight + w_obs) / safe_w,
                                 slab_tsdf)

            scatter_ids = jnp.where(slab_valid, row_ids, nbs)
            return SparseTSDFState(
                tsdf=state.tsdf.at[scatter_ids].set(tsdf_new.astype(store),
                                                    mode="drop"),
                weight=state.weight.at[scatter_ids].set(w_new.astype(store),
                                                        mode="drop"),
                color=state.color)

        def update_edge_chunked(state, block_origins, edge_flat,
                                R, t, intr, obs_weight):
            nbs = state.tsdf.shape[0]
            nbs_pad = ((nbs + edge_chunk - 1) // edge_chunk) * edge_chunk
            edge_count = jnp.sum(edge_flat)

            def run(state):
                edge_ids = compact_ids(edge_flat, nbs, nbs)
                padded = jnp.concatenate(
                    [edge_ids, jnp.full((nbs_pad - nbs,), nbs,
                                        dtype=edge_ids.dtype)])
                num_trips = (edge_count + edge_chunk - 1) // edge_chunk

                def trip(carry):
                    state, i = carry
                    ids = jax.lax.dynamic_slice(padded, (i * edge_chunk,),
                                                (edge_chunk,))
                    valid = ids < nbs
                    ids = jnp.minimum(ids, nbs - 1)
                    state = update_edge(state, block_origins, ids, valid,
                                        R, t, intr, obs_weight)
                    return state, i + 1

                state_out, _ = jax.lax.while_loop(
                    lambda c: c[1] < num_trips, trip, (state, jnp.int32(0)))
                return state_out

            return count_gated(edge_count, run, state)

        def run_band_updates(state, block_origins, band_flat, windows,
                             sample, R, t, intr, obs_weight):
            """Dispatch the banded trips, routing each block to the smallest
            Pallas sampler window it fits, else the classic take path."""
            if windows is None:
                return update_band_chunked(state, block_origins, band_flat,
                                           sample, R, t, intr, obs_weight)

            small, large = windows
            win_v0, win_u0, win_nr, win_nc, fits_blk = large
            if not (pallas_dyn or pallas_dmab):
                win_nr = win_nc = None
            fit_l = fits_blk if SUB == 1 else jnp.repeat(fits_blk, SUB)
            if small is not None:
                # A small-window fit implies a large-window fit (same AABB,
                # same-or-later aligned origin, strictly wider coverage), so
                # the large class is exactly fit_l & ~fit_s.
                wv_s, wu_s, nr_s, nc_s, fit_s_blk = small
                if not (pallas_dyn or pallas_dmab):
                    nr_s = nc_s = None
                fit_s = (fit_s_blk if SUB == 1
                         else jnp.repeat(fit_s_blk, SUB))
                state = update_band_chunked(
                    state, block_origins, band_flat & fit_s, sample,
                    R, t, intr, obs_weight,
                    windows=(wv_s, wu_s, nr_s, nc_s, _pallas_sample_small))
                fit_l = fit_l & ~fit_s
            state = update_band_chunked(
                state, block_origins, band_flat & fit_l, sample,
                R, t, intr, obs_weight,
                windows=(win_v0, win_u0, win_nr, win_nc, _pallas_sample_fn))
            # Oversized/unrefined/straddling band blocks: classic gather
            # (zero trips when everything fits — the common case).
            fits_any = fit_l if small is None else (fit_l | fit_s)
            return update_band_chunked(
                state, block_origins, band_flat & ~fits_any, sample,
                R, t, intr, obs_weight)

        def integrate_body(state, block_origins, depth, color_im, world_to_cam,
                           intr, obs_weight):
            R = world_to_cam[:3, :3]
            t = world_to_cam[:3, 3]

            sample = pack_frame(depth, color_im)
            pyramid = build_flat_pyramid(depth, height, width,
                                         packed_u16=packed_u16)
            classes, dmin_blk, dmax_blk, free_ok, windows = classify_refined(
                block_origins, pyramid, R, t, intr)
            band_flat, free_w, edge_flat = slab_masks(
                block_origins, classes, dmin_blk, dmax_blk, free_ok, R, t,
                obs_weight)
            state = apply_free_weights(to_slabs(state), free_w)
            state = run_band_updates(state, block_origins, band_flat, windows,
                                     sample, R, t, intr, obs_weight)
            state = update_edge_chunked(state, block_origins, edge_flat,
                                        R, t, intr, obs_weight)
            return from_slabs(state)

        @partial(jax.jit, donate_argnums=(0,))
        def integrate_one(state, block_origins, depth, color_im, world_to_cam,
                          intr, obs_weight):
            return integrate_body(state, block_origins, depth, color_im,
                                  world_to_cam, intr, obs_weight)

        def integrate_scan_impl(state, block_origins, depths, colors,
                                world_to_cams, intr, obs_weights):
            # Weighted-mean TSDF updates are order-independent, so all frames'
            # free-space contributions batch into ONE elementwise pass at the
            # end (free_weights accumulates per-block observation weight);
            # only banded updates run inside the scan.
            def body(carry, frame):
                state, free_weights = carry
                depth, color_im, world_to_cam, obs_weight = frame

                R = world_to_cam[:3, :3]
                t = world_to_cam[:3, 3]

                sample = pack_frame(depth, color_im)
                pyramid = build_flat_pyramid(depth, height, width,
                                         packed_u16=packed_u16)
                classes, dmin_blk, dmax_blk, free_ok, windows = classify_refined(
                    block_origins, pyramid, R, t, intr)
                band_flat, free_w, edge_flat = slab_masks(
                    block_origins, classes, dmin_blk, dmax_blk, free_ok, R, t,
                    obs_weight)
                state = run_band_updates(state, block_origins, band_flat,
                                         windows, sample, R, t, intr,
                                         obs_weight)
                # Edge updates carry a per-voxel visibility mask, so unlike
                # whole-block FREE weights they cannot batch across frames.
                state = update_edge_chunked(state, block_origins, edge_flat,
                                            R, t, intr, obs_weight)

                return (state, free_weights + free_w), None

            free_weights0 = jnp.zeros((state.tsdf.shape[0] * SUB,),
                                      dtype=jnp.float32)
            # One slab relayout per SCAN, not per trip (see to_slabs note).
            (state, free_weights), _ = jax.lax.scan(
                body, (to_slabs(state), free_weights0),
                (depths, colors, world_to_cams, obs_weights))

            # One batched free-space pass: dist = 1 with total weight k.
            return from_slabs(apply_free_weights(state, free_weights))

        integrate_scan = jax.jit(integrate_scan_impl, donate_argnums=(0,))

        integrate_one.scan = integrate_scan
        # Un-jitted body for embedding in shard_map (hive_tpu.parallel.fusion).
        integrate_one.scan_impl = integrate_scan_impl

        # Expose the stages for profiling/testing. The standalone classify
        # wrappers take the raw depth image and build the pyramid themselves.
        def _classify_from_depth(block_origins, depth, R, t, intr):
            pyramid = build_flat_pyramid(depth, height, width,
                                         packed_u16=packed_u16)
            return classify(block_origins, pyramid, R, t, intr)

        def _classify_refined_from_depth(block_origins, depth, R, t, intr):
            pyramid = build_flat_pyramid(depth, height, width,
                                         packed_u16=packed_u16)
            return classify_refined(block_origins, pyramid, R, t, intr)[0]

        def _classify_refined_full(block_origins, depth, R, t, intr):
            """Full classify_refined output incl. the per-block sampler
            window assignments (profiling: fit-class split per frame)."""
            pyramid = build_flat_pyramid(depth, height, width,
                                         packed_u16=packed_u16)
            return classify_refined(block_origins, pyramid, R, t, intr)

        integrate_one.classify = jax.jit(_classify_from_depth)
        integrate_one.classify_refined = jax.jit(_classify_refined_from_depth)
        integrate_one.classify_refined_full = _classify_refined_full
        integrate_one.update_band = update_band
        integrate_one.chunk = chunk
        integrate_one.sub_slabs = SUB
        integrate_one.refine_cap = refine_cap
        integrate_one.use_pallas = use_pallas

        return integrate_one

    def integrate(self, color_image, depth_image, camera_matrix, cam_to_world_pose,
                  obs_weight: float = 1.0):
        self.integrate_frames(jnp.asarray(color_image, dtype=jnp.float32)[None],
                              jnp.asarray(depth_image, dtype=jnp.float32)[None],
                              camera_matrix,
                              jnp.asarray(cam_to_world_pose, dtype=jnp.float32)[None],
                              obs_weights=np.asarray([obs_weight], dtype=np.float32))

    def estimate_candidate_fraction(self, camera_matrix, cam_to_world_poses,
                                    height: int, width: int) -> float:
        """Host-side sampled estimate of the pass-1 candidate fraction.

        Mirrors the classification arithmetic of ``project_corners`` /
        ``classify`` on a strided sample of the block grid (<= ~4096
        blocks), returning the max over frames. Poses are tiny host data —
        no device work. Used to pick the compacted-vs-full classify build
        per frame batch; a wrong estimate only costs speed, never
        correctness (overflow candidates stay BAND).
        """
        K = np.asarray(camera_matrix, dtype=np.float32)
        poses_np = np.asarray(cam_to_world_poses, np.float32)

        # Memoize on the exact inputs: benchmark loops and re-integration
        # passes call with identical pose stacks, and even the batched host
        # estimate costs ~50 ms on a 1-core VM.
        cache_key = (poses_np.tobytes(), K.tobytes(), height, width)
        if getattr(self, "_frac_cache_key", None) == cache_key:
            return self._frac_cache_value

        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        w2cs = np.linalg.inv(poses_np)
        if w2cs.ndim == 2:
            w2cs = w2cs[None]

        # Sample <= 8 poses (evenly, endpoints included): the estimate only
        # picks a capacity CLASS via pick_compact_cap, and overflow degrades
        # to conservative BAND (speed, not correctness). The full per-pose
        # host loop measured 3.8 ms/frame at 64 frames on a 1-core VM — it
        # was the single largest integrate_frames overhead over the device
        # scan itself.
        if len(w2cs) > 8:
            idx = np.unique(np.round(
                np.linspace(0, len(w2cs) - 1, 8)).astype(int))
            w2cs = w2cs[idx]

        stride = max(1, int(math.ceil((self.num_blocks / 4096.0) ** (1 / 3))))
        B = np.asarray(self.block_size, np.float32)
        grids = [np.arange(0, g, stride) for g in self.grid_blocks]
        bx, by, bz = np.meshgrid(*grids, indexing="ij")
        origins = (self.origin
                   + np.stack([bx, by, bz], -1).reshape(-1, 3)
                   * B * self.voxel_size)
        offs = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                         for z in (0, 1)], np.float32) * B * self.voxel_size
        corners = origins[:, None, :] + offs[None]           # (M, 8, 3)

        # One batched pass over all sampled poses (no per-pose Python loop).
        R = w2cs[:, :3, :3]                                   # (F, 3, 3)
        t = w2cs[:, :3, 3]                                    # (F, 3)
        pts = np.einsum("mkj,fij->fmki", corners, R) + t[:, None, None, :]
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]       # (F, M, 8)
        safe_z = np.maximum(z, 1e-6)
        us, vs = fx * x / safe_z + cx, fy * y / safe_z + cy
        in_front = z.min(2) > 1e-6
        outside = ((z.max(2) <= 1e-6)
                   | ((fx * x + (cx + 2.0) * z).max(2) < 0)
                   | ((fx * x + (cx - width - 2.0) * z).min(2) > 0)
                   | ((fy * y + (cy + 2.0) * z).max(2) < 0)
                   | ((fy * y + (cy - height - 2.0) * z).min(2) > 0))
        overlaps = ((us.max(2) >= 0) & (us.min(2) < width)
                    & (vs.max(2) >= 0) & (vs.min(2) < height))
        cand = (in_front & overlaps) | (~in_front & ~outside)
        frac = float(cand.mean(1).max())
        self._frac_cache_key = cache_key
        self._frac_cache_value = frac
        return frac

    def integrate_frames(self, colors, depths, camera_matrix, cam_to_world_poses,
                         obs_weights=None):
        (depths, colors, world_to_cams, intr,
         obs_weights) = prepare_integration_inputs(
            colors, depths, camera_matrix, cam_to_world_poses, obs_weights)
        _, height, width = depths.shape

        # Compacted-classification build choice, per batch (poses are host
        # data; see estimate_candidate_fraction / pick_compact_cap).
        cap = pick_compact_cap(self.estimate_candidate_fraction(
            camera_matrix, cam_to_world_poses, height, width))

        integ = self._integrators.get((height, width, cap))
        if integ is None:
            integ = self._integrators[(height, width, cap)] = \
                self._build_integrator(height, width, compact_cap=cap)

        # One fused scan over the frame stack: a single dispatch, and XLA
        # overlaps classification with the previous frame's updates.
        self.state = integ.scan(self.state, self.block_origins_device,
                                depths, colors, world_to_cams, intr,
                                obs_weights)

        return self

    @property
    def block_origins_device(self):
        if getattr(self, "_block_origins_dev", None) is None:
            self._block_origins_dev = jnp.asarray(self.block_origins)
        return self._block_origins_dev

    # -- extraction -----------------------------------------------------------
    def _dense(self):
        """(tsdf (X,Y,Z), weight (X,Y,Z), color planes (3,X,Y,Z)) on device.

        Colour stays as channel planes — a dense ``(X,Y,Z,3)`` array would
        tile-pad its minor dim 3 -> 128 (42x HBM expansion).
        """
        nbx, nby, nbz = self.grid_blocks
        Bx, By, Bz = self.block_size

        inv_perm = (None if self._block_perm is None
                    else jnp.asarray(np.argsort(self._block_perm)))

        def to_dense(blocked):
            a = blocked.astype(jnp.float32)
            if inv_perm is not None:  # undo block-cyclic row placement
                a = a[inv_perm]
            # In-block layout is z-major (i = iz*Bx*By + ix*By + iy — see
            # _build_integrator: z-slabs must be contiguous for the banded
            # update's slab granularity).
            a = a.reshape(nbx, nby, nbz, Bz, Bx, By)
            a = jnp.transpose(a, (0, 4, 1, 5, 2, 3))
            return a.reshape(*self.dims)

        BV = self.block_voxels
        color_planes = jnp.stack(
            [to_dense(self.state.color[:, ch * BV:(ch + 1) * BV])
             for ch in range(3)])

        return (to_dense(self.state.tsdf), to_dense(self.state.weight),
                color_planes)

    def get_volume(self):
        tsdf, weight, color_planes = self._dense()
        # Host-side channel-last assembly (device (X,Y,Z,3) would tile-pad).
        color = np.stack([np.asarray(color_planes[ch]) for ch in range(3)],
                         axis=-1)
        return np.asarray(tsdf), np.asarray(weight), color

    def get_mesh(self):
        from hive_tpu.ops.marching import extract_isosurface_blocked

        # Extraction reads the block-major state directly (no dense volume
        # assembly — see extract_isosurface_blocked); it expects canonical
        # x-major block order, so un-permute block-cyclic placements first.
        tsdf_b, weight_b, color_b = self.state
        if self._block_perm is not None:
            inv = jnp.asarray(np.argsort(self._block_perm))
            tsdf_b, weight_b, color_b = tsdf_b[inv], weight_b[inv], color_b[inv]

        verts, faces, colors, normals = extract_isosurface_blocked(
            tsdf_b, weight_b, color_b, grid_blocks=self.grid_blocks,
            block_size=self.block_size, origin=self.origin,
            voxel_size=self.voxel_size)

        return verts, faces, normals, colors
