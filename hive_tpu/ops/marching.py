"""Isosurface extraction from a TSDF volume: marching tetrahedra on TPU.

The reference used skimage's (CPU) marching cubes via the tsdf-fusion
submodule's ``get_mesh`` (hive/fusion.py:127). This module re-designs
extraction for TPU with a two-pass, table-free algorithm:

1. **Active-cube pass (device)** — a fused elementwise kernel flags cubes whose
   8 corners are all observed and straddle the zero level set. Crossing data
   is kept minimal: the dense path ships pow2-class-padded compacted int32
   cube indices (a full bool mask measured as the dominant transfer at
   production sizes) and the sparse path ships a bit-packed activity mask
   for candidate blocks only (see ``_active_cubes_blocked_sparse``).
2. **Triangle pass (device, chunked)** — active cubes are split into 6
   tetrahedra (a face-consistent decomposition around the main diagonal, so
   neighbouring cubes share face diagonals and the mesh is crack-free). Each
   tetrahedron has only 16 sign cases (vs. 256 for marching cubes), which a
   tiny static table covers; vertices interpolate to the zero crossing along
   tet edges. Orientation is fixed numerically with the per-tet SDF gradient —
   no hand-maintained orientation table to get wrong.
3. **Weld pass (host)** — every emitted vertex lies on a unique grid edge
   (pair of global voxel ids), so exact vertex welding is a single
   ``np.unique`` over packed edge keys.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Static geometry tables (tiny, derived — see module docstring).
# ---------------------------------------------------------------------------

# Cube corner offsets; corner id bit layout: bit2 = dx, bit1 = dy, bit0 = dz.
CORNER_OFFSETS = np.array([
    [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
    [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
], dtype=np.int32)

# Six tetrahedra per cube, all sharing the main diagonal (corner 0 → corner 7).
# Consecutive tets share a face, and the induced face diagonals agree between
# adjacent cubes (verified in tests via watertightness of closed surfaces).
TETS = np.array([
    [0, 1, 3, 7],
    [0, 3, 2, 7],
    [0, 2, 6, 7],
    [0, 6, 4, 7],
    [0, 4, 5, 7],
    [0, 5, 1, 7],
], dtype=np.int32)

# The 6 edges of a tetrahedron as (local corner a, local corner b) slot pairs.
TET_EDGES = np.array([
    [0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3],
], dtype=np.int32)

# For each of the 16 inside/outside sign cases (bit i set = tet corner i is
# inside, i.e. sdf < 0): up to two triangles, each as 3 edge slots. -1 = none.
_N = -1
TET_TRIANGLE_TABLE = np.array([
    [[_N, _N, _N], [_N, _N, _N]],  # 0000
    [[0, 1, 2], [_N, _N, _N]],     # 0001: corner 0 inside
    [[0, 3, 4], [_N, _N, _N]],     # 0010: corner 1 inside
    [[1, 3, 4], [1, 4, 2]],        # 0011: corners 0, 1
    [[1, 3, 5], [_N, _N, _N]],     # 0100: corner 2 inside
    [[0, 3, 5], [0, 5, 2]],        # 0101: corners 0, 2
    [[0, 1, 5], [0, 5, 4]],        # 0110: corners 1, 2
    [[2, 4, 5], [_N, _N, _N]],     # 0111: corner 3 outside
    [[2, 4, 5], [_N, _N, _N]],     # 1000: corner 3 inside
    [[0, 4, 5], [0, 5, 1]],        # 1001: corners 0, 3
    [[0, 2, 5], [0, 5, 3]],        # 1010: corners 1, 3
    [[1, 3, 5], [_N, _N, _N]],     # 1011: corner 2 outside
    [[1, 2, 4], [1, 4, 3]],        # 1100: corners 2, 3
    [[0, 3, 4], [_N, _N, _N]],     # 1101: corner 1 outside
    [[0, 1, 2], [_N, _N, _N]],     # 1110: corner 0 outside
    [[_N, _N, _N], [_N, _N, _N]],  # 1111
], dtype=np.int32)


# ---------------------------------------------------------------------------
# Pass 1: active-cube detection (full volume, fused elementwise).
# ---------------------------------------------------------------------------

def _cube_corner_reduce(observed, inside):
    """(X, Y, Z) observed/inside planes -> (X-1, Y-1, Z-1) active-cube mask.

    The 8-corner AND/OR reductions factor separably over the three axes
    (9 shifted boolean ops instead of 24 corner slices — the shifted slices
    on a big volume's misaligned minor dim are the measured cost here).
    """
    all_observed = observed
    any_inside = inside
    all_inside = inside

    for axis in range(3):
        lo = tuple(slice(0, -1) if a == axis else slice(None) for a in range(3))
        hi = tuple(slice(1, None) if a == axis else slice(None) for a in range(3))
        all_observed = all_observed[lo] & all_observed[hi]
        any_inside = any_inside[lo] | any_inside[hi]
        all_inside = all_inside[lo] & all_inside[hi]

    return all_observed & any_inside & (~all_inside)


@jax.jit
def _active_cubes_mask(tsdf: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """(X-1, Y-1, Z-1) bool: cube has all corners observed and a sign change."""
    return _cube_corner_reduce(weight > 0.0, tsdf < 0.0)


def _state_voxel_address(x, y, z, *, grid_blocks, block_size):
    """Global voxel coords -> (block id, in-block offset) for the block-major
    sparse state. THE single definition of the storage addressing used by
    extraction: block = ((x//Bx)*nby + y//By)*nbz + z//Bz, in-block order
    Z-MAJOR (i = iz*Bx*By + ix*By + iy — set by tsdf_sparse._build_integrator,
    where z-slabs must be contiguous for the banded update)."""
    _, nby, nbz = grid_blocks
    bx, by, bz = block_size
    block = ((x // bx) * nby + (y // by)) * nbz + (z // bz)
    off = ((z % bz) * bx + (x % bx)) * by + (y % by)
    return block, off


@jax.jit
def _block_codes(tsdf_b, weight_b):
    """Per-voxel 2-bit class (0 unobserved / 1 outside / 2 inside) in the
    block-major layout, plus the per-block any-inside flag. One elementwise
    pass over the state — no relayout."""
    observed = weight_b > 0
    inside = observed & (tsdf_b < 0)
    code = jnp.where(observed, jnp.where(inside, jnp.uint8(2), jnp.uint8(1)),
                     jnp.uint8(0))
    return code, jnp.any(inside, axis=1)


# Forward block-neighbor combos, indexed k = dx*4 + dy*2 + dz.
_CORNER_COMBOS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1)
                  for dz in (0, 1)]


def _neighbor_block_rows(cand_ids, grid_blocks):
    """Host: (8, B) block ids of each candidate's forward-neighbor combos
    (k = dx*4 + dy*2 + dz) plus an in-grid validity mask (out-of-grid
    neighbors read block 0, masked to code 0 = unobserved on device — which
    also subsumes the volume-boundary in_range test: a cube whose +1 corner
    leaves the volume reads an out-of-grid block and fails all_observed)."""
    nbx, nby, nbz = grid_blocks
    cbx = cand_ids // (nby * nbz)
    cby = (cand_ids // nbz) % nby
    cbz = cand_ids % nbz

    ids8 = np.zeros((8, len(cand_ids)), np.int32)
    ok8 = np.zeros((8, len(cand_ids)), bool)
    for k, (dx, dy, dz) in enumerate(_CORNER_COMBOS):
        x, y, z = cbx + dx, cby + dy, cbz + dz
        ok = (x < nbx) & (y < nby) & (z < nbz)
        ids8[k] = np.where(ok, (x * nby + y) * nbz + z, 0)
        ok8[k] = ok
    return ids8, ok8


def _cube_active_rows(code_b, ids8, ok8, block_size):
    """(8, B) neighbor-combo rows of per-voxel 2-bit codes -> (B, bv) cube
    activity in the STATE in-block order (y minor, x stride by, z stride
    bx*by).

    Activity = all 8 corners observed + a sign change. Corner codes are
    GATHER-FREE: eight row-takes fetch each candidate block and its forward
    neighbors whole, and every corner's (B, bv) code array is then a flat
    roll of those rows with a constant wrap mask selecting the +axis
    neighbor — the previous per-corner element gather (8 gathers x
    candidate-cube count, serialized at ~7-11 ns each on this part)
    measured ~6 s alone at 67M candidate cubes on the e2e bench scene.
    """
    bx, by, bz = block_size
    bv = bx * by * bz

    A = {}
    for k, (dx, dy, dz) in enumerate(_CORNER_COMBOS):
        rows = jnp.take(code_b, ids8[k], axis=0)                     # (B, bv)
        A[(dx, dy, dz)] = rows * ok8[k][:, None].astype(rows.dtype)

    pos = np.arange(bv, dtype=np.int32)
    wrap_y = jnp.asarray(pos % by == by - 1)[None, :]
    wrap_x = jnp.asarray((pos // by) % bx == bx - 1)[None, :]
    wrap_z = jnp.asarray(pos // (bx * by) == bz - 1)[None, :]

    def axis_shift(a, b, stride, size, wrap):
        # +1 step along one axis: non-wrapping slots read a[p + stride],
        # wrapping slots read the neighbor row's axis-0 slot b[p - (size-1)*stride].
        return jnp.where(wrap, jnp.roll(b, (size - 1) * stride, axis=1),
                         jnp.roll(a, -stride, axis=1))

    def shift_y(a, b):
        return axis_shift(a, b, 1, by, wrap_y)

    def shift_x(a, b):
        return axis_shift(a, b, by, bx, wrap_x)

    def shift_z(a, b):
        return axis_shift(a, b, bx * by, bz, wrap_z)

    # 12 shifts build all 8 corner-code arrays (y stage 4, x stage 4, z 4).
    Y = {(ix, iz): shift_y(A[(ix, 0, iz)], A[(ix, 1, iz)])
         for ix in (0, 1) for iz in (0, 1)}

    all_observed = None
    any_inside = None
    all_inside = None
    for dy in (0, 1):
        Sy = {(ix, iz): (Y[(ix, iz)] if dy else A[(ix, 0, iz)])
              for ix in (0, 1) for iz in (0, 1)}
        for dx in (0, 1):
            T = {iz: (shift_x(Sy[(0, iz)], Sy[(1, iz)]) if dx
                      else Sy[(0, iz)]) for iz in (0, 1)}
            for dz in (0, 1):
                code = shift_z(T[0], T[1]) if dz else T[0]
                observed = code > 0
                inside = code == 2
                if all_observed is None:
                    all_observed, any_inside, all_inside = (observed, inside,
                                                            inside)
                else:
                    all_observed = all_observed & observed
                    any_inside = any_inside | inside
                    all_inside = all_inside & inside

    return all_observed & any_inside & ~all_inside


def _cube_mask_for_blocks(code_b, ids8, ok8, valid_count, block_size,
                          rows: int = 8192):
    """(8, B) padded neighbor-combo rows -> (B, bv) cube activity, with rows
    >= valid_count forced inactive. ``lax.map`` over row chunks bounds the
    per-chunk intermediates so one program handles arbitrarily many
    candidate blocks in fixed memory."""
    B = ids8.shape[1]
    valid = jnp.arange(B, dtype=jnp.int32) < valid_count
    if B <= rows:
        return _cube_active_rows(code_b, ids8, ok8, block_size) \
            & valid[:, None]

    nch = B // rows
    ids_c = ids8.reshape(8, nch, rows).transpose(1, 0, 2)
    ok_c = ok8.reshape(8, nch, rows).transpose(1, 0, 2)
    valid_c = valid.reshape(nch, rows)

    def one_chunk(args):
        i8, o8, v = args
        return _cube_active_rows(code_b, i8, o8, block_size) & v[:, None]

    mask = jax.lax.map(one_chunk, (ids_c, ok_c, valid_c))
    return mask.reshape(B, -1)


@partial(jax.jit, static_argnames=("block_size",))
def _active_mask_bits_for_blocks(code_b, ids8, ok8, valid_count, *,
                                 block_size):
    """Cube activity for the candidate blocks, BIT-PACKED for transfer:
    byte j carries flat-mask elements j + k*(N/8) in bit k (a strided
    packing — reducing over a leading dim of 8 avoids the (N/8, 8)
    minor-dim layout, which would tile-pad 8 -> 128 and materialise 16x the
    mask). The host unpacks, compacts, and maps to cube ids — device-side
    nonzero at full candidate capacity measured ~3 s slower at 67M
    candidate cubes (serialized scatter/gather), and per-chunk bool
    transfers cost 8x the bytes plus a round trip per 2048 blocks."""
    mask = _cube_mask_for_blocks(code_b, ids8, ok8, valid_count, block_size)
    flat = mask.reshape(8, -1).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(8, dtype=jnp.uint32))[:, None]
    return jnp.sum(flat * weights, axis=0).astype(jnp.uint8)


def _active_cubes_blocked_sparse(tsdf_b, weight_b, *, grid_blocks,
                                 block_size) -> np.ndarray:
    """Sorted linear active-cube ids from block-major state, touching only
    CANDIDATE blocks (any-inside blocks dilated one block backward: a cube
    needs a negative corner, which can only live in an any-inside block).

    Replaces the dense-plane mask for the sparse path: the plane's
    (nb, BV) -> (X, Y, Z) relayout alone measured 5.8 s per 76M voxels on
    this part, while surfaces typically touch a few percent of blocks.

    ONE device dispatch ships the bit-packed activity mask; the host
    unpacks and compacts (cheap numpy passes). The earlier host-side loop
    moved a (blocks, bv) bool mask per 2048-block dispatch and measured
    7.4 s at 1.29M actives on the e2e bench scene (40 x ~1 MB round trips
    behind the tunnel); device-side count+compact variants measured WORSE
    (see CLAUDE.md 2026-08-19: serialized nonzero scatter/gather).
    """
    nbx, nby, nbz = grid_blocks
    bx, by, bz = block_size
    dims = (nbx * bx, nby * by, nbz * bz)

    code_b, inside_any = _block_codes(tsdf_b, weight_b)

    inside3d = np.asarray(inside_any).reshape(grid_blocks)
    cand = inside3d.copy()
    # cand[b] |= inside[b + (dx,dy,dz)] for the 7 forward neighbors: a cube
    # based in block b reads corners from b and its +1 neighbors only.
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                if dx or dy or dz:
                    src = inside3d[dx:, dy:, dz:]
                    cand[:src.shape[0], :src.shape[1], :src.shape[2]] |= src

    cand_ids = np.flatnonzero(cand.reshape(-1)).astype(np.int32)
    if cand_ids.size == 0:
        return np.zeros((0,), np.int64)

    # Power-of-two size class per candidate count (one compile per class);
    # padding repeats block 0, masked out by valid_count inside the kernel.
    size_c = 1 << max(6, int(np.ceil(np.log2(len(cand_ids)))))
    ids_pad = np.zeros(size_c, np.int32)
    ids_pad[:len(cand_ids)] = cand_ids
    ids8, ok8 = _neighbor_block_rows(ids_pad, grid_blocks)
    valid_count = jnp.int32(len(cand_ids))

    packed = np.asarray(_active_mask_bits_for_blocks(
        code_b, jnp.asarray(ids8), jnp.asarray(ok8), valid_count,
        block_size=block_size))

    # Unpack the strided bit layout (element e lives at bit e // (N/8) of
    # byte e % (N/8)) and compact on host — cheap numpy passes over N bools.
    bv = bx * by * bz
    n_over_8 = len(packed)
    hits = np.flatnonzero(np.unpackbits(packed, bitorder="little"))
    if len(hits) == 0:
        return np.zeros((0,), np.int64)
    flat = (hits % 8) * n_over_8 + hits // 8   # candidate-cube flat index

    blk = cand_ids[flat // bv].astype(np.int64)
    loc = flat % bv
    # block coords + STATE-layout local offsets (y minor, x stride by,
    # z stride bx*by — the order _cube_active_rows emits) -> global coords.
    gx = (blk // (nby * nbz)) * bx + (loc // by) % bx
    gy = ((blk // nbz) % nby) * by + loc % by
    gz = (blk % nbz) * bz + loc // (bx * by)
    lin = (gx * (dims[1] - 1) + gy) * (dims[2] - 1) + gz

    # Sorted linear order keeps emission (and so face order) identical to
    # the dense-plane path — the blocked/dense bit-exactness contract.
    return np.sort(lin)


# ---------------------------------------------------------------------------
# Pass 2: triangle emission for active cubes (chunked gather + table lookup).
# ---------------------------------------------------------------------------

@jax.jit
def _pack_rgb(r, g, b):
    return r | (g << 8) | (b << 16)


# Lane-flat static index maps. 36 lanes cover BOTH per-tet spaces:
# edge space  e = tet*6 + edge_slot   (6 tets x 6 edges)
# vert space  w = tet*6 + tri*3 + vert (6 tets x 2 tris x 3 verts)
# Keeping every per-cube tensor shaped (M, 36)/(M, 12)/(M, 8) is load-bearing:
# the earlier (M, 6, 2, 3, 3)-style intermediates tile-pad their tiny minor
# dims to (8, 128) — ~100x physical HBM — and XLA materialised them, making
# emission ~40 s per 32K-cube chunk. The flat layout runs the same math in
# well under a second per chunk.
_LANE_TET36 = np.repeat(np.arange(6), 6)                       # lane -> tet
_LANE_J36 = np.tile(np.arange(6), 6)                           # lane -> slot 0..5
_EDGE_A = TETS[_LANE_TET36, TET_EDGES[_LANE_J36, 0]]           # lane -> corner id
_EDGE_B = TETS[_LANE_TET36, TET_EDGES[_LANE_J36, 1]]
_TAB6_FLAT = TET_TRIANGLE_TABLE.reshape(16, 6).reshape(-1)     # (96,)
_SWAP36 = (np.arange(36) // 3) * 3 + np.array([0, 2, 1])[np.arange(36) % 3]
_TRI_OF_LANE36 = np.arange(36) // 3                            # vert lane -> tri 0..11
_TET_OF_TRI12 = np.arange(12) // 2                             # tri -> tet

# Per-lane edge direction codes: per-axis corner delta d in {-1, 0, +1}
# packed as (d+1) into 2-bit fields (x in bits [0:2], y [2:4], z [4:6]).
# FWD encodes A -> B, BWD encodes B -> A; the snap code 0b010101 (= 21)
# is the all-zero delta, unreachable by any real edge.
_EDGE_DELTA = (CORNER_OFFSETS[_EDGE_B] - CORNER_OFFSETS[_EDGE_A])  # (36, 3)


def _encode_edge_delta(d):
    return ((d[:, 0] + 1) | ((d[:, 1] + 1) << 2)
            | ((d[:, 2] + 1) << 4)).astype(np.uint32)


_CODE_FWD = _encode_edge_delta(_EDGE_DELTA)                    # (36,)
_CODE_BWD = _encode_edge_delta(-_EDGE_DELTA)
_CODE_SNAP = np.uint32(0b010101)

# Static per-tet SDF-gradient coefficients: tet edge vectors are cube-corner
# offsets, so the adjugate solve collapses to constant vectors.
_E1 = (CORNER_OFFSETS[TETS[:, 1]] - CORNER_OFFSETS[TETS[:, 0]]).astype(np.float64)
_E2 = (CORNER_OFFSETS[TETS[:, 2]] - CORNER_OFFSETS[TETS[:, 0]]).astype(np.float64)
_E3 = (CORNER_OFFSETS[TETS[:, 3]] - CORNER_OFFSETS[TETS[:, 0]]).astype(np.float64)
_C23 = np.cross(_E2, _E3)
_C31 = np.cross(_E3, _E1)
_C12 = np.cross(_E1, _E2)
_DET = np.einsum("ij,ij->i", _E1, _C23)
_GC1 = (_C23 / _DET[:, None]).astype(np.float32)               # (6, 3)
_GC2 = (_C31 / _DET[:, None]).astype(np.float32)
_GC3 = (_C12 / _DET[:, None]).astype(np.float32)


def _corner_lin(cube_idx, dims):
    """(M, 3) cube base indices -> (M, 8) global dense corner ids."""
    _, Y, Z = dims
    base = (cube_idx[:, 0] * Y + cube_idx[:, 1]) * Z + cube_idx[:, 2]    # (M,)
    off_lin = jnp.asarray(
        (CORNER_OFFSETS[:, 0] * Y + CORNER_OFFSETS[:, 1]) * Z
        + CORNER_OFFSETS[:, 2], jnp.int32)
    return base[:, None] + off_lin[None, :]                              # (M, 8)


@partial(jax.jit, static_argnames=("dims", "capacity"))
def _emit_triangles_compact(tsdf_flat, packed_color_flat, cube_idx, valid_count, *,
                            dims, capacity: int):
    """Triangle emission from DENSE flat tsdf/colour arrays (see _emit_core)."""
    corner_lin = _corner_lin(cube_idx, dims)
    # f32 like the blocked twin: a bf16 tsdf fed through the fraction/snap
    # math would collapse fractions to ~256 levels and misfire the 1e-5
    # snap epsilon (below bf16 resolution near 1.0).
    s8 = jnp.take(tsdf_flat, corner_lin).astype(jnp.float32)             # (M, 8)
    packed8 = jnp.take(packed_color_flat, corner_lin)                    # (M, 8)
    return _emit_core(s8, packed8, corner_lin, cube_idx, valid_count, capacity)


@partial(jax.jit, static_argnames=("dims", "grid_blocks", "block_size",
                                   "capacity"))
def _emit_triangles_blocked(tsdf_b_flat, color_b_flat, cube_idx, valid_count, *,
                            dims, grid_blocks, block_size, capacity: int):
    """Triangle emission gathering corners straight from the BLOCK-MAJOR
    sparse state — no dense tsdf/colour assembly (which cost more than the
    whole emission pass at 76M voxels: the (nb, BV) -> (X, Y, Z) transpose
    is a layout change XLA executes far below HBM bandwidth).

    ``tsdf_b_flat`` is state.tsdf.reshape(-1); ``color_b_flat`` is
    state.color.reshape(-1) with per-block R|G|B channel segments
    (hive_tpu.ops.tsdf_sparse storage layout).
    """
    bx, by, bz = block_size
    bv = bx * by * bz

    xyz = cube_idx[:, :, None] + jnp.asarray(CORNER_OFFSETS.T)[None]     # (M,3,8)
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]                            # (M,8)

    block, off = _state_voxel_address(x, y, z, grid_blocks=grid_blocks,
                                      block_size=block_size)

    s8 = jnp.take(tsdf_b_flat, block * bv + off).astype(jnp.float32)

    packed8 = jnp.uint32(0)
    for ch, shift in enumerate((0, 8, 16)):
        c = jnp.take(color_b_flat, (block * 3 + ch) * bv + off)
        c = jnp.clip(jnp.round(c.astype(jnp.float32)), 0, 255).astype(jnp.uint32)
        packed8 = packed8 | (c << shift)

    return _emit_core(s8, packed8, _corner_lin(cube_idx, dims), cube_idx,
                      valid_count, capacity)


def _emit_core(s8, packed8, corner_lin, cube_idx, valid_count, capacity: int):
    """Emit + compact triangles for (M, 3) active cube indices, lane-flat.

    Inputs are the per-cube corner values: s8 (M, 8) signed distances,
    packed8 (M, 8) uint32 colours, corner_lin (M, 8) global corner ids (the
    weld keys). Returns a (3, 3*capacity) uint32 lane matrix — per vertex:

    * lane 0: key lo (global corner id of the canonical lower edge endpoint)
    * lane 1: colour r|g<<8|b<<16 | edge code << 24 (per-axis 2-bit signed
      deltas lo -> hi, (d+1) in bits [0:2]/[2:4]/[4:6]; code 0b010101 =
      all-zero delta marks a vertex snapped onto the lo grid corner)
    * lane 2: edge fraction quantised to 16 bits (lo -> hi) | oct-encoded
      normal (8+8 snorm) << 16

    plus the valid triangle count. Vertex POSITIONS never cross the device
    link: the host reconstructs them from (key lo, edge code, fraction) for
    welded-unique vertices only — 12 bytes/vertex instead of the 28 a
    positions+attributes transfer would pay (fraction quantisation error is
    <= 0.5/65535 voxel, nanometres at real voxel sizes). Entries beyond
    3*count are garbage.
    """
    M = cube_idx.shape[0]
    f32 = jnp.float32

    sa = s8[:, _EDGE_A]                                                  # (M, 36)
    sb = s8[:, _EDGE_B]
    la = corner_lin[:, _EDGE_A]
    lb = corner_lin[:, _EDGE_B]

    denom = sa - sb
    frac = sa / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)          # t: a -> b
    frac = jnp.clip(frac, 0.0, 1.0)

    # Snap crossings that land (within eps) on a grid corner onto it exactly,
    # and canonicalise their weld key to (corner, corner). When the surface
    # passes exactly through a lattice point (common for axis-aligned depth),
    # every tet edge incident to that point emits the same position under a
    # DIFFERENT (lo, hi) edge key — without snapping, those coincident
    # vertices never weld and up to 75% of emitted faces are zero-area
    # (measured on a grid-aligned wall), which also froze QEM decimation.
    snap_a = frac <= 1e-5
    snap_b = frac >= 1.0 - 1e-5
    frac = jnp.where(snap_a, 0.0, jnp.where(snap_b, 1.0, frac))

    def lerp_pos(axis):
        a = jnp.asarray(CORNER_OFFSETS[_EDGE_A, axis].astype(np.float32))
        b = jnp.asarray(CORNER_OFFSETS[_EDGE_B, axis].astype(np.float32))
        return (cube_idx[:, axis, None].astype(f32)
                + a[None, :] + frac * (b - a)[None, :])

    # Positions are only needed on device for triangle orientation (the
    # gradient dot below); the host rebuilds them from the weld key + frac.
    px, py, pz = lerp_pos(0), lerp_pos(1), lerp_pos(2)                   # (M, 36)

    def chan(p, shift):
        return ((p >> shift) & 0xFF).astype(f32)

    col36 = jnp.uint32(0)
    for shift in (0, 8, 16):
        ca = chan(packed8, shift)[:, _EDGE_A]
        cb = chan(packed8, shift)[:, _EDGE_B]
        c = jnp.clip(jnp.round(ca + frac * (cb - ca)), 0, 255).astype(jnp.uint32)
        col36 = col36 | (c << shift)                                     # (M, 36)

    kmin = jnp.minimum(la, lb)
    klo = jnp.where(snap_a, la, jnp.where(snap_b, lb, kmin))
    fwd = klo == la

    # 6-bit edge direction code: (klo, code) is the weld key AND determines
    # the hi endpoint (khi = klo + decoded per-axis delta), so khi never
    # needs its own lane. Snapped vertices get the all-zero-delta code.
    code36 = jnp.where(snap_a | snap_b, _CODE_SNAP,
                       jnp.where(fwd, jnp.asarray(_CODE_FWD)[None, :],
                                 jnp.asarray(_CODE_BWD)[None, :]))

    # Edge fraction re-measured along the canonical (klo -> khi) direction
    # so the host can lerp corner(klo) -> corner(khi). Snapped vertices
    # decode to corner(klo) for any fraction (zero delta), and frac_c is 0
    # for them anyway (snap_a: frac = 0; snap_b: klo = lb so 1 - frac = 0).
    frac_c = jnp.where(fwd, frac, 1.0 - frac)

    # Sign case per tet -> per-vertex edge slot via the flat triangle table.
    inside8 = (s8 < 0.0).astype(jnp.int32)
    case = (inside8[:, TETS[:, 0]] | (inside8[:, TETS[:, 1]] << 1)
            | (inside8[:, TETS[:, 2]] << 2) | (inside8[:, TETS[:, 3]] << 3))  # (M, 6)
    case_l = case[:, _LANE_TET36]                                        # (M, 36)
    vert_sel = jnp.take(jnp.asarray(_TAB6_FLAT),
                        case_l * 6 + jnp.asarray(_LANE_J36)[None, :])    # (M, 36)
    valid36 = vert_sel >= 0
    eidx = jnp.asarray(_LANE_TET36)[None, :] * 6 + jnp.maximum(vert_sel, 0)

    def sel(a):
        return jnp.take_along_axis(a, eidx, axis=1)

    v_px, v_py, v_pz = sel(px), sel(py), sel(pz)                         # (M, 36)
    v_col = sel(col36)
    v_klo = sel(klo)
    v_code = sel(code36)
    v_frac = sel(frac_c)

    # Orientation: flip triangles whose normal opposes the per-tet SDF
    # gradient (static adjugate coefficients — inside is negative).
    ds1 = s8[:, TETS[:, 1]] - s8[:, TETS[:, 0]]                          # (M, 6)
    ds2 = s8[:, TETS[:, 2]] - s8[:, TETS[:, 0]]
    ds3 = s8[:, TETS[:, 3]] - s8[:, TETS[:, 0]]

    def grad(axis):
        return (ds1 * _GC1[None, :, axis] + ds2 * _GC2[None, :, axis]
                + ds3 * _GC3[None, :, axis])

    gx, gy, gz = grad(0), grad(1), grad(2)                               # (M, 6)

    p0x, p1x, p2x = v_px[:, 0::3], v_px[:, 1::3], v_px[:, 2::3]          # (M, 12)
    p0y, p1y, p2y = v_py[:, 0::3], v_py[:, 1::3], v_py[:, 2::3]
    p0z, p1z, p2z = v_pz[:, 0::3], v_pz[:, 1::3], v_pz[:, 2::3]
    e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
    e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x

    gxt = gx[:, _TET_OF_TRI12]                                           # (M, 12)
    gyt = gy[:, _TET_OF_TRI12]
    gzt = gz[:, _TET_OF_TRI12]
    flip = (nx * gxt + ny * gyt + nz * gzt) < 0.0                        # (M, 12)
    flip36 = flip[:, _TRI_OF_LANE36]                                     # (M, 36)

    def unflip(a):
        return jnp.where(flip36, a[:, _SWAP36], a)

    # (Positions are NOT unflipped/emitted: they were only needed above, in
    # their pre-flip slot order, for the orientation dot product.)
    v_col = unflip(v_col)
    v_klo = unflip(v_klo)
    v_code = unflip(v_code)
    v_frac = unflip(v_frac)

    # Per-vertex surface normal: within one tet the SDF is linear, so the
    # isosurface patch is planar and its (outward) normal IS the tet
    # gradient — already computed above for orientation. Oct-encoded
    # snorm16x2 into one u32 lane; the host weld averages all incident-tet
    # normals per welded vertex, replacing a multi-second host
    # face-normal pass. (No unflip: the vertex swap stays within one
    # triangle, hence within one tet — the lane values are equal.)
    gxl, gyl, gzl = (g[:, _LANE_TET36] for g in (gx, gy, gz))
    inv_len = jax.lax.rsqrt(gxl * gxl + gyl * gyl + gzl * gzl + 1e-20)
    nxl, nyl, nzl = gxl * inv_len, gyl * inv_len, gzl * inv_len

    l1 = jnp.maximum(jnp.abs(nxl) + jnp.abs(nyl) + jnp.abs(nzl), 1e-12)
    ox, oy = nxl / l1, nyl / l1
    fold_x = (1.0 - jnp.abs(oy)) * jnp.where(ox >= 0, 1.0, -1.0)
    fold_y = (1.0 - jnp.abs(ox)) * jnp.where(oy >= 0, 1.0, -1.0)
    ox = jnp.where(nzl < 0, fold_x, ox)
    oy = jnp.where(nzl < 0, fold_y, oy)
    # 8+8 snorm oct: worst-case ~1 degree error, invisible after the host
    # averages every incident tet's normal per welded vertex — and it frees
    # 16 bits of the lane for the quantised edge fraction.
    ex = jnp.clip(jnp.round((ox + 1.0) * 127.5), 0, 255).astype(jnp.uint32)
    ey = jnp.clip(jnp.round((oy + 1.0) * 127.5), 0, 255).astype(jnp.uint32)
    v_nrm = ex | (ey << 8)

    # Compact valid triangles; padded cube slots carry none. Degenerate
    # triangles — two vertices sharing one weld key (klo, code), the host
    # weld's exact identity — are dropped HERE rather than by the host's
    # post-weld face filter: on grid-aligned surfaces, corner snapping makes
    # up to ~75% of emissions degenerate (measured), and shipping them only
    # to discard them dominated extraction behind the slow device link.
    # Behavior note: dropped lanes no longer contribute their tet gradients
    # to the per-welded-vertex normal average (only tets that produce real
    # area now vote — zero-area emissions' gradients previously did too).
    k0, k1, k2 = v_klo[:, 0::3], v_klo[:, 1::3], v_klo[:, 2::3]          # (M, 12)
    c0, c1, c2 = v_code[:, 0::3], v_code[:, 1::3], v_code[:, 2::3]
    dup = (((k0 == k1) & (c0 == c1)) | ((k1 == k2) & (c1 == c2))
           | ((k0 == k2) & (c0 == c2)))
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0) < valid_count
    tri_valid = valid36[:, 0::3] & slot_ok & ~dup                        # (M, 12)

    flat_valid = tri_valid.reshape(-1)
    count = jnp.sum(flat_valid)
    # Compaction strategy shares the integrator's HIVE_TSDF_COMPACT knob
    # (default sort — the width sweep in scripts/micro_compaction.py shows
    # sort winning at every width up to 1M, increasingly so; an early
    # extraction A/B that read the other way did not reproduce).
    # nonzero's fill here is 0, not n, so remap the sort filler; fill slots
    # land at the tail either way — identical output.
    from hive_tpu.ops.tsdf_sparse import compact_ids
    nfv = flat_valid.shape[0]
    idx_tri = compact_ids(flat_valid, capacity, nfv)                     # (cap,)
    idx_tri = jnp.where(idx_tri == nfv, 0, idx_tri)

    # Vertex flat index: lane w = tri*3 + vert within a row of 36, so the
    # (M, 36) row-major flattening IS the per-vertex order of (M, 12) tris.
    rep = jnp.arange(3 * capacity, dtype=jnp.int32)
    idxv = jnp.take(idx_tri, rep // 3) * 3 + rep % 3                     # (3cap,)

    def gather_flat(a):
        return jnp.take(a.reshape(-1), idxv)

    # Pack the three per-vertex lanes into ONE uint32 matrix (int32 weld key
    # bitcast) so each chunk pays a single device->host transfer — behind
    # the high-latency device link the extra per-array dispatches dominated
    # multi-chunk extractions, and the lane packing above (vs the earlier
    # 5-lane frac/col/klo/khi/nrm layout) cuts the transferred bytes 40%.
    fq = jnp.clip(jnp.round(v_frac * 65535.0), 0, 65535).astype(jnp.uint32)
    packed_lanes = jnp.stack([
        jax.lax.bitcast_convert_type(gather_flat(v_klo), jnp.uint32),
        gather_flat(v_col | (v_code << 24)),
        gather_flat(fq | (v_nrm << 16)),
    ])
    return packed_lanes, count


def _empty_mesh() -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """The (vertices, faces, colors, normals) tuple of an empty extraction."""
    return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
            np.zeros((0, 3), np.uint8), np.zeros((0, 3), np.float32))


def decode_active_coords(lin: np.ndarray, dims) -> np.ndarray:
    """Linear cube ids (over the (X-1, Y-1, Z-1) cube grid) -> (A, 3) int32
    coords. One definition — the dense, blocked, and sharded extraction
    paths must decode identically for their bit-equality contracts."""
    cy, cz = (dims[1] - 1), (dims[2] - 1)
    return np.stack([lin // (cy * cz), (lin // cz) % cy, lin % cz],
                    axis=-1).astype(np.int32)


def extract_isosurface(
        tsdf, weight, color, origin, voxel_size: float, chunk_size: int = 1 << 15,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Extract the zero level set of a TSDF volume.

    :param tsdf: (X, Y, Z) signed distances (device or host array).
    :param weight: (X, Y, Z) observation weights (0 = never observed).
    :param color: RGB values, either channel planes (3, X, Y, Z) — the
        TPU-friendly layout, a trailing dim of 3 tile-pads 42x — or
        channel-last (X, Y, Z, 3) for host-side convenience.
    :param origin: (3,) world position of voxel (0, 0, 0).
    :param voxel_size: edge length of a voxel in meters.
    :param chunk_size: active cubes processed per device dispatch.
    :return: (vertices (V, 3) f32 world coords, faces (F, 3) int64,
        vertex colors (V, 3) uint8, vertex normals (V, 3) f32 — averaged
        incident-tet SDF gradients, unit length).
    """
    tsdf = jnp.asarray(tsdf)
    weight = jnp.asarray(weight)
    color = jnp.asarray(color)
    dims = tuple(tsdf.shape)

    # Compact active-cube indices on device: only (A,) int32 linear indices
    # cross to the host, not the (X, Y, Z) bool mask — which is 1 byte/voxel
    # and dominates extraction wall-clock behind a slow device link.
    mask_flat = _active_cubes_mask(tsdf, weight).reshape(-1)
    num_active = int(jnp.sum(mask_flat))

    if num_active == 0:
        return _empty_mesh()

    lin = _active_indices(mask_flat, num_active)
    active = decode_active_coords(lin, dims)

    tsdf_flat = tsdf.reshape(-1)

    if color.shape == (*dims, 3):
        r, g, b = (color[..., ch].reshape(-1) for ch in range(3))
    else:
        r, g, b = (color[ch].reshape(-1) for ch in range(3))

    to_u32 = lambda c: jnp.clip(jnp.round(c), 0, 255).astype(jnp.uint32)
    color_flat = _pack_rgb(to_u32(r), to_u32(g), to_u32(b))

    def emit(chunk, valid_count, capacity):
        return _emit_triangles_compact(tsdf_flat, color_flat, chunk,
                                       valid_count, dims=dims,
                                       capacity=capacity)

    return _chunked_extract_and_weld(active, emit, dims, origin, voxel_size,
                                     chunk_size)


def _active_indices(mask_flat, num_active: int) -> np.ndarray:
    """Compacted active-cube linear indices (host int array).

    ``jnp.nonzero``'s output size is part of the compiled program, so sizing
    it to the exact active count would recompile on EVERY extraction (each
    scene has a different count) and defeat the persistent compilation
    cache. Pad the size up to a power-of-two class instead — one compile per
    size class, fills trimmed on host (nonzero places fill values at the
    end).
    """
    from hive_tpu.ops.tsdf_sparse import compact_ids

    size = 1 << max(12, int(np.ceil(np.log2(num_active))))
    n = int(mask_flat.shape[0])
    size = min(size, n)
    # Sort-based compaction (shared HIVE_TSDF_COMPACT knob): nonzero's
    # serialized scatter scales linearly (11 ms at 1M-wide masks vs 2.7 for
    # the sort — scripts/micro_compaction.py widths sweep) and dense volumes
    # are many millions wide. Only the first num_active entries are read,
    # so the filler value never escapes.
    lin = np.asarray(compact_ids(mask_flat, size, n))
    return lin[:num_active]


EMISSION_LANES = ("klo", "colcode", "fracnrm")


def check_blocked_colour_addressing(num_voxels: int) -> None:
    """Refuse volumes past the blocked colour gather's int32 limit.

    _emit_triangles_blocked addresses colour as (block*3+ch)*BV+off in
    int32 (int64 indexing needs jax_enable_x64, which this framework pins
    off): past 2^31/3 voxels the index wraps negative and jnp.take's
    clamping would SILENTLY paint block 0's colours everywhere. Shared by
    the single-device and sharded extraction entry points.
    """
    if 3 * num_voxels >= 2 ** 31:
        raise NotImplementedError(
            f"blocked extraction addresses colour as (block*3+ch)*BV+off in "
            f"int32; {num_voxels:,d} voxels overflows it (limit ~715M)")


def transfer_width(nv: int, width: int) -> int:
    """Lane-transfer width class: nv rounded up to a 4096 multiple, capped.

    The slice-for-transfer is a tiny compiled program per DISTINCT width —
    classes bound the compile count; the <=4095 extra elements per lane are
    noise next to the per-transfer latency behind the device link.
    """
    return min(width, -(-nv // 4096) * 4096)


def append_trimmed_lanes(parts: dict, lane_rows, nv: int) -> None:
    """Append one emission's (3, >=nv) lane rows to the collect dict,
    trimmed to the nv valid elements. ONE definition of the lane order and
    the klo int32 reinterpretation — the single-device and sharded collect
    loops must decode the _emit_core layout identically for the
    bit-equality contract."""
    for name, row in zip(EMISSION_LANES, lane_rows[:, :nv]):
        if name == "klo":
            row = row.view(np.int32)
        parts[name].append(row)


def _chunked_extract_and_weld(active, emit, dims, origin, voxel_size: float,
                              chunk_size: int):
    import os
    import time
    stats = os.environ.get("HIVE_EXTRACT_STATS") == "1"
    t_start = time.perf_counter()

    parts = {name: [] for name in EMISSION_LANES}

    def dispatch(start):
        chunk = active[start:start + chunk_size]
        valid_count = len(chunk)
        # Pad to a size class so dispatches reuse compiled programs: full
        # chunks (and the final short chunk of a multi-chunk extraction)
        # share the one chunk_size program; a single-chunk extraction pads
        # to a power-of-two class (floor 4096) instead of compiling a
        # fresh program per distinct scene count — same discipline as
        # _active_indices, bounding compiles at <=2x compaction padding.
        if len(chunk) < chunk_size:
            if len(active) > chunk_size:
                target = chunk_size
            else:
                target = min(chunk_size,
                             1 << max(12, int(np.ceil(np.log2(
                                 max(len(chunk), 1))))))
            if len(chunk) < target:
                chunk = np.concatenate(
                    [chunk, np.zeros((target - len(chunk), 3), np.int32)])

        # Marching tetrahedra emits at most 12 triangles per cube (6 tets x
        # 2), so this capacity can never overflow. (Sizing for an "average"
        # density instead was a measured trap: dense surface bands hit ~6
        # triangles/cube, and an overflow fallback that re-transfers the
        # chunk uncompacted turned a 3 s extraction into 10 s behind a slow
        # device link.) Sized from the actual (possibly final-short) chunk so
        # small extractions don't pay full-chunk compaction gathers.
        capacity = len(chunk) * 12

        return emit(jnp.asarray(chunk), jnp.int32(valid_count), capacity)

    # Software pipeline: dispatch chunks ahead of the collect point so the
    # host-side transfers of one chunk overlap the device compute of the
    # next (behind a high-latency device link the serialized collect
    # dominated multi-chunk extractions). Depth 2 (one chunk in flight
    # beyond the collect) is the measured default; HIVE_EXTRACT_PIPELINE
    # sets a deeper queue for A/B — each extra slot costs one chunk's
    # device output buffers but hides one more dispatch round-trip.
    depth = max(2, int(os.environ.get("HIVE_EXTRACT_PIPELINE", "2")))
    starts = list(range(0, len(active), chunk_size))
    queue = [dispatch(s) for s in starts[:depth - 1]]
    next_dispatch = depth - 1

    for i in range(len(starts)):
        if next_dispatch < len(starts):
            queue.append(dispatch(starts[next_dispatch]))
            next_dispatch += 1

        packed_lanes, count = queue.pop(0)
        nv = 3 * int(count)

        # ONE transfer per chunk, at a bounded width class (see
        # transfer_width).
        nv_t = transfer_width(nv, packed_lanes.shape[1])
        append_trimmed_lanes(parts, np.asarray(packed_lanes[:, :nv_t]), nv)

    t_collect = time.perf_counter()
    if stats:
        print(f"[extract] chunks={len(starts)} "
              f"dispatch+collect {t_collect - t_start:.2f}s", flush=True)

    flat = {name: np.concatenate(chunks) for name, chunks in parts.items()}
    return weld_and_assemble(flat, dims, origin, voxel_size)


def weld_and_assemble(flat, dims, origin, voxel_size: float):
    """Host-side weld + mesh assembly over the collected emission lanes.

    ``flat`` maps lane names (``klo``/``colcode``/``fracnrm`` — see
    ``_emit_core`` for the per-vertex encoding) to 1-D host arrays holding
    the full emitted vertex stream. The stream order does not matter for
    correctness, but an order-preserving chunk/shard partition makes the
    output byte-identical across partitions (compaction keeps relative
    order), which is the bit-equality contract the sharded extraction path
    (hive_tpu.parallel.fusion.get_mesh_sharded) relies on.

    :return: (vertices (V, 3) f32 world coords, faces (F, 3) int64,
        vertex colors (V, 3) uint8, vertex normals (V, 3) f32).
    """
    import os
    import time
    stats = os.environ.get("HIVE_EXTRACT_STATS") == "1"
    t_collect = time.perf_counter()

    # Weld + assembly, all-native fast path: one C++ call fuses the key
    # build, radix-sort weld, unique-vertex position/colour decode,
    # oct-normal averaging and degenerate-face compaction — the equivalent
    # numpy pipeline below makes ~10 full passes over the emitted arrays
    # (which reach hundreds of MB at production volume sizes) and measured
    # ~27 s of an 87 s extraction at 35M emitted vertices on this host.
    from hive_tpu.native import extract_assemble, weld_unique

    native = extract_assemble(flat["klo"], flat["colcode"], flat["fracnrm"],
                              dims, voxel_size, np.asarray(origin, np.float64))
    if native is not None:
        vertices, faces, colors, normals = native
        if stats:
            t_end = time.perf_counter()
            print(f"[extract] emitted={len(flat['klo'])} "
                  f"unique={len(vertices)} faces={len(faces)} | "
                  f"weld+assemble(native) {t_end - t_collect:.2f}s",
                  flush=True)
        return vertices, faces, colors, normals

    # Numpy fallback (no native toolchain). Weld: each vertex is uniquely
    # identified by (lo corner id, 6-bit edge direction code) — the code
    # fully determines the hi endpoint, and the snap code (all-zero delta,
    # vertices ON a grid corner) can't collide with any real edge.

    code_all = flat["colcode"] >> 24
    keys = (flat["klo"].astype(np.uint64) << np.uint64(6)) | code_all
    first_idx, inverse = weld_unique(keys)

    t_weld = time.perf_counter()

    packed = flat["colcode"][first_idx]
    colors = np.stack([packed & 0xFF, (packed >> 8) & 0xFF,
                       (packed >> 16) & 0xFF], axis=-1).astype(np.uint8)

    # Rebuild positions for the UNIQUE vertices only: decode the lo corner
    # from its global id, the hi endpoint from the edge code's per-axis
    # deltas, and lerp by the dequantised (canonical lo -> hi) fraction.
    # Deltas are exact small integers, so this f32 lerp reproduces the
    # device's vertex positions to the fraction's 16-bit quantisation
    # (<= 0.5/65535 voxel — nanometres at real voxel sizes).
    klo_u = flat["klo"][first_idx].astype(np.int64)
    code_u = packed >> 24
    frac_u = ((flat["fracnrm"][first_idx] & 0xFFFF).astype(np.float32)
              * np.float32(1.0 / 65535.0))
    YZ = dims[1] * dims[2]
    pos = np.empty((len(first_idx), 3), np.float32)
    for axis, lo in enumerate((klo_u // YZ, (klo_u // dims[2]) % dims[1],
                               klo_u % dims[2])):
        delta = ((code_u >> (2 * axis)) & 3).astype(np.float32) - 1.0
        pos[:, axis] = lo.astype(np.float32) + frac_u * delta

    vertices = (pos * voxel_size + np.asarray(origin)).astype(np.float32)
    faces = inverse.reshape(-1, 3).astype(np.int64)

    # Expand the 8+8 oct normals to the snorm16x2 layout the averaging
    # kernel expects: x * 257 maps 0..255 onto 0..65535 exactly (and
    # linearly), so the decode is bit-equivalent to an 8-bit dequantise.
    p8 = flat["fracnrm"] >> 16
    nrm16 = ((p8 & 0xFF) * np.uint32(257)) | (((p8 >> 8) * np.uint32(257)) << 16)
    normals = _decode_oct_average(nrm16, inverse, len(first_idx))

    # Drop degenerate faces (duplicate welded vertices).
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    faces = faces[ok]

    if stats:
        t_end = time.perf_counter()
        print(f"[extract] emitted={len(keys)} "
              f"unique={len(first_idx)} faces={len(faces)} | "
              f"concat+weld {t_weld - t_collect:.2f}s  "
              f"assembly+normals {t_end - t_weld:.2f}s", flush=True)

    return vertices, faces, colors, normals


def _decode_oct_average(packed, inverse, num_unique: int) -> np.ndarray:
    """Decode per-emitted-vertex oct normals and average them per welded
    vertex (every incident tet contributes its gradient — smoother than
    area-weighted face normals, and ~10x cheaper than the host face-normal
    pass it replaces). Native single-pass decode+accumulate when available
    (the numpy path below makes ~10 full passes over the emitted arrays)."""
    from hive_tpu.native import oct_average

    native = oct_average(packed, inverse, num_unique)
    if native is not None:
        return native

    ux = (packed & 0xFFFF).astype(np.float32) * (2.0 / 65535.0) - 1.0
    uy = ((packed >> 16) & 0xFFFF).astype(np.float32) * (2.0 / 65535.0) - 1.0

    nz = 1.0 - np.abs(ux) - np.abs(uy)
    neg = nz < 0.0
    fold_x = (1.0 - np.abs(uy)) * np.where(ux >= 0.0, 1.0, -1.0)
    fold_y = (1.0 - np.abs(ux)) * np.where(uy >= 0.0, 1.0, -1.0)
    nx = np.where(neg, fold_x, ux).astype(np.float32)
    ny = np.where(neg, fold_y, uy).astype(np.float32)

    acc = np.empty((num_unique, 3), np.float32)
    for c, comp in enumerate((nx, ny, nz)):
        acc[:, c] = np.bincount(inverse, weights=comp, minlength=num_unique)

    length = np.sqrt(np.einsum("ij,ij->i", acc, acc))
    acc /= np.where(length < 1e-12, 1.0, length)[:, None]
    return acc


def extract_isosurface_blocked(tsdf_b, weight_b, color_b, *, grid_blocks,
                               block_size, origin, voxel_size: float,
                               chunk_size: int = 1 << 15):
    """Extract the zero level set straight from block-major sparse state.

    Skips the dense volume assembly entirely (measured 5.8 s of a 17 s
    extraction at 76M voxels): the active-cube mask builds from ONE
    NaN-encoded dense plane, and triangle emission gathers its cube corners
    from the blocked arrays (hive_tpu.ops.tsdf_sparse layout: tsdf/weight
    (nb, BV), colour (nb, 3*BV) channel segments, canonical x-major block
    order — un-permute block-cyclic state first).

    :return: (vertices (V, 3) f32 world coords, faces (F, 3) int64,
        vertex colors (V, 3) uint8, vertex normals (V, 3) f32).
    """
    import os
    import time
    stats = os.environ.get("HIVE_EXTRACT_STATS") == "1"
    t0 = time.perf_counter()

    grid_blocks = tuple(int(g) for g in grid_blocks)
    block_size = tuple(int(b) for b in block_size)
    dims = tuple(g * b for g, b in zip(grid_blocks, block_size))

    # The blocked colour gather addresses (block * 3 + ch) * BV + off in
    # int32 (int64 indexing needs jax_enable_x64, which this framework
    # pins off): past 2^31 / 3 voxels the index wraps negative and
    # jnp.take's clamping would SILENTLY paint block 0's colours
    # everywhere. Refuse loudly instead — a >715M-voxel volume also
    # implies a >=7 GiB state, beyond the production voxel budget.
    num_voxels = int(np.prod([g * b for g, b in zip(grid_blocks, block_size)]))
    if 3 * num_voxels >= 2 ** 31:
        raise NotImplementedError(
            f"blocked extraction addresses colour as (block*3+ch)*BV+off in "
            f"int32; {num_voxels:,d} voxels overflows it (limit ~715M)")

    lin = _active_cubes_blocked_sparse(tsdf_b, weight_b,
                                       grid_blocks=grid_blocks,
                                       block_size=block_size)

    if len(lin) == 0:
        return _empty_mesh()

    active = decode_active_coords(lin, dims)
    if stats:
        print(f"[extract] candidates+actives {time.perf_counter() - t0:.2f}s "
              f"n_active={len(lin)}", flush=True)

    tsdf_b_flat = tsdf_b.reshape(-1)
    color_b_flat = color_b.reshape(-1)

    def emit(chunk, valid_count, capacity):
        return _emit_triangles_blocked(tsdf_b_flat, color_b_flat, chunk,
                                       valid_count, dims=dims,
                                       grid_blocks=grid_blocks,
                                       block_size=block_size,
                                       capacity=capacity)

    return _chunked_extract_and_weld(active, emit, dims, origin, voxel_size,
                                     chunk_size)
