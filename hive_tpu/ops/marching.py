"""Isosurface extraction from a TSDF volume: marching tetrahedra on TPU.

The reference used skimage's (CPU) marching cubes via the tsdf-fusion
submodule's ``get_mesh`` (hive/fusion.py:127). This module re-designs
extraction for TPU with a two-pass, table-free algorithm:

1. **Active-cube pass (device)** — a fused elementwise kernel flags cubes whose
   8 corners are all observed and straddle the zero level set. Only the small
   boolean mask crosses to the host (typically <1% of cubes are active).
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

@jax.jit
def _active_cubes_mask(tsdf: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """(X-1, Y-1, Z-1) bool: cube has all corners observed and a sign change."""
    observed = weight > 0.0
    inside = tsdf < 0.0

    def corners(a):
        return [a[x:a.shape[0] - 1 + x, y:a.shape[1] - 1 + y, z:a.shape[2] - 1 + z]
                for x, y, z in CORNER_OFFSETS]

    obs = corners(observed)
    all_observed = obs[0]
    for o in obs[1:]:
        all_observed = all_observed & o

    ins = corners(inside)
    any_inside = ins[0]
    all_inside = ins[0]
    for i in ins[1:]:
        any_inside = any_inside | i
        all_inside = all_inside & i

    return all_observed & any_inside & (~all_inside)


# ---------------------------------------------------------------------------
# Pass 2: triangle emission for active cubes (chunked gather + table lookup).
# ---------------------------------------------------------------------------

@jax.jit
def _pack_rgb(r, g, b):
    return r | (g << 8) | (b << 16)


@partial(jax.jit, static_argnames=("dims",))
def _emit_triangles(tsdf_flat: jnp.ndarray, packed_color_flat: jnp.ndarray,
                    cube_idx: jnp.ndarray, *, dims):
    """For (M, 3) active cube indices, emit candidate triangles.

    ``packed_color_flat`` is (N,) uint32 ``r | g<<8 | b<<16`` — one gather per
    corner instead of a row gather from a tile-padded (N, 3) array.

    Returns per (cube, tet, tri):
      positions (M, 6, 2, 3, 3) in voxel units,
      edge keys (M, 6, 2, 3, 2) int32 global corner ids,
      colors    (M, 6, 2, 3, 3) float32,
      valid     (M, 6, 2) bool.
    """
    X, Y, Z = dims
    M = cube_idx.shape[0]

    corner_off = jnp.asarray(CORNER_OFFSETS)                 # (8, 3)
    corners = cube_idx[:, None, :] + corner_off[None, :, :]  # (M, 8, 3)
    corner_lin = (corners[..., 0] * Y + corners[..., 1]) * Z + corners[..., 2]  # (M, 8)

    s = jnp.take(tsdf_flat, corner_lin)                      # (M, 8)
    packed = jnp.take(packed_color_flat, corner_lin)         # (M, 8)
    col = jnp.stack([(packed & 0xFF).astype(jnp.float32),
                     ((packed >> 8) & 0xFF).astype(jnp.float32),
                     ((packed >> 16) & 0xFF).astype(jnp.float32)], axis=-1)

    tets = jnp.asarray(TETS)                                 # (6, 4)
    tet_s = s[:, tets]                                       # (M, 6, 4)
    tet_lin = corner_lin[:, tets]                            # (M, 6, 4)
    tet_col = col[:, tets]                                   # (M, 6, 4, 3)
    tet_pos = corners[:, tets].astype(jnp.float32)           # (M, 6, 4, 3)

    inside = (tet_s < 0.0).astype(jnp.int32)
    case = (inside[..., 0] | (inside[..., 1] << 1)
            | (inside[..., 2] << 2) | (inside[..., 3] << 3))  # (M, 6)

    # Zero-crossing vertex on each of the 6 tet edges.
    edges = jnp.asarray(TET_EDGES)                            # (6, 2)
    sa = jnp.take_along_axis(tet_s, jnp.broadcast_to(edges[None, None, :, 0], (M, 6, 6)),
                             axis=-1)                         # (M, 6 tets, 6 edges)
    sb = jnp.take_along_axis(tet_s, jnp.broadcast_to(edges[None, None, :, 1], (M, 6, 6)),
                             axis=-1)
    denom = sa - sb
    frac = sa / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)  # t along a→b
    frac = jnp.clip(frac, 0.0, 1.0)[..., None]                   # (M, 6, 6, 1)

    pa = tet_pos[:, :, edges[:, 0]]                              # (M, 6, 6, 3)
    pb = tet_pos[:, :, edges[:, 1]]
    edge_verts = pa + frac * (pb - pa)                           # (M, 6, 6, 3)

    ca = tet_col[:, :, edges[:, 0]]
    cb = tet_col[:, :, edges[:, 1]]
    edge_cols = ca + frac * (cb - ca)                            # (M, 6, 6, 3)

    la = tet_lin[:, :, edges[:, 0]]                              # (M, 6, 6)
    lb = tet_lin[:, :, edges[:, 1]]
    edge_keys = jnp.stack([jnp.minimum(la, lb), jnp.maximum(la, lb)], axis=-1)  # (M,6,6,2)

    # Triangle table lookup.
    table = jnp.asarray(TET_TRIANGLE_TABLE)                      # (16, 2, 3)
    tri_edges = table[case]                                      # (M, 6, 2, 3)
    tri_valid = tri_edges[..., 0] >= 0                           # (M, 6, 2)
    safe_edges = jnp.maximum(tri_edges, 0)

    # safe_edges (M, 6, 2, 3) selects among the 6 edge slots of each tet.
    def pick(data):
        # data (M, 6, 6, C); result (M, 6, 2, 3, C)
        C = data.shape[-1]
        flat = data.reshape(M * 6, 6, C)
        sel = safe_edges.reshape(M * 6, 2 * 3)
        out = jnp.take_along_axis(flat, sel[..., None].repeat(C, axis=-1), axis=1)
        return out.reshape(M, 6, 2, 3, C)

    tri_pos = pick(edge_verts)
    tri_col = pick(edge_cols)
    tri_key = pick(edge_keys.astype(jnp.int32))

    # Numeric orientation fix: the linear SDF gradient inside each tet points
    # from inside (negative) to outside (positive); winding is flipped where
    # the face normal opposes it.
    e1 = tet_pos[:, :, 1] - tet_pos[:, :, 0]
    e2 = tet_pos[:, :, 2] - tet_pos[:, :, 0]
    e3 = tet_pos[:, :, 3] - tet_pos[:, :, 0]
    ds = jnp.stack([tet_s[..., 1] - tet_s[..., 0],
                    tet_s[..., 2] - tet_s[..., 0],
                    tet_s[..., 3] - tet_s[..., 0]], axis=-1)     # (M, 6, 3)

    # Solve A^T grad = ds for the per-tet linear SDF gradient with the
    # closed-form adjugate (rows of A are the tet edge vectors). Elementwise
    # only — jnp.linalg.solve lowers to a memory-hungry batched LU here.
    c23 = jnp.cross(e2, e3)
    c31 = jnp.cross(e3, e1)
    c12 = jnp.cross(e1, e2)
    det = jnp.sum(e1 * c23, axis=-1, keepdims=True)
    safe_det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)

    grad = (ds[..., 0:1] * c23 + ds[..., 1:2] * c31 + ds[..., 2:3] * c12) / safe_det

    n = jnp.cross(tri_pos[..., 1, :] - tri_pos[..., 0, :],
                  tri_pos[..., 2, :] - tri_pos[..., 0, :])        # (M, 6, 2, 3)
    flip = jnp.sum(n * grad[:, :, None, :], axis=-1) < 0.0        # (M, 6, 2)

    tri_pos = jnp.where(flip[..., None, None],
                        tri_pos[..., [0, 2, 1], :], tri_pos)
    tri_col = jnp.where(flip[..., None, None],
                        tri_col[..., [0, 2, 1], :], tri_col)
    tri_key = jnp.where(flip[..., None, None],
                        tri_key[..., [0, 2, 1], :], tri_key)

    return tri_pos, tri_key, tri_col, tri_valid


@partial(jax.jit, static_argnames=("dims", "capacity"))
def _emit_triangles_compact(tsdf_flat, packed_color_flat, cube_idx, valid_count, *,
                            dims, capacity: int):
    """Emit triangles and compact the valid ones on device.

    Only ``capacity`` compacted triangles (plus a count) cross to the host —
    a ~10x transfer reduction that matters when the accelerator sits behind a
    slow link. Returns (pos, key, col, count); count > capacity signals
    overflow (caller falls back to the uncompacted path for that chunk).
    """
    tri_pos, tri_key, tri_col, tri_valid = _emit_triangles(
        tsdf_flat, packed_color_flat, cube_idx, dims=dims)

    M = cube_idx.shape[0]
    # Padded cube slots (index >= valid_count) carry no triangles.
    slot_ok = jax.lax.broadcasted_iota(jnp.int32, (M, 1, 1), 0) < valid_count
    tri_valid = tri_valid & slot_ok

    flat_valid = tri_valid.reshape(-1)
    count = jnp.sum(flat_valid)

    idx = jnp.nonzero(flat_valid, size=capacity, fill_value=0)[0]

    # Colours quantise to uint8 on device: 4x less data over the host link.
    col_u8 = jnp.clip(jnp.round(tri_col.reshape(-1, 3, 3)[idx]), 0, 255
                      ).astype(jnp.uint8)

    return (tri_pos.reshape(-1, 3, 3)[idx], tri_key.reshape(-1, 3, 2)[idx],
            col_u8, count)


def extract_isosurface(tsdf, weight, color, origin, voxel_size: float,
                       chunk_size: int = 1 << 15) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
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
        vertex colors (V, 3) uint8).
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
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                np.zeros((0, 3), np.uint8))

    lin = np.asarray(jnp.nonzero(mask_flat, size=num_active)[0])
    cy, cz = (dims[1] - 1), (dims[2] - 1)
    active = np.stack([lin // (cy * cz), (lin // cz) % cy, lin % cz],
                      axis=-1).astype(np.int32)

    tsdf_flat = tsdf.reshape(-1)

    if color.shape == (*dims, 3):
        r, g, b = (color[..., ch].reshape(-1) for ch in range(3))
    else:
        r, g, b = (color[ch].reshape(-1) for ch in range(3))

    to_u32 = lambda c: jnp.clip(jnp.round(c), 0, 255).astype(jnp.uint32)
    color_flat = _pack_rgb(to_u32(r), to_u32(g), to_u32(b))

    all_pos, all_key, all_col = [], [], []

    # Marching tetrahedra emits at most 12 triangles per cube (6 tets x 2),
    # so this capacity can never overflow. (Sizing for an "average" density
    # instead was a measured trap: dense surface bands hit ~6 triangles/cube,
    # and an overflow fallback that re-transfers the chunk uncompacted turned
    # a 3 s extraction into 10 s behind a slow device link.)
    capacity = chunk_size * 12

    for start in range(0, len(active), chunk_size):
        chunk = active[start:start + chunk_size]
        valid_count = len(chunk)
        # Pad to the chunk size so every dispatch reuses one compiled program.
        if len(chunk) < chunk_size and len(active) > chunk_size:
            chunk = np.concatenate(
                [chunk, np.zeros((chunk_size - len(chunk), 3), np.int32)])

        pos, key, col, count = _emit_triangles_compact(
            tsdf_flat, color_flat, jnp.asarray(chunk),
            jnp.int32(valid_count), dims=dims, capacity=capacity)
        count = int(count)

        all_pos.append(np.asarray(pos[:count]))
        all_key.append(np.asarray(key[:count]))
        all_col.append(np.asarray(col[:count]))

    tri_pos = np.concatenate(all_pos)     # (T, 3 verts, 3)
    tri_key = np.concatenate(all_key)     # (T, 3 verts, 2)
    tri_col = np.concatenate(all_col)     # (T, 3 verts, 3)

    # Weld: each vertex is uniquely identified by its (lo, hi) grid-edge key.
    keys = (tri_key[..., 0].astype(np.uint64) * np.uint64(np.prod(dims))
            + tri_key[..., 1].astype(np.uint64)).reshape(-1)
    unique_keys, first_idx, inverse = np.unique(keys, return_index=True, return_inverse=True)

    flat_pos = tri_pos.reshape(-1, 3)
    flat_col = tri_col.reshape(-1, 3)

    vertices = (flat_pos[first_idx] * voxel_size + np.asarray(origin)).astype(np.float32)
    colors = np.clip(flat_col[first_idx], 0, 255).astype(np.uint8)
    faces = inverse.reshape(-1, 3).astype(np.int64)

    # Drop degenerate faces (duplicate welded vertices).
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    faces = faces[ok]

    return vertices, faces, colors
