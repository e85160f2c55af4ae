"""Software triangle rasterisation on TPU (z-buffered, barycentric).

The reference rendered meshes for render-vs-photo evaluation with pyrender +
OSMesa under Xvfb (scripts/experiments.py:176,861). This module renders with
pure XLA instead: vertices project in one batched matmul, and a `lax.scan`
walks triangle chunks updating a z-buffer with fused elementwise math — no GL
stack, runs on TPU, differentiable in principle.

Textured meshes render with REAL per-pixel UV sampling: the rasteriser
interpolates perspective-correct UVs into a G-buffer, and the final texture
lookup is one bilinear sample per covered pixel (on host — a single gather
over H x W pixels, off the TPU's expensive-gather path). Vertex-coloured
meshes interpolate colours directly (also perspective-correct).

Intended for evaluation-scale meshes (10^4–10^5 triangles at VGA): the cost is
O(pixels x triangles) arithmetic, which the VPU chews through easily at these
sizes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hive_tpu.meshing.mesh import Scene, TriangleMesh


@partial(jax.jit, static_argnames=("height", "width", "chunk_size"))
def _rasterize_device(vertices, faces, attrs, K, R, t, *, height: int, width: int,
                      chunk_size: int):
    """Rasterise (V, 3) vertices / (F, 3) faces with per-vertex attributes.

    ``attrs`` is a generic (V, C) attribute matrix (RGB colours, UVs, ...),
    interpolated perspective-correctly (attributes and 1 are both divided by
    z at the vertices, interpolated in screen space, and re-divided per
    pixel).

    Returns ((H, W, C) float32 attribute image — 0 where nothing was hit,
    (H, W) float32 depth — 0 where empty).
    """
    # Project all vertices at once.
    cam = vertices @ R.T + t.reshape(3)
    depth = cam[:, 2]
    safe_depth = jnp.where(jnp.abs(depth) < 1e-8, 1e-8, depth)

    uvw = cam @ K.T
    screen = uvw[:, :2] / safe_depth[:, None]  # pixel coordinates
    inv_depth = 1.0 / safe_depth

    tri_screen = screen[faces]        # (F, 3, 2)
    tri_inv_depth = inv_depth[faces]  # (F, 3)
    tri_depth_ok = (depth[faces] > 1e-6).all(axis=-1)
    # Perspective correction: interpolate attr/z, divide by 1/z per pixel.
    tri_attrs = (attrs * inv_depth[:, None])[faces]  # (F, 3, C)

    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)

    num_chunks = tri_screen.shape[0] // chunk_size
    num_attrs = attrs.shape[1]

    def render_chunk(carry, chunk):
        zbuf, attr_buf = carry
        c_screen, c_inv_depth, c_attrs, c_ok = chunk

        def one_triangle(carry, tri):
            zbuf, attr_buf = carry
            p, inv_z, attr, ok = tri

            x0, y0 = p[0, 0], p[0, 1]
            x1, y1 = p[1, 0], p[1, 1]
            x2, y2 = p[2, 0], p[2, 1]

            # Signed edge functions (twice the sub-triangle areas).
            w0 = (x2 - x1) * (ys - y1) - (y2 - y1) * (xs - x1)
            w1 = (x0 - x2) * (ys - y2) - (y0 - y2) * (xs - x2)
            w2 = (x1 - x0) * (ys - y0) - (y1 - y0) * (xs - x0)

            area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
            safe_area = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)

            b0 = w0 / safe_area
            b1 = w1 / safe_area
            b2 = w2 / safe_area

            inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (jnp.abs(area) > 1e-12) & ok

            # Perspective-correct interpolation via 1/z.
            pix_inv_z = b0 * inv_z[0] + b1 * inv_z[1] + b2 * inv_z[2]
            closer = inside & (pix_inv_z > zbuf)

            pix_attr = (b0[..., None] * attr[0] + b1[..., None] * attr[1]
                        + b2[..., None] * attr[2])

            zbuf = jnp.where(closer, pix_inv_z, zbuf)
            attr_buf = jnp.where(closer[..., None], pix_attr, attr_buf)

            return (zbuf, attr_buf), None

        (zbuf, attr_buf), _ = jax.lax.scan(
            one_triangle, (zbuf, attr_buf),
            (c_screen, c_inv_depth, c_attrs, c_ok))

        return (zbuf, attr_buf), None

    zbuf0 = jnp.zeros((height, width), dtype=jnp.float32)  # stores 1/z, 0 = empty
    attr0 = jnp.zeros((height, width, num_attrs), dtype=jnp.float32)

    chunks = (tri_screen[:num_chunks * chunk_size].reshape(num_chunks, chunk_size, 3, 2),
              tri_inv_depth[:num_chunks * chunk_size].reshape(num_chunks, chunk_size, 3),
              tri_attrs[:num_chunks * chunk_size].reshape(num_chunks, chunk_size, 3,
                                                          num_attrs),
              tri_depth_ok[:num_chunks * chunk_size].reshape(num_chunks, chunk_size))

    (zbuf, attr_buf), _ = jax.lax.scan(render_chunk, (zbuf0, attr0), chunks)

    out_attr = jnp.where(zbuf[..., None] > 0,
                         attr_buf / jnp.maximum(zbuf, 1e-12)[..., None], 0.0)
    out_depth = jnp.where(zbuf > 0, 1.0 / jnp.maximum(zbuf, 1e-12), 0.0)
    return out_attr, out_depth


def _sample_texture_bilinear(texture: np.ndarray, uv: np.ndarray,
                             covered: np.ndarray) -> np.ndarray:
    """Bilinearly sample an (TH, TW, 3+) texture at (H, W, 2) UVs.

    UVs use a bottom-left origin (see meshing/texture.py); ``covered`` masks
    pixels the rasteriser hit (uncovered pixels return 0).
    """
    th, tw = texture.shape[:2]
    tex = texture[..., :3].astype(np.float32)

    # pack_textures normalises atlas pixel coordinates by canvas size
    # (u = p / tw with texel centers at integer p), so the inverse is u * tw
    # — scaling by (tw - 1) compressed the mapping by one texel across the
    # atlas, drifting texture samples toward the origin at the far edge.
    us = np.clip(np.clip(uv[..., 0], 0.0, 1.0) * tw, 0.0, tw - 1)
    vs = np.clip((1.0 - np.clip(uv[..., 1], 0.0, 1.0)) * th, 0.0, th - 1)

    u0 = np.floor(us).astype(np.int64)
    v0 = np.floor(vs).astype(np.int64)
    u1 = np.minimum(u0 + 1, tw - 1)
    v1 = np.minimum(v0 + 1, th - 1)
    fu = (us - u0)[..., None]
    fv = (vs - v0)[..., None]

    sample = ((1 - fv) * ((1 - fu) * tex[v0, u0] + fu * tex[v0, u1])
              + fv * ((1 - fu) * tex[v1, u0] + fu * tex[v1, u1]))
    return np.where(covered[..., None], sample, 0.0)


def render_mesh(mesh: TriangleMesh, camera_matrix: np.ndarray, rotation: np.ndarray,
                translation: np.ndarray, width: int, height: int,
                chunk_size: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Render a mesh from a camera.

    Textured meshes (``mesh.uv`` + ``mesh.texture``, no vertex colours)
    rasterise perspective-correct per-pixel UVs and bilinearly sample the
    texture — evaluation renders what the pipeline actually ships
    (ref pyrender path scripts/experiments.py:861-945). Vertex-coloured
    meshes interpolate colours directly.

    :param camera_matrix: (3, 3) intrinsics.
    :param rotation: (3, 3) world-to-camera rotation.
    :param translation: (3, 1) world-to-camera translation.
    :return: ((H, W, 3) uint8 image, (H, W) float32 depth — 0 where empty).
    """
    if mesh.is_empty:
        return (np.zeros((height, width, 3), np.uint8),
                np.zeros((height, width), np.float32))

    textured = (mesh.vertex_colors is None and mesh.uv is not None
                and mesh.texture is not None)

    if textured:
        attrs = np.asarray(mesh.uv[:, :2], dtype=np.float32)
    elif mesh.vertex_colors is not None:
        attrs = np.asarray(mesh.vertex_colors[:, :3], dtype=np.float32)
    else:
        attrs = np.full((len(mesh.vertices), 3), 180.0, dtype=np.float32)

    # Pad BOTH the face and vertex counts up to power-of-two size classes —
    # jit keys on input shapes, and per-mesh-size programs recompile for
    # every scene (seconds each; same policy as the extraction dispatches,
    # see CLAUDE.md). Padding faces are degenerate (all-vertex-0, invisible);
    # padding vertices copy vertex 0 and are never referenced.
    faces = np.asarray(mesh.faces, dtype=np.int32)
    face_count = 1 << int(np.ceil(np.log2(max(len(faces), chunk_size))))
    face_count += (-face_count) % chunk_size  # non-pow2 chunk sizes
    if face_count > len(faces):
        faces = np.concatenate(
            [faces, np.zeros((face_count - len(faces), 3), np.int32)])

    vertices = np.asarray(mesh.vertices, dtype=np.float32)
    vertex_count = 1 << int(np.ceil(np.log2(max(len(vertices), 1))))
    if vertex_count > len(vertices):
        extra = vertex_count - len(vertices)
        vertices = np.concatenate([vertices, np.tile(vertices[:1], (extra, 1))])
        attrs = np.concatenate([attrs, np.tile(attrs[:1], (extra, 1))])

    attr_image, depth = _rasterize_device(
        jnp.asarray(vertices),
        jnp.asarray(faces),
        jnp.asarray(attrs),
        jnp.asarray(camera_matrix, dtype=jnp.float32),
        jnp.asarray(rotation, dtype=jnp.float32),
        jnp.asarray(translation, dtype=jnp.float32),
        height=height, width=width, chunk_size=chunk_size)

    attr_image = np.asarray(attr_image)
    depth = np.asarray(depth)

    if textured:
        image = _sample_texture_bilinear(np.asarray(mesh.texture), attr_image,
                                         covered=depth > 0)
    else:
        image = attr_image

    return (np.clip(image, 0, 255).astype(np.uint8), depth)


def render_scene(scene: Scene, camera_matrix: np.ndarray, rotation: np.ndarray,
                 translation: np.ndarray, width: int, height: int) -> Tuple[np.ndarray, np.ndarray]:
    """Render every mesh of a scene into one image (painter's algorithm via a
    shared z-test: meshes render separately, nearest depth wins)."""
    image = np.zeros((height, width, 3), np.uint8)
    depth = np.zeros((height, width), np.float32)

    for mesh in scene.geometry.values():
        mesh_image, mesh_depth = render_mesh(mesh, camera_matrix, rotation, translation,
                                             width, height)

        closer = (mesh_depth > 0) & ((depth == 0) | (mesh_depth < depth))
        image[closer] = mesh_image[closer]
        depth[closer] = mesh_depth[closer]

    return image, depth
