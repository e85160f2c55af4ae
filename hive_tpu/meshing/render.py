"""Software triangle rasterisation on TPU (z-buffered, barycentric).

The reference rendered meshes for render-vs-photo evaluation with pyrender +
OSMesa under Xvfb (scripts/experiments.py:176,861). This module renders with
pure XLA instead: vertices project in one batched matmul, and a `lax.scan`
walks triangle chunks updating a z-buffer with fused elementwise math — no GL
stack, runs on TPU, differentiable in principle.

Intended for evaluation-scale meshes (10^4–10^5 triangles at VGA): the cost is
O(pixels x triangles) arithmetic, which the VPU chews through easily at these
sizes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hive_tpu.meshing.mesh import Scene, TriangleMesh


@partial(jax.jit, static_argnames=("height", "width", "chunk_size"))
def _rasterize_device(vertices, faces, colors, K, R, t, *, height: int, width: int,
                      chunk_size: int):
    """Render (V, 3) vertices / (F, 3) faces / (V, 3) colors → (H, W, 3), (H, W).

    Returns (image float32 [0,255], depth float32 — 0 where nothing was hit).
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
    tri_colors = colors[faces]        # (F, 3, 3)

    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)

    num_chunks = tri_screen.shape[0] // chunk_size

    def render_chunk(carry, chunk):
        zbuf, image = carry
        c_screen, c_inv_depth, c_colors, c_ok = chunk

        def one_triangle(carry, tri):
            zbuf, image = carry
            p, inv_z, col, ok = tri

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

            pix_color = (b0[..., None] * col[0] + b1[..., None] * col[1]
                         + b2[..., None] * col[2])

            zbuf = jnp.where(closer, pix_inv_z, zbuf)
            image = jnp.where(closer[..., None], pix_color, image)

            return (zbuf, image), None

        (zbuf, image), _ = jax.lax.scan(
            one_triangle, (zbuf, image),
            (c_screen, c_inv_depth, c_colors, c_ok))

        return (zbuf, image), None

    zbuf0 = jnp.zeros((height, width), dtype=jnp.float32)  # stores 1/z, 0 = empty
    image0 = jnp.zeros((height, width, 3), dtype=jnp.float32)

    chunks = (tri_screen[:num_chunks * chunk_size].reshape(num_chunks, chunk_size, 3, 2),
              tri_inv_depth[:num_chunks * chunk_size].reshape(num_chunks, chunk_size, 3),
              tri_colors[:num_chunks * chunk_size].reshape(num_chunks, chunk_size, 3, 3),
              tri_depth_ok[:num_chunks * chunk_size].reshape(num_chunks, chunk_size))

    (zbuf, image), _ = jax.lax.scan(render_chunk, (zbuf0, image0), chunks)

    out_depth = jnp.where(zbuf > 0, 1.0 / jnp.maximum(zbuf, 1e-12), 0.0)
    return image, out_depth


def render_mesh(mesh: TriangleMesh, camera_matrix: np.ndarray, rotation: np.ndarray,
                translation: np.ndarray, width: int, height: int,
                chunk_size: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Render a mesh from a camera.

    :param mesh: The mesh (vertex colours used if present; textured meshes are
        rendered with per-vertex colours sampled from the texture).
    :param camera_matrix: (3, 3) intrinsics.
    :param rotation: (3, 3) world-to-camera rotation.
    :param translation: (3, 1) world-to-camera translation.
    :return: ((H, W, 3) uint8 image, (H, W) float32 depth — 0 where empty).
    """
    if mesh.is_empty:
        return (np.zeros((height, width, 3), np.uint8),
                np.zeros((height, width), np.float32))

    colors = _vertex_colors(mesh)

    faces = np.asarray(mesh.faces, dtype=np.int32)
    # Pad the face list to a chunk multiple with degenerate (invisible) faces.
    pad = (-len(faces)) % chunk_size
    if pad:
        faces = np.concatenate([faces, np.zeros((pad, 3), np.int32)])

    image, depth = _rasterize_device(
        jnp.asarray(mesh.vertices, dtype=jnp.float32),
        jnp.asarray(faces),
        jnp.asarray(colors, dtype=jnp.float32),
        jnp.asarray(camera_matrix, dtype=jnp.float32),
        jnp.asarray(rotation, dtype=jnp.float32),
        jnp.asarray(translation, dtype=jnp.float32),
        height=height, width=width, chunk_size=chunk_size)

    return (np.clip(np.asarray(image), 0, 255).astype(np.uint8),
            np.asarray(depth))


def _vertex_colors(mesh: TriangleMesh) -> np.ndarray:
    """Per-vertex RGB in [0, 255]: vertex colours, texture samples, or grey."""
    if mesh.vertex_colors is not None:
        return mesh.vertex_colors[:, :3].astype(np.float32)

    if mesh.uv is not None and mesh.texture is not None:
        th, tw = mesh.texture.shape[:2]
        # UVs use a bottom-left origin (see meshing/texture.py).
        us = np.clip((mesh.uv[:, 0] * (tw - 1)).round().astype(int), 0, tw - 1)
        vs = np.clip(((1.0 - mesh.uv[:, 1]) * (th - 1)).round().astype(int), 0, th - 1)
        return mesh.texture[vs, us, :3].astype(np.float32)

    return np.full((len(mesh.vertices), 3), 180.0, dtype=np.float32)


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
