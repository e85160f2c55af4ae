"""2D Delaunay triangulation + face filtering for per-frame depth meshes.

Replaces the reference's in-pipeline triangulation helpers
(hive/pipeline.py:650-694).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import Delaunay

from hive_tpu.options import MeshFilteringOptions
from hive_tpu.utils import validate_shape


def triangulate_points(points2d: np.ndarray) -> np.ndarray:
    """Delaunay-triangulate 2D (pixel) points into face indices.

    The winding order is reversed so that faces viewed from the camera are
    front-facing under back-face culling (hive/pipeline.py:664-665 behaviour).

    :param points2d: (N, 2) image-space points.
    :return: (M, 3) face vertex indices.
    """
    validate_shape(points2d, "points", expected_shape=(None, 2))

    simplices = Delaunay(points2d).simplices
    return np.asarray(simplices)[:, ::-1]


def filter_faces(points2d: np.ndarray, depth: np.ndarray, faces: np.ndarray,
                 options: MeshFilteringOptions) -> np.ndarray:
    """Drop faces that connect distant vertices.

    A face survives iff every edge is short both in image space
    (<= max_pixel_distance) and in depth (<= max_depth_distance) — this
    removes the stretched "rubber sheet" triangles across depth
    discontinuities (hive/pipeline.py:669-694 behaviour).
    """
    validate_shape(points2d, "points2d", expected_shape=(None, 2))
    validate_shape(depth, "depth", expected_shape=(points2d.shape[0],))
    validate_shape(faces, "faces", expected_shape=(None, 3))

    a = faces[:, [0, 2, 0]]
    b = faces[:, [1, 1, 2]]

    pixel_distances = np.linalg.norm(points2d[a] - points2d[b], axis=-1)
    depth_distances = np.abs(depth[a] - depth[b])

    valid = ((pixel_distances <= options.max_pixel_distance)
             & (depth_distances <= options.max_depth_distance)).all(axis=1)

    return faces[valid]
