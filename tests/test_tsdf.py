"""TSDF fusion + isosurface extraction tests on synthetic geometry."""

import jax.numpy as jnp
import numpy as np
import pytest

from hive_tpu.ops.marching import extract_isosurface
from hive_tpu.ops.tsdf import TSDFVolume, estimate_volume_bounds

K = np.array([[100.0, 0.0, 63.5], [0.0, 100.0, 47.5], [0.0, 0.0, 1.0]], dtype=np.float32)
H, W = 96, 128


def render_sphere_depth(center, radius, cam_to_world):
    """Ray-cast a sphere into a depth map for the given camera."""
    world_to_cam = np.linalg.inv(cam_to_world)
    c_cam = world_to_cam[:3, :3] @ center + world_to_cam[:3, 3]

    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    rays = np.stack([(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1],
                     np.ones_like(us, dtype=np.float64)], axis=-1)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)

    # Ray-sphere intersection in camera space (origin at 0).
    b = rays @ c_cam
    disc = b ** 2 - (c_cam @ c_cam - radius ** 2)
    hit = disc > 0

    t = b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0

    depth = np.zeros((H, W), dtype=np.float32)
    depth[hit] = (t * rays[..., 2])[hit]  # z-depth, not ray length

    return depth


def look_at_pose(eye, target):
    """Camera-to-world matrix with +z looking from eye toward target."""
    forward = np.asarray(target, float) - np.asarray(eye, float)
    forward /= np.linalg.norm(forward)
    up = np.array([0.0, 1.0, 0.0])
    if abs(forward @ up) > 0.95:
        up = np.array([1.0, 0.0, 0.0])

    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    true_up = np.cross(forward, right)

    pose = np.eye(4)
    pose[:3, 0] = right
    pose[:3, 1] = true_up
    pose[:3, 2] = forward
    pose[:3, 3] = eye
    return pose


class TestIsosurfaceExtraction:
    def _sphere_volume(self, n=48, radius=0.35):
        coords = (np.arange(n) + 0.5) / n - 0.5
        x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
        sdf = np.sqrt(x ** 2 + y ** 2 + z ** 2) - radius
        # TSDF-style clamp to [-1, 1].
        tsdf = np.clip(sdf / 0.1, -1.0, 1.0).astype(np.float32)
        weight = np.ones_like(tsdf)
        color = np.full((*tsdf.shape, 3), 128.0, dtype=np.float32)
        return tsdf, weight, color, 1.0 / n

    def test_sphere_vertices_on_surface(self):
        tsdf, weight, color, voxel = self._sphere_volume()
        verts, faces, colors, _ = extract_isosurface(tsdf, weight, color,
                                                  origin=np.array([0.5 * voxel - 0.5] * 3),
                                                  voxel_size=voxel)

        assert len(verts) > 500
        assert len(faces) > 500

        radii = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(radii, 0.35, atol=2.5 * voxel)

    def test_sphere_is_watertight(self):
        """A closed surface: every edge must be shared by exactly two faces."""
        tsdf, weight, color, voxel = self._sphere_volume(n=32)
        verts, faces, _, _ = extract_isosurface(tsdf, weight, color,
                                             origin=np.array([-0.5] * 3), voxel_size=voxel)

        edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        edges = np.sort(edges, axis=-1)
        _, counts = np.unique(edges, axis=0, return_counts=True)

        assert (counts == 2).all(), f"non-manifold edge counts: {np.unique(counts)}"

    def test_sphere_winding_consistent_outward(self):
        """Face normals should point away from the sphere centre (outward)."""
        tsdf, weight, color, voxel = self._sphere_volume(n=32)
        verts, faces, _, _ = extract_isosurface(tsdf, weight, color,
                                             origin=np.array([-0.5] * 3), voxel_size=voxel)

        tri = verts[faces]
        centroids = tri.mean(axis=1)
        normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])

        outward = np.sum(normals * centroids, axis=-1)
        assert (outward > 0).mean() > 0.99

    def test_sphere_vertex_normals_radial(self):
        """Emitted normals (averaged incident-tet SDF gradients) must point
        radially outward on a sphere, unit length."""
        tsdf, weight, color, voxel = self._sphere_volume(n=32)
        verts, _, _, normals = extract_isosurface(
            tsdf, weight, color, origin=np.array([-0.5] * 3),
            voxel_size=voxel)

        lengths = np.linalg.norm(normals, axis=-1)
        np.testing.assert_allclose(lengths, 1.0, atol=1e-3)

        radial = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
        cosine = np.sum(normals * radial, axis=-1)
        # Outward and tight: the analytic normal IS radial here.
        assert cosine.min() > 0.9
        assert cosine.mean() > 0.99

    def test_unobserved_region_produces_no_mesh(self):
        tsdf, weight, color, voxel = self._sphere_volume(n=32)
        weight[:] = 0.0
        verts, faces, _, _ = extract_isosurface(tsdf, weight, color,
                                             origin=np.zeros(3), voxel_size=voxel)
        assert len(verts) == 0 and len(faces) == 0

    def test_vertex_colors_interpolated(self):
        tsdf, weight, color, voxel = self._sphere_volume(n=24)
        color[..., 0] = 200.0
        color[..., 1] = 50.0
        verts, faces, colors, _ = extract_isosurface(tsdf, weight, color,
                                                  origin=np.zeros(3), voxel_size=voxel)
        assert (colors[:, 0] == 200).all()
        assert (colors[:, 1] == 50).all()

    def test_degenerate_triangles_filtered_on_device(self, monkeypatch,
                                                     capsys):
        """A surface lying exactly on a lattice plane makes corner snapping
        collapse most emitted triangles to zero area (measured ~75% on a
        grid-aligned wall). Those must be dropped ON DEVICE (the weld-key
        comparison in marching._emit_core), not shipped for the host to
        discard: the stats line's emitted count must equal exactly 3 lanes
        per KEPT face, and every welded vertex must be referenced."""
        n = 24
        z = np.arange(n, dtype=np.float32) - n // 2  # zero ON the lattice
        tsdf = np.broadcast_to(np.clip(z / 3.0, -1.0, 1.0),
                               (n, n, n)).astype(np.float32).copy()
        weight = np.ones_like(tsdf)
        color = np.full((n, n, n, 3), 128.0, np.float32)

        monkeypatch.setenv("HIVE_EXTRACT_STATS", "1")
        verts, faces, _, _ = extract_isosurface(
            tsdf, weight, color, origin=np.zeros(3), voxel_size=0.1)
        stats = capsys.readouterr().out

        assert len(faces) > 100
        assert (np.diff(np.sort(faces, axis=-1), axis=-1) != 0).all()

        referenced = np.zeros(len(verts), bool)
        referenced[faces.ravel()] = True
        assert referenced.all()

        emitted = int(stats.split("emitted=")[1].split()[0])
        assert emitted == 3 * len(faces)


class TestTSDFVolume:
    def test_flat_wall_reconstruction(self):
        """A camera at the origin looking at a wall at z=2 must produce a mesh
        near z=2 spanning the viewed area."""
        depth = np.full((H, W), 2.0, dtype=np.float32)
        color = np.full((H, W, 3), 200, dtype=np.uint8)

        bounds = np.array([[-1.5, 1.5], [-1.2, 1.2], [0.0, 2.5]])
        volume = TSDFVolume(bounds, voxel_size=0.04)

        volume.integrate(color, depth, K, np.eye(4))

        verts, faces, norms, colors = volume.get_mesh()

        assert len(verts) > 100
        np.testing.assert_allclose(verts[:, 2], 2.0, atol=0.08)
        # Colour should be carried through.
        assert (np.abs(colors.astype(int) - 200) < 8).all()

    def test_multiview_sphere(self):
        """Fusing several views of a sphere approximates the sphere surface."""
        center = np.array([0.0, 0.0, 0.0])
        radius = 0.5

        poses = [look_at_pose(eye, center) for eye in
                 [(0, 0, -2.0), (2.0, 0, 0), (0, 0, 2.0), (-2.0, 0, 0), (0, 2.0, 0.01)]]
        depths = np.stack([render_sphere_depth(center, radius, p) for p in poses])
        colors = np.full((len(poses), H, W, 3), 128, dtype=np.uint8)

        bounds = np.array([[-0.8, 0.8]] * 3)
        volume = TSDFVolume(bounds, voxel_size=0.02)
        volume.integrate_frames(colors, depths, K, np.stack(poses))

        verts, faces, norms, colors_out = volume.get_mesh()

        assert len(verts) > 1000
        radii = np.linalg.norm(verts - center, axis=-1)
        # Majority of the surface should be close to the true radius.
        assert np.quantile(np.abs(radii - radius), 0.9) < 0.05

    def test_bfloat16_storage_reconstruction(self):
        """bf16 voxel storage must reproduce the wall to within a voxel."""
        depth = np.full((H, W), 2.0, dtype=np.float32)
        color = np.full((H, W, 3), 100, dtype=np.uint8)

        bounds = np.array([[-1.5, 1.5], [-1.2, 1.2], [0.0, 2.5]])
        volume = TSDFVolume(bounds, voxel_size=0.04, dtype=jnp.bfloat16)
        volume.integrate(color, depth, K, np.eye(4))

        verts, faces, norms, colors = volume.get_mesh()

        assert len(verts) > 100
        np.testing.assert_allclose(verts[:, 2], 2.0, atol=0.08)
        assert (np.abs(colors.astype(int) - 100) < 10).all()

    def test_weight_accumulates(self):
        depth = np.full((H, W), 1.0, dtype=np.float32)
        color = np.zeros((H, W, 3), dtype=np.uint8)
        volume = TSDFVolume(np.array([[-1.0, 1.0]] * 3), voxel_size=0.05)

        volume.integrate(color, depth, K, np.eye(4))
        _, w1, _ = volume.get_volume()
        volume.integrate(color, depth, K, np.eye(4))
        _, w2, _ = volume.get_volume()

        assert w2.max() == pytest.approx(2.0)
        assert w2.max() > w1.max()

    def test_estimate_volume_bounds_contains_frustum(self):
        depth = np.full((1, H, W), 3.0, dtype=np.float32)
        bounds = estimate_volume_bounds(depth, K, np.eye(4)[None])

        assert bounds[2, 1] >= 3.0
        assert bounds[0, 0] < 0 < bounds[0, 1]
        assert (bounds[:, 0] <= 0).all()

    def test_invalid_bounds_shape_raises(self):
        with pytest.raises(ValueError):
            TSDFVolume(np.zeros((2, 3)), voxel_size=0.1)
