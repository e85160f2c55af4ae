"""Meshing stack tests: containers, glTF/PLY round-trips, decimation,
connected components, triangulation."""

import numpy as np
import pytest

from hive_tpu.meshing.components import cleanup_with_connected_components, \
    face_connected_components
from hive_tpu.meshing.decimate import _decimate_clustering, decimate_mesh
from hive_tpu.meshing.gltf import export_scene, load_glb
from hive_tpu.meshing.mesh import Scene, TriangleMesh
from hive_tpu.meshing.ply import load_ply, save_ply
from hive_tpu.meshing.triangulate import filter_faces, triangulate_points
from hive_tpu.options import MeshFilteringOptions


def make_icosphere(subdivisions=3, radius=1.0):
    """Subdivided icosahedron — a dense sphere mesh for decimation tests."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ])

    for _ in range(subdivisions):
        edge_mid = {}
        new_faces = []
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                verts.append((np.asarray(verts[a]) + verts[b]) / 2.0)
                edge_mid[key] = len(verts) - 1
            return edge_mid[key]

        for f in faces:
            a, b, c = (int(v) for v in f)
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]

        faces = np.array(new_faces)
        verts = np.array(verts)

    verts = verts / np.linalg.norm(verts, axis=-1, keepdims=True) * radius
    return verts, faces


class TestTriangleMesh:
    def test_bounds_and_empty(self):
        mesh = TriangleMesh()
        assert mesh.is_empty
        assert mesh.bounds is None

        mesh = TriangleMesh(vertices=np.array([[0, 0, 0], [1, 2, 3]], dtype=np.float32),
                            faces=np.array([[0, 1, 1]]))
        np.testing.assert_allclose(mesh.bounds, [[0, 0, 0], [1, 2, 3]])

    def test_transform_roundtrip(self):
        verts, faces = make_icosphere(1)
        mesh = TriangleMesh(vertices=verts.astype(np.float32), faces=faces)
        mesh.compute_vertex_normals()

        transform = np.eye(4)
        transform[:3, 3] = [1.0, -2.0, 3.0]

        before = mesh.vertices.copy()
        mesh.apply_transform(transform)
        inverse = np.linalg.inv(transform)
        mesh.apply_transform(inverse)

        np.testing.assert_allclose(mesh.vertices, before, atol=1e-5)

    def test_reflection_flips_winding(self):
        verts, faces = make_icosphere(0)
        mesh = TriangleMesh(vertices=verts.astype(np.float32), faces=faces.copy())
        mesh.apply_transform(np.diag([-1.0, 1.0, 1.0, 1.0]))
        np.testing.assert_array_equal(mesh.faces, faces[:, ::-1])

    def test_sphere_normals_point_outward(self):
        verts, faces = make_icosphere(2)
        mesh = TriangleMesh(vertices=verts.astype(np.float32), faces=faces)
        normals = mesh.compute_vertex_normals()

        outward = np.sum(normals * mesh.vertices, axis=-1)
        assert (outward > 0).all()

    def test_update_faces_compacts_vertices(self):
        verts, faces = make_icosphere(0)
        mesh = TriangleMesh(vertices=verts.astype(np.float32), faces=faces)

        keep = np.zeros(len(faces), dtype=bool)
        keep[:5] = True
        mesh.update_faces(keep)

        assert mesh.num_faces == 5
        assert mesh.num_vertices == len(np.unique(faces[:5]))
        assert mesh.faces.max() < mesh.num_vertices


class TestSceneGLB:
    def test_roundtrip_vertex_colors(self, tmp_path):
        verts, faces = make_icosphere(1)
        colors = np.random.default_rng(0).integers(0, 255, size=(len(verts), 3),
                                                   dtype=np.uint8)
        mesh = TriangleMesh(vertices=verts.astype(np.float32), faces=faces,
                            vertex_colors=colors)
        mesh.compute_vertex_normals()

        scene = Scene(camera_resolution=(640, 480), camera_focal=(580.0, 580.0))
        scene.add_geometry(mesh, node_name="000000")

        path = str(tmp_path / "scene.glb")
        export_scene(scene, path)
        loaded = load_glb(path)

        assert loaded.node_names == ["000000"]
        out = loaded.geometry["000000"]
        np.testing.assert_allclose(out.vertices, mesh.vertices, atol=1e-6)
        np.testing.assert_array_equal(out.faces, mesh.faces)
        np.testing.assert_array_equal(out.vertex_colors[:, :3], colors)

    def test_roundtrip_textured(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
        faces = np.array([[0, 1, 2]])
        uv = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
        texture = np.random.default_rng(1).integers(0, 255, size=(16, 16, 3),
                                                    dtype=np.uint8)

        mesh = TriangleMesh(vertices=verts, faces=faces, uv=uv, texture=texture)
        scene = Scene()
        scene.add_geometry(mesh, node_name="frame")

        path = str(tmp_path / "textured.glb")
        export_scene(scene, path)
        loaded = load_glb(path).geometry["frame"]

        np.testing.assert_allclose(loaded.uv, uv, atol=1e-6)
        np.testing.assert_array_equal(loaded.texture, texture)

    def test_multiple_frames(self, tmp_path):
        scene = Scene()
        verts, faces = make_icosphere(0)

        for i in range(3):
            mesh = TriangleMesh(vertices=(verts + i).astype(np.float32), faces=faces)
            scene.add_geometry(mesh, node_name=f"{i:06d}")

        path = str(tmp_path / "frames.glb")
        export_scene(scene, path)
        loaded = load_glb(path)

        assert loaded.node_names == ["000000", "000001", "000002"]

    def test_empty_meshes_skipped(self, tmp_path):
        scene = Scene()
        scene.add_geometry(TriangleMesh(), node_name="empty")
        path = str(tmp_path / "empty.glb")
        export_scene(scene, path)
        assert load_glb(path).node_names == []


class TestQuantizedGLB:
    """KHR_mesh_quantization export (the native draco-fallback compression,
    ref hive/pipeline.py:938-980): smaller files, lossless faces/colors,
    positions within half a grid step, standard extension declared."""

    def _make_scene(self, seed=0, n=500):
        rng = np.random.default_rng(seed)
        verts = rng.uniform(-2.0, 3.0, (n, 3)).astype(np.float32)
        faces = rng.integers(0, n, (2 * n, 3)).astype(np.int64)
        colors = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        normals = rng.normal(size=(n, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

        mesh = TriangleMesh(vertices=verts, faces=faces, vertex_colors=colors)
        mesh.vertex_normals = normals
        scene = Scene()
        scene.add_geometry(mesh, node_name="000000")
        return scene, mesh

    def test_quantized_roundtrip(self, tmp_path):
        scene, mesh = self._make_scene()
        path = str(tmp_path / "q.glb")
        export_scene(scene, path, quantize=True)

        out = load_glb(path).geometry["000000"]

        extent = (mesh.vertices.max(axis=0) - mesh.vertices.min(axis=0)).max()
        np.testing.assert_allclose(out.vertices, mesh.vertices,
                                   atol=extent / 65535 * 0.51)
        np.testing.assert_array_equal(out.faces, mesh.faces)
        np.testing.assert_array_equal(out.vertex_colors[:, :3], mesh.vertex_colors)
        # int8 normals: ~0.5 degree worst case.
        dots = np.sum(out.vertex_normals * mesh.vertex_normals, axis=-1)
        assert dots.min() > 0.999

    def test_quantized_textured_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        verts = rng.uniform(0, 1, (64, 3)).astype(np.float32)
        faces = rng.integers(0, 64, (100, 3)).astype(np.int64)
        uv = rng.uniform(0, 1, (64, 2)).astype(np.float32)
        # A smooth camera-crop-like texture (the compressed encoding stores
        # JPEG, whose error is bounded on smooth content, unlike noise).
        yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
        texture = np.stack([xx * 4, yy * 4, (xx + yy) * 2],
                           axis=-1).clip(0, 255).astype(np.uint8)

        mesh = TriangleMesh(vertices=verts, faces=faces, uv=uv, texture=texture)
        scene = Scene()
        scene.add_geometry(mesh, node_name="frame")

        path = str(tmp_path / "qt.glb")
        export_scene(scene, path, quantize=True)
        out = load_glb(path).geometry["frame"]

        np.testing.assert_allclose(out.uv, uv, atol=1.5 / 65535)
        err = np.abs(out.texture.astype(int) - texture.astype(int))
        assert err.mean() < 3.0 and err.max() < 32  # JPEG q92 on smooth content
        np.testing.assert_array_equal(out.faces, faces)

    def test_plain_export_keeps_lossless_png_texture(self, tmp_path):
        rng = np.random.default_rng(3)
        verts = rng.uniform(0, 1, (16, 3)).astype(np.float32)
        faces = rng.integers(0, 16, (20, 3)).astype(np.int64)
        uv = rng.uniform(0, 1, (16, 2)).astype(np.float32)
        texture = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)

        mesh = TriangleMesh(vertices=verts, faces=faces, uv=uv, texture=texture)
        scene = Scene()
        scene.add_geometry(mesh, node_name="frame")

        path = str(tmp_path / "plain_tex.glb")
        export_scene(scene, path)  # primary export: PNG, bit-exact
        out = load_glb(path).geometry["frame"]
        np.testing.assert_array_equal(out.texture, texture)

    def test_quantize_glb_shrinks_and_declares_extension(self, tmp_path):
        import json as json_mod
        import struct as struct_mod

        from hive_tpu.meshing.gltf import quantize_glb

        scene, _ = self._make_scene(n=2000)
        path = str(tmp_path / "plain.glb")
        export_scene(scene, path)

        before, after = quantize_glb(path)  # in place
        assert after < before * 0.7  # u16 positions+indices, int8 normals

        with open(path, "rb") as fh:
            fh.seek(12)
            json_len, _ = struct_mod.unpack("<II", fh.read(8))
            gltf = json_mod.loads(fh.read(json_len))
        assert gltf["extensionsRequired"] == ["KHR_mesh_quantization"]

    def test_large_mesh_splits_into_uint16_primitives(self, tmp_path):
        import json as json_mod
        import struct as struct_mod

        rng = np.random.default_rng(2)
        n = 150000  # well past uint16 range -> must split
        verts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        faces = np.stack([np.arange(n - 2), np.arange(1, n - 1),
                          np.arange(2, n)], axis=-1).astype(np.int64)
        scene = Scene()
        scene.add_geometry(TriangleMesh(vertices=verts, faces=faces),
                           node_name="big")

        path = str(tmp_path / "big.glb")
        export_scene(scene, path, quantize=True)

        with open(path, "rb") as fh:
            fh.seek(12)
            json_len, _ = struct_mod.unpack("<II", fh.read(8))
            gltf = json_mod.loads(fh.read(json_len))

        primitives = gltf["meshes"][0]["primitives"]
        assert len(primitives) >= 3
        for primitive in primitives:
            # Both positions and indices stay uint16 in every split.
            assert gltf["accessors"][primitive["indices"]]["componentType"] == 5123
            pos = gltf["accessors"][primitive["attributes"]["POSITION"]]
            assert pos["componentType"] == 5123 and pos["count"] < 65536

        # Geometric equivalence: same triangles in order, within the
        # quantization grid (vertex ids shift at split boundaries).
        out = load_glb(path).geometry["big"]
        assert len(out.faces) == len(faces)
        extent = (verts.max(axis=0) - verts.min(axis=0)).max()
        np.testing.assert_allclose(out.vertices[out.faces], verts[faces],
                                   atol=extent / 65535 * 0.51)


class TestPLY:
    def test_roundtrip(self, tmp_path):
        verts, faces = make_icosphere(1)
        colors = np.random.default_rng(2).integers(0, 255, size=(len(verts), 3),
                                                   dtype=np.uint8)
        mesh = TriangleMesh(vertices=verts.astype(np.float32), faces=faces,
                            vertex_colors=colors)
        mesh.compute_vertex_normals()

        path = str(tmp_path / "mesh.ply")
        save_ply(path, mesh)
        loaded = load_ply(path)

        np.testing.assert_allclose(loaded.vertices, mesh.vertices, atol=1e-6)
        np.testing.assert_array_equal(loaded.faces, mesh.faces)
        np.testing.assert_array_equal(loaded.vertex_colors, colors)
        np.testing.assert_allclose(loaded.vertex_normals, mesh.vertex_normals, atol=1e-6)


class TestDecimation:
    def test_open_boundary_is_preserved(self):
        """A flat grid-triangulated disc decimated 50x must keep its full
        extent (boundary-constraint quadrics): the unconstrained QEM shrank
        it to under half, and the float32 lattice also has to finish without
        pathological heap churn."""
        from hive_tpu.meshing.decimate import decimate_mesh
        from hive_tpu.meshing.triangulate import triangulate_grid
        from hive_tpu.options import MeshFilteringOptions

        h, w = 240, 320
        us, vs = np.meshgrid(np.arange(w), np.arange(h))
        obj = (us - 160) ** 2 + (vs - 120) ** 2 < 80 ** 2
        depth = np.full((h, w), 1.5, np.float32)

        pix, faces, _ = triangulate_grid(obj, depth, MeshFilteringOptions())
        z = depth[pix[:, 0], pix[:, 1]]
        verts = np.stack([(pix[:, 1] - 159.5) / 100.0 * z,
                          (pix[:, 0] - 119.5) / 100.0 * z, z],
                         -1).astype(np.float32)

        v2, f2 = decimate_mesh(verts, faces.astype(np.int32), 512)

        assert len(f2) <= 600
        np.testing.assert_allclose(v2.min(axis=0), verts.min(axis=0), atol=0.02)
        np.testing.assert_allclose(v2.max(axis=0), verts.max(axis=0), atol=0.02)

    def test_native_decimation_hits_target(self):
        verts, faces = make_icosphere(3)  # 1280 faces
        out_verts, out_faces = decimate_mesh(verts, faces, target_faces=200, max_error=1e9)

        assert len(out_faces) <= 210
        assert len(out_faces) > 50
        # The result should still be a sphere-ish surface.
        radii = np.linalg.norm(out_verts, axis=-1)
        np.testing.assert_allclose(radii, 1.0, atol=0.15)

    def test_decimation_disabled(self):
        verts, faces = make_icosphere(1)
        out_verts, out_faces = decimate_mesh(verts, faces, target_faces=-1)
        assert len(out_faces) == len(faces)

    def test_already_under_target(self):
        verts, faces = make_icosphere(0)
        out_verts, out_faces = decimate_mesh(verts, faces, target_faces=100)
        assert len(out_faces) == len(faces)

    def test_clustering_fallback(self):
        verts, faces = make_icosphere(3)
        out_verts, out_faces = _decimate_clustering(verts, faces, target_faces=300)
        assert 0 < len(out_faces) <= 1.2 * 300 + 50

    def test_decimated_faces_are_valid(self):
        verts, faces = make_icosphere(3)
        out_verts, out_faces = decimate_mesh(verts, faces, target_faces=100, max_error=1e9)

        assert out_faces.min() >= 0
        assert out_faces.max() < len(out_verts)
        # No degenerate faces.
        assert (out_faces[:, 0] != out_faces[:, 1]).all()
        assert (out_faces[:, 1] != out_faces[:, 2]).all()


class TestConnectedComponents:
    def test_two_spheres(self):
        verts, faces = make_icosphere(1)
        offset = verts + np.array([5.0, 0.0, 0.0])

        all_verts = np.concatenate([verts, offset])
        all_faces = np.concatenate([faces, faces + len(verts)])

        num, labels = face_connected_components(all_faces)
        assert num == 2
        assert (labels[:len(faces)] == labels[0]).all()
        assert (labels[len(faces):] == labels[len(faces)]).all()
        assert labels[0] != labels[len(faces)]

    def test_object_keeps_largest(self):
        verts, faces = make_icosphere(2)  # large sphere
        small_v, small_f = make_icosphere(0)
        small_v = small_v + 10.0

        all_verts = np.concatenate([verts, small_v])
        all_faces = np.concatenate([faces, small_f + len(verts)])

        out_verts, out_faces = cleanup_with_connected_components(
            all_verts, all_faces, is_object=True)

        assert len(out_faces) == len(faces)
        assert (np.linalg.norm(out_verts, axis=-1) < 2.0).all()

    def test_background_keeps_big_components(self):
        verts, faces = make_icosphere(1)  # 80 faces
        tiny_v = np.array([[10, 0, 0], [11, 0, 0], [10, 1, 0]], dtype=np.float64)
        tiny_f = np.array([[0, 1, 2]]) + len(verts)

        all_verts = np.concatenate([verts, tiny_v])
        all_faces = np.concatenate([faces, tiny_f])

        out_verts, out_faces = cleanup_with_connected_components(
            all_verts, all_faces, is_object=False, min_components=5)

        assert len(out_faces) == len(faces)


class TestTriangulation:
    def test_grid_triangulation(self):
        xs, ys = np.meshgrid(np.arange(5), np.arange(5))
        points = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(float)

        faces = triangulate_points(points)
        # A 5x5 grid triangulates into 2 * 4 * 4 = 32 triangles.
        assert len(faces) == 32

    def test_winding_reversed_for_culling(self):
        points = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        faces = triangulate_points(points)
        tri = points[faces[0]]
        # Reversed winding => negative signed area in image coords.
        e1, e2 = tri[1] - tri[0], tri[2] - tri[0]
        signed_area = e1[0] * e2[1] - e1[1] * e2[0]
        assert signed_area < 0

    def test_filter_faces_by_depth(self):
        points = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=float)
        depth = np.array([1.0, 1.0, 1.0, 5.0])  # far outlier
        faces = triangulate_points(points)

        options = MeshFilteringOptions(max_pixel_distance=10, max_depth_distance=0.5)
        kept = filter_faces(points, depth, faces, options)

        assert len(kept) < len(faces)
        assert not np.isin(kept, 3).any()

    def test_filter_faces_by_pixel_distance(self):
        points = np.array([[0, 0], [1, 0], [0, 1], [100, 100]], dtype=float)
        depth = np.ones(4)
        faces = triangulate_points(points)

        options = MeshFilteringOptions(max_pixel_distance=2, max_depth_distance=10)
        kept = filter_faces(points, depth, faces, options)
        assert not np.isin(kept, 3).any()


class TestGridTriangulation:
    def test_matches_delaunay_on_dense_region(self):
        """At default thresholds grid == Delaunay + filtering on a flat blob."""
        from hive_tpu.meshing.triangulate import triangulate_grid

        mask = np.zeros((12, 14), dtype=bool)
        mask[2:10, 3:12] = True
        depth = np.full((12, 14), 2.0)

        options = MeshFilteringOptions()
        points2d, faces, masked_depth = triangulate_grid(mask, depth, options)

        assert len(points2d) == 8 * 9
        assert len(masked_depth) == len(points2d)
        # An 8x9 pixel rectangle has 7*8 interior quads, 2 triangles each.
        assert len(faces) == 2 * 7 * 8

        # Delaunay path on the same region for comparison.
        v, u = mask.nonzero()
        dl_points = np.stack([u, v], axis=-1).astype(float)
        dl_faces = filter_faces(dl_points, depth[mask],
                                triangulate_points(dl_points), options)
        assert len(dl_faces) == len(faces)

    def test_depth_discontinuity_splits_mesh(self):
        from hive_tpu.meshing.triangulate import triangulate_grid

        mask = np.ones((4, 8), dtype=bool)
        depth = np.full((4, 8), 1.0)
        depth[:, 4:] = 3.0  # step edge between columns 3 and 4

        options = MeshFilteringOptions(max_depth_distance=0.1)
        points2d, faces, _ = triangulate_grid(mask, depth, options)

        # No face may straddle the step: u-coords of any face all < 4 or >= 4.
        u = points2d[faces][:, :, 0]
        assert (((u < 4).all(axis=1)) | ((u >= 4).all(axis=1))).all()
        # Both sides still meshed: 3 quad-columns per side x 3 rows x 2 tris.
        assert len(faces) == 2 * (2 * 3 * 3)

    def test_winding_matches_delaunay_convention(self):
        from hive_tpu.meshing.triangulate import triangulate_grid

        mask = np.ones((3, 3), dtype=bool)
        depth = np.ones((3, 3))
        points2d, faces, _ = triangulate_grid(mask, depth, MeshFilteringOptions())

        tris = points2d[faces].astype(float)
        e1 = tris[:, 1] - tris[:, 0]
        e2 = tris[:, 2] - tris[:, 0]
        signed_area = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
        assert (signed_area < 0).all()

    def test_sub_diagonal_pixel_budget_yields_no_faces(self):
        from hive_tpu.meshing.triangulate import triangulate_grid

        mask = np.ones((3, 3), dtype=bool)
        depth = np.ones((3, 3))
        options = MeshFilteringOptions(max_pixel_distance=1)
        points2d, faces, _ = triangulate_grid(mask, depth, options)
        assert len(faces) == 0
        assert len(points2d) == 9

    def test_invalid_pixels_excluded(self):
        from hive_tpu.meshing.triangulate import triangulate_grid

        mask = np.ones((3, 3), dtype=bool)
        mask[1, 1] = False  # hole in the middle
        depth = np.ones((3, 3))
        points2d, faces, _ = triangulate_grid(mask, depth, MeshFilteringOptions())

        assert len(points2d) == 8
        # Every quad touches the hole, so no faces survive.
        assert len(faces) == 0


class TestNativeWeld:
    def test_matches_numpy_unique(self):
        from hive_tpu.native import get_native_lib, weld_unique

        rng = np.random.default_rng(0)
        # Duplicates, zeros, and values using high bit ranges.
        keys = np.concatenate([
            rng.integers(0, 50, 2000).astype(np.uint64),
            rng.integers(0, 2 ** 56, 3000, dtype=np.int64).astype(np.uint64),
            np.zeros(5, np.uint64),
        ])
        rng.shuffle(keys)

        _, np_first, np_inverse = np.unique(keys, return_index=True,
                                            return_inverse=True)
        first, inverse = weld_unique(keys)

        np.testing.assert_array_equal(first, np_first)
        np.testing.assert_array_equal(inverse, np_inverse.reshape(-1))
        # The native path (not the numpy fallback) should be active here.
        assert get_native_lib() is not None

    def test_empty(self):
        from hive_tpu.native import weld_unique

        first, inverse = weld_unique(np.zeros(0, np.uint64))
        assert len(first) == 0 and len(inverse) == 0

    def test_extract_assemble_matches_numpy_path(self):
        """The fused native weld+assembly must reproduce the numpy fallback
        pipeline: faces/colors exactly, positions and normals to f32
        rounding (the native path lerps in f32 like numpy but transforms to
        world coordinates in f64)."""
        import unittest.mock as mock

        from hive_tpu.native import get_native_lib
        from hive_tpu.ops.marching import extract_isosurface

        assert get_native_lib() is not None

        n = 32
        coords = (np.arange(n) + 0.5) / n - 0.5
        x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
        sdf = np.sqrt(x ** 2 + y ** 2 + z ** 2) - 0.35
        tsdf = np.clip(sdf / 0.1, -1.0, 1.0).astype(np.float32)
        weight = np.ones_like(tsdf)
        color = np.random.default_rng(0).integers(
            0, 255, (n, n, n, 3)).astype(np.float32)

        kwargs = dict(origin=np.array([-0.5] * 3), voxel_size=1.0 / n)
        v_nat, f_nat, c_nat, n_nat = extract_isosurface(
            tsdf, weight, color, **kwargs)
        with mock.patch("hive_tpu.native.extract_assemble",
                        return_value=None):
            v_np, f_np, c_np, n_np = extract_isosurface(
                tsdf, weight, color, **kwargs)

        assert len(v_nat) > 1000
        np.testing.assert_array_equal(f_nat, f_np)
        np.testing.assert_array_equal(c_nat, c_np)
        np.testing.assert_allclose(v_nat, v_np, atol=1e-6)
        np.testing.assert_allclose(n_nat, n_np, atol=3e-5)

    def test_oct_average_matches_numpy(self):
        """Native single-pass oct-normal averaging == the numpy reference
        path (decode + bincount + normalize) to f32 tolerance."""
        from hive_tpu.native import get_native_lib, oct_average
        from hive_tpu.ops import marching

        assert get_native_lib() is not None

        rng = np.random.default_rng(1)
        n, num_unique = 5000, 700
        # Include the oct corner/edge cases: 0, 65535 halves.
        packed = rng.integers(0, 2 ** 32, n, dtype=np.uint64).astype(np.uint32)
        packed[:4] = [0, 0xFFFF, 0xFFFF0000, 0xFFFFFFFF]
        inverse = rng.integers(0, num_unique, n).astype(np.int64)
        inverse[:num_unique] = np.arange(num_unique)  # every rank hit

        native = oct_average(packed, inverse, num_unique)

        # numpy reference: force the fallback branch.
        import unittest.mock as mock
        with mock.patch("hive_tpu.native.oct_average", return_value=None):
            ref = marching._decode_oct_average(packed, inverse, num_unique)

        np.testing.assert_allclose(native, ref, atol=2e-5)


class TestQuantizedGLBEdgeCases:
    def test_rgba_texture_quantizes_without_crash(self, tmp_path):
        """JPEG cannot carry alpha; RGBA textures must stay PNG, not crash."""
        rng = np.random.default_rng(4)
        verts = rng.uniform(0, 1, (16, 3)).astype(np.float32)
        faces = rng.integers(0, 16, (20, 3)).astype(np.int64)
        uv = rng.uniform(0, 1, (16, 2)).astype(np.float32)
        texture = rng.integers(0, 256, (8, 8, 4)).astype(np.uint8)  # RGBA

        mesh = TriangleMesh(vertices=verts, faces=faces, uv=uv, texture=texture)
        scene = Scene()
        scene.add_geometry(mesh, node_name="frame")

        path = str(tmp_path / "rgba.glb")
        export_scene(scene, path, quantize=True)
        out = load_glb(path).geometry["frame"]
        assert out.texture is not None

    def test_cameras_survive_quantize_glb(self, tmp_path):
        import json as json_mod
        import struct as struct_mod

        from hive_tpu.meshing.gltf import quantize_glb

        verts, faces = make_icosphere(1)
        scene = Scene(camera_resolution=(640, 480), camera_focal=(580.0, 580.0))
        scene.add_geometry(TriangleMesh(vertices=verts.astype(np.float32),
                                        faces=faces), node_name="000000")

        path = str(tmp_path / "cam.glb")
        export_scene(scene, path)

        def read_json(p):
            with open(p, "rb") as fh:
                fh.seek(12)
                json_len, _ = struct_mod.unpack("<II", fh.read(8))
                return json_mod.loads(fh.read(json_len))

        assert "cameras" in read_json(path)
        quantize_glb(path)
        gltf = read_json(path)
        assert "cameras" in gltf
        assert gltf["cameras"][0]["type"] == "perspective"
        # File still loads after the JSON patch.
        assert load_glb(path).node_names == ["000000"]

    def test_foreign_node_transforms_not_applied(self, tmp_path):
        """Plain (non-quantized) glTF node translation/scale must be left
        alone — we don't model rotations, so partially applying TRS would
        corrupt foreign files."""
        import json as json_mod
        import struct as struct_mod

        verts, faces = make_icosphere(0)
        scene = Scene()
        scene.add_geometry(TriangleMesh(vertices=verts.astype(np.float32),
                                        faces=faces), node_name="n")
        path = str(tmp_path / "foreign.glb")
        export_scene(scene, path)

        # Inject a node transform as a foreign exporter would.
        with open(path, "rb") as fh:
            header = fh.read(12)
            json_len, _ = struct_mod.unpack("<II", fh.read(8))
            gltf = json_mod.loads(fh.read(json_len))
            rest = fh.read()
        gltf["nodes"][0]["translation"] = [5.0, 0.0, 0.0]
        gltf["nodes"][0]["scale"] = [2.0, 2.0, 2.0]
        blob = json_mod.dumps(gltf, separators=(",", ":")).encode()
        blob += b" " * ((-len(blob)) % 4)
        with open(path, "wb") as fh:
            fh.write(struct_mod.pack("<III", 0x46546C67, 2,
                                     12 + 8 + len(blob) + len(rest)))
            fh.write(struct_mod.pack("<II", len(blob), 0x4E4F534A))
            fh.write(blob)
            fh.write(rest)

        out = load_glb(path).geometry["n"]
        np.testing.assert_allclose(out.vertices, verts.astype(np.float32),
                                   atol=1e-6)


class TestPLYFormats:
    def test_mixed_polygon_sizes_fan_triangulate(self, tmp_path):
        """Non-uniform face lists (quads + tris) bypass the bulk triangle
        decode and fan-triangulate correctly."""
        import struct

        header = (b"ply\nformat binary_little_endian 1.0\n"
                  b"element vertex 5\n"
                  b"property float x\nproperty float y\nproperty float z\n"
                  b"element face 2\n"
                  b"property list uchar int vertex_indices\nend_header\n")
        verts = np.arange(15, dtype="<f4").tobytes()
        face_blob = (struct.pack("<B4i", 4, 0, 1, 2, 3)
                     + struct.pack("<B3i", 3, 0, 2, 4))

        path = str(tmp_path / "mixed.ply")
        with open(path, "wb") as fh:
            fh.write(header + verts + face_blob)

        mesh = load_ply(path)
        assert mesh.faces.tolist() == [[0, 1, 2], [0, 2, 3], [0, 2, 4]]


class TestClusteringFallback:
    def test_unreachable_target_returns_coarsest_grid(self):
        """When even the coarsest grid exceeds target_faces, the fallback
        must return the FEWEST-faces result (the old init returned the
        finest grid — 7962 faces for target 2 in the review repro)."""
        from hive_tpu.meshing.decimate import _decimate_clustering

        verts, faces = make_icosphere(3)
        out_verts, out_faces = _decimate_clustering(
            verts.astype(np.float32), faces, target_faces=2)
        # 2^3 cells can hold at most 8 distinct vertices.
        assert len(out_verts) <= 8
        assert len(out_faces) < len(faces) // 10


class TestNormalTransform:
    def test_nonuniform_scale_uses_inverse_transpose(self):
        """Normals transform by the inverse-transpose of the linear part:
        stretching x must tilt a diagonal normal AWAY from x, not toward
        it (the old raw-linear transform did the opposite)."""
        from hive_tpu.meshing.mesh import TriangleMesh

        n = np.array([[1.0, 1.0, 0.0]]) / np.sqrt(2.0)
        mesh = TriangleMesh(
            vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
            faces=np.array([[0, 1, 2]], np.int64),
            vertex_normals=n.astype(np.float32))

        transform = np.diag([2.0, 1.0, 1.0, 1.0])
        mesh.apply_transform(transform)

        out = mesh.vertex_normals[0]
        # inverse-transpose: (0.5, 1, 0)/norm — the y component dominates.
        assert out[1] > out[0] > 0
        np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-6)
