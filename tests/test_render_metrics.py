"""Tests for the TPU rasterizer and the image metrics."""

import numpy as np
import pytest

from hive_tpu.meshing.mesh import TriangleMesh
from hive_tpu.meshing.render import render_mesh
from hive_tpu.metrics import batch_ssim_psnr, depth_mae, depth_rmse, mifd, psnr, ssim

K = np.array([[100.0, 0, 63.5], [0, 100.0, 47.5], [0, 0, 1.0]])
WIDTH, HEIGHT = 128, 96


def make_quad(z=2.0, half=1.0, color=(255, 0, 0)):
    """A camera-facing square at depth z."""
    vertices = np.array([
        [-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z],
    ], dtype=np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    colors = np.tile(np.asarray(color, dtype=np.uint8), (4, 1))
    return TriangleMesh(vertices=vertices, faces=faces, vertex_colors=colors)


class TestRasterizer:
    def test_quad_renders_centered(self):
        mesh = make_quad(z=2.0, half=0.5, color=(0, 200, 0))
        image, depth = render_mesh(mesh, K, np.eye(3), np.zeros((3, 1)), WIDTH, HEIGHT)

        assert image.shape == (HEIGHT, WIDTH, 3)
        # Centre pixel is covered and green; corners are background.
        assert image[HEIGHT // 2, WIDTH // 2, 1] > 150
        assert (image[0, 0] == 0).all()
        np.testing.assert_allclose(depth[HEIGHT // 2, WIDTH // 2], 2.0, atol=0.01)
        assert depth[0, 0] == 0.0

    def test_z_buffer_prefers_nearer_triangle(self):
        near = make_quad(z=1.0, half=0.3, color=(255, 0, 0))
        far = make_quad(z=3.0, half=0.3, color=(0, 0, 255))

        merged = TriangleMesh(
            vertices=np.concatenate([far.vertices, near.vertices]),
            faces=np.concatenate([far.faces, near.faces + 4]),
            vertex_colors=np.concatenate([far.vertex_colors, near.vertex_colors]))

        image, depth = render_mesh(merged, K, np.eye(3), np.zeros((3, 1)), WIDTH, HEIGHT)

        # The near (red) quad must win at the centre.
        assert image[HEIGHT // 2, WIDTH // 2, 0] > 150
        np.testing.assert_allclose(depth[HEIGHT // 2, WIDTH // 2], 1.0, atol=0.01)

    def test_behind_camera_not_rendered(self):
        mesh = make_quad(z=-2.0)
        image, depth = render_mesh(mesh, K, np.eye(3), np.zeros((3, 1)), WIDTH, HEIGHT)
        assert (depth == 0).all()

    def test_empty_mesh(self):
        image, depth = render_mesh(TriangleMesh(), K, np.eye(3), np.zeros((3, 1)),
                                   WIDTH, HEIGHT)
        assert (image == 0).all()

    def test_projected_size_matches_pinhole(self):
        # A quad of half-extent 0.5 at z=2 spans (2*0.5/2)*fx = 50 px.
        mesh = make_quad(z=2.0, half=0.5)
        _, depth = render_mesh(mesh, K, np.eye(3), np.zeros((3, 1)), WIDTH, HEIGHT)

        covered_cols = np.nonzero(depth[HEIGHT // 2] > 0)[0]
        assert covered_cols.size == pytest.approx(50, abs=3)


class TestMetrics:
    def test_psnr_identity_and_ordering(self, rng):
        a = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
        noisy_small = np.clip(a + rng.normal(0, 2, a.shape), 0, 255).astype(np.uint8)
        noisy_big = np.clip(a + rng.normal(0, 30, a.shape), 0, 255).astype(np.uint8)

        assert psnr(a, a) == float("inf")
        assert psnr(a, noisy_small) > psnr(a, noisy_big)

    def test_ssim_identity_and_range(self, rng):
        a = rng.integers(0, 255, size=(64, 64)).astype(np.uint8)
        b = np.clip(a.astype(int) + 40, 0, 255).astype(np.uint8)

        assert ssim(a, a) == pytest.approx(1.0)
        assert -1.0 <= ssim(a, b) < 1.0

    def test_batch_ssim_psnr_matches_host(self, rng):
        a = rng.integers(0, 255, size=(2, 48, 48, 3)).astype(np.uint8)
        noise = rng.normal(0, 10, a.shape)
        b = np.clip(a + noise, 0, 255).astype(np.uint8)

        ssim_batch, psnr_batch = batch_ssim_psnr(a, b)

        for i in range(2):
            assert psnr_batch[i] == pytest.approx(psnr(a[i], b[i]), abs=0.1)
            # Reflect-padded device conv matches the host cv2 BORDER_REFLECT
            # path to float precision (zero 'SAME' padding used to disagree
            # by ~0.03 at this size).
            assert ssim_batch[i] == pytest.approx(ssim(a[i], b[i]), abs=1e-3)

    def test_mifd_identical_is_zero(self, rng):
        # A textured image so SIFT finds features.
        a = (rng.uniform(0, 255, size=(128, 128)) > 127).astype(np.uint8) * 255
        import cv2

        a = cv2.GaussianBlur(a, (5, 5), 1.0)
        value = mifd(a, a)

        assert value == pytest.approx(0.0, abs=0.5) or np.isnan(value)

    def test_depth_errors(self):
        target = np.array([[1.0, 2.0], [0.0, 4.0]])
        pred = np.array([[1.5, 2.0], [9.0, 3.0]])

        # The zero-target pixel is excluded from the valid mask.
        assert depth_mae(pred, target) == pytest.approx((0.5 + 0.0 + 1.0) / 3)
        assert depth_rmse(pred, target) == pytest.approx(np.sqrt((0.25 + 0 + 1) / 3))


class TestTexturedRendering:
    def test_per_pixel_texture_sampling(self):
        """A textured quad with a checkerboard texture must render the
        pattern INSIDE triangles — per-vertex texture sampling cannot (the
        whole quad has only 4 vertices)."""
        from hive_tpu.meshing.mesh import TriangleMesh
        from hive_tpu.meshing.render import render_mesh

        # A 1x1 m quad at z=2, facing the camera.
        vertices = np.array([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0],
                             [0.5, 0.5, 2.0], [-0.5, 0.5, 2.0]], np.float64)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        uv = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]],
                      np.float32)

        # 8x8 checkerboard texture (64x64 px).
        cells = (np.indices((8, 8)).sum(axis=0) % 2) * 255
        texture = np.repeat(np.repeat(cells, 8, 0), 8, 1).astype(np.uint8)
        texture = np.stack([texture] * 3, axis=-1)

        mesh = TriangleMesh(vertices=vertices, faces=faces, uv=uv,
                            texture=texture)

        K = np.array([[100.0, 0, 63.5], [0, 100.0, 63.5], [0, 0, 1.0]])
        image, depth = render_mesh(mesh, K, np.eye(3), np.zeros((3, 1)),
                                   width=128, height=128)

        covered = depth > 0
        assert covered.mean() > 0.1

        values = image[covered][:, 0].astype(np.float32)
        # A checkerboard: roughly half dark, half bright pixels.
        dark = (values < 64).mean()
        bright = (values > 192).mean()
        assert dark > 0.3 and bright > 0.3, (dark, bright)

    def test_vertex_colors_still_render(self):
        from hive_tpu.meshing.mesh import TriangleMesh
        from hive_tpu.meshing.render import render_mesh

        vertices = np.array([[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0],
                             [0.0, 0.5, 2.0]], np.float64)
        faces = np.array([[0, 1, 2]], np.int32)
        colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)

        mesh = TriangleMesh(vertices=vertices, faces=faces,
                            vertex_colors=colors)

        K = np.array([[100.0, 0, 31.5], [0, 100.0, 31.5], [0, 0, 1.0]])
        image, depth = render_mesh(mesh, K, np.eye(3), np.zeros((3, 1)),
                                   width=64, height=64)

        covered = depth > 0
        assert covered.sum() > 50
        # The three colour channels all appear.
        assert image[covered].max(axis=0).min() > 100


class TestBinDepth:
    def test_max_depth_value_does_not_crash(self):
        """Depths clamped exactly at max_depth (the NYU cap) fall in the last
        bin instead of indexing out of bounds."""
        from hive_tpu.image_processing import bin_depth

        depth = np.array([[0.0, 5.0], [10.0, 12.5]], dtype=np.float32)
        binned = bin_depth(depth, min_depth=0.0, max_depth=10.0, num_bins=128)

        assert binned.shape == depth.shape
        assert np.all(np.isfinite(binned))
        assert binned[1, 0] == binned[1, 1] == 10.0


class TestMetricSkipNotes:
    """Degraded modes must be labelled, not silently NaN-dropped."""

    def test_lpips_without_weights_is_labelled(self, monkeypatch):
        from hive_tpu import metrics

        monkeypatch.setattr(metrics, "_lpips_model", False)
        notes = metrics.metric_skip_notes(
            {"ssim": [0.5, 0.6], "lpips": [float("nan")] * 3})

        assert notes == {"lpips": "skipped: weights absent"}
        assert not metrics.lpips_available()

    def test_partially_finite_metric_not_labelled(self, monkeypatch):
        from hive_tpu import metrics

        monkeypatch.setattr(metrics, "_lpips_model", False)
        assert metrics.metric_skip_notes({"lpips": [0.1, float("nan")]}) == {}

    def test_non_lpips_all_nan_gets_generic_note(self):
        from hive_tpu import metrics

        notes = metrics.metric_skip_notes({"depth_mae": [float("nan")]})
        assert notes == {"depth_mae": "skipped: all values non-finite"}
