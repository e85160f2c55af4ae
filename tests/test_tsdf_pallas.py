"""Pallas TSDF kernel: interpreter-mode equivalence vs the XLA scan path."""

import jax.numpy as jnp
import numpy as np

from hive_tpu.ops.tsdf import TSDFVolume
from hive_tpu.ops.tsdf_pallas import (integrate_frames_pallas, make_frame_params,
                                      pack_colors)

K = np.array([[60.0, 0.0, 31.5], [0.0, 60.0, 23.5], [0.0, 0.0, 1.0]], dtype=np.float32)
H, W = 48, 64


def _workload(num_frames=3):
    rng = np.random.default_rng(0)
    depths = rng.uniform(0.8, 2.5, size=(num_frames, H, W)).astype(np.float32)
    colors = rng.integers(0, 255, size=(num_frames, H, W, 3)).astype(np.uint8)

    poses = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
    poses[:, 0, 3] = np.linspace(0.0, 0.2, num_frames)  # cam-to-world shifts

    return depths, colors, poses


class TestPallasKernelInterpret:
    def test_matches_xla_path(self):
        depths, colors, poses = _workload()

        bounds = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 2.0]], dtype=np.float32)
        volume = TSDFVolume(bounds, voxel_size=0.125)  # dims (16, 16, 16)
        volume.integrate_frames(colors, depths, K, poses)
        tsdf_ref, weight_ref, color_ref = volume.get_volume()

        world_to_cams = np.linalg.inv(poses)
        params = make_frame_params(K, world_to_cams, volume.origin, volume.voxel_size)

        tsdf_sum, weight, r_sum, g_sum, b_sum = integrate_frames_pallas(
            jnp.asarray(depths), jnp.asarray(pack_colors(colors)),
            jnp.asarray(params), dims=volume.dims, height=H, width=W,
            trunc_margin=volume.trunc_margin, block_x=8, interpret=True)

        tsdf_sum = np.asarray(tsdf_sum)
        weight = np.asarray(weight)
        color_sum = np.stack([np.asarray(r_sum), np.asarray(g_sum),
                              np.asarray(b_sum)], axis=-1)

        # Finalise: mean where observed, +1 (far) where not.
        safe_w = np.maximum(weight, 1e-12)
        tsdf = np.where(weight > 0, tsdf_sum / safe_w, 1.0)
        color = color_sum / safe_w[..., None]

        np.testing.assert_array_equal(weight, weight_ref)
        np.testing.assert_allclose(tsdf, tsdf_ref, atol=1e-5)

        observed = weight > 0
        np.testing.assert_allclose(color[observed], color_ref[observed], atol=0.5)

    def test_unobserved_voxels_zero_weight(self):
        depths, colors, poses = _workload(num_frames=1)
        depths[:] = 0.0  # fully invalid depth

        bounds = np.array([[-1.0, 1.0], [-1.0, 1.0], [0.0, 2.0]], dtype=np.float32)
        volume = TSDFVolume(bounds, voxel_size=0.125)
        params = make_frame_params(K, np.linalg.inv(poses), volume.origin,
                                   volume.voxel_size)

        _, weight, _, _, _ = integrate_frames_pallas(
            jnp.asarray(depths), jnp.asarray(pack_colors(colors)),
            jnp.asarray(params), dims=volume.dims, height=H, width=W,
            trunc_margin=volume.trunc_margin, block_x=8, interpret=True)

        assert np.asarray(weight).sum() == 0


class TestPacking:
    def test_pack_colors_roundtrip(self):
        rng = np.random.default_rng(1)
        rgb = rng.integers(0, 255, size=(2, 4, 4, 3)).astype(np.uint8)
        packed = pack_colors(rgb)

        np.testing.assert_array_equal(packed & 0xFF, rgb[..., 0])
        np.testing.assert_array_equal((packed >> 8) & 0xFF, rgb[..., 1])
        np.testing.assert_array_equal((packed >> 16) & 0xFF, rgb[..., 2])
