"""PnP visual odometry tests: recover a known camera motion from synthetic
textured RGB-D frames."""

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from hive_tpu.geometric import Trajectory
from hive_tpu.sfm import PnPOdometry, estimate_camera_poses_native

WIDTH, HEIGHT = 320, 240
K = np.array([[260.0, 0, (WIDTH - 1) / 2], [0, 260.0, (HEIGHT - 1) / 2], [0, 0, 1.0]])


def make_textured_scene(rng, num_points=4000):
    """A random textured 'wall' point cloud with per-point grayscale values."""
    points = rng.uniform([-2.5, -2.0, 3.0], [2.5, 2.0, 4.5], size=(num_points, 3))
    intensities = rng.integers(50, 255, size=num_points)
    return points, intensities


def render_frame(points, intensities, world_to_cam):
    """Splat the point cloud into a gray image + depth map (closest point wins)."""
    cam = points @ world_to_cam[:3, :3].T + world_to_cam[:3, 3]
    depth = cam[:, 2]

    uvw = cam @ K.T
    u = np.round(uvw[:, 0] / depth).astype(int)
    v = np.round(uvw[:, 1] / depth).astype(int)

    visible = (depth > 0.1) & (u >= 0) & (u < WIDTH) & (v >= 0) & (v < HEIGHT)

    image = np.zeros((HEIGHT, WIDTH), dtype=np.uint8)
    depth_map = np.zeros((HEIGHT, WIDTH), dtype=np.float32)

    order = np.argsort(-depth[visible])  # far first so near overwrites
    idx = np.nonzero(visible)[0][order]

    image[v[idx], u[idx]] = intensities[idx]
    depth_map[v[idx], u[idx]] = depth[idx]

    # Blur slightly so SIFT has gradients to latch onto.
    image = cv2.GaussianBlur(image, (5, 5), 1.0)

    return image, depth_map


def make_sequence(num_frames=5, seed=0):
    rng = np.random.default_rng(seed)
    points, intensities = make_textured_scene(rng)

    poses = []
    frames = []
    depths = []

    for i in range(num_frames):
        # Slow sideways translation + slight yaw.
        R = Rotation.from_euler("y", 1.0 * i, degrees=True).as_matrix()
        t = np.array([-0.05 * i, 0.0, 0.0])

        world_to_cam = np.eye(4)
        world_to_cam[:3, :3] = R
        world_to_cam[:3, 3] = t

        image, depth_map = render_frame(points, intensities, world_to_cam)

        poses.append(world_to_cam)
        frames.append(image)
        depths.append(depth_map)

    return frames, depths, np.stack(poses)


class TestPnPOdometry:
    def test_relative_pose_recovery(self):
        frames, depths, gt = make_sequence(num_frames=2)

        odometry = PnPOdometry(K)
        relative = odometry.relative_pose(frames[0], depths[0], frames[1])

        assert relative is not None

        expected = gt[1] @ np.linalg.inv(gt[0])
        np.testing.assert_allclose(relative[:3, 3], expected[:3, 3], atol=0.02)
        np.testing.assert_allclose(relative[:3, :3], expected[:3, :3], atol=0.02)

    def test_trajectory_chain(self):
        frames, depths, gt = make_sequence(num_frames=5)

        odometry = PnPOdometry(K)
        trajectory = odometry.estimate_trajectory(frames, depths)

        assert len(trajectory) == 5

        gt_trajectory = Trajectory.from_homogenous_transforms(gt)
        ate = gt_trajectory.calculate_ate(trajectory)
        rmse = np.sqrt(np.mean(np.sum(ate ** 2, axis=-1)))

        assert rmse < 0.05

    def test_metric_scale_recovered(self):
        """PnP against metric depth recovers translation magnitude (the COLMAP
        path needs a separate scale-alignment step for this)."""
        frames, depths, gt = make_sequence(num_frames=3)

        odometry = PnPOdometry(K)
        trajectory = odometry.estimate_trajectory(frames, depths)

        est_step = np.linalg.norm(np.diff(trajectory.positions, axis=0), axis=-1)
        gt_positions = Trajectory.from_homogenous_transforms(gt).positions
        gt_step = np.linalg.norm(np.diff(gt_positions, axis=0), axis=-1)

        np.testing.assert_allclose(est_step, gt_step, rtol=0.3, atol=0.01)

    def test_untextured_pair_returns_none(self):
        blank = np.zeros((HEIGHT, WIDTH), dtype=np.uint8)
        depth = np.ones((HEIGHT, WIDTH), dtype=np.float32)

        odometry = PnPOdometry(K)
        assert odometry.relative_pose(blank, depth, blank) is None

    def test_driver_with_frame_step(self):
        frames, depths, gt = make_sequence(num_frames=6)
        rgb = [np.stack([f] * 3, axis=-1) for f in frames]

        trajectory = estimate_camera_poses_native(rgb, depths, K, frame_step=2)

        assert len(trajectory) == 6
        # First pose is the identity after normalisation.
        np.testing.assert_allclose(trajectory[0][:4], [0, 0, 0, 1], atol=1e-6)
