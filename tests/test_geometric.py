"""Host geometry API tests (Trajectory, CameraMatrix, projection helpers),
with SciPy as the rotation oracle."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from hive_tpu import geometric as G


def make_trajectory(n=10, seed=0):
    rot = Rotation.random(n, random_state=np.random.RandomState(seed))
    t = np.random.RandomState(seed + 1).normal(size=(n, 3))
    return G.Trajectory(np.concatenate([rot.as_quat(), t], axis=-1))


class TestPoseVecMat:
    def test_roundtrip(self):
        rot = Rotation.from_euler("xyz", [30.0, -20.0, 95.0], degrees=True)
        pose = np.hstack([rot.as_quat(), [1.0, 2.0, 3.0]])

        m = G.pose_vec2mat(pose)
        np.testing.assert_allclose(m[:3, :3], rot.as_matrix(), atol=1e-6)
        np.testing.assert_allclose(m[:3, 3], [1.0, 2.0, 3.0])

        back = G.pose_mat2vec(m)
        np.testing.assert_allclose(G.pose_vec2mat(back), m, atol=1e-5)

    def test_add_subtract_inverse(self):
        a = np.hstack([Rotation.from_euler("x", 30, degrees=True).as_quat(), [1, 0, 0]])
        b = np.hstack([Rotation.from_euler("y", -45, degrees=True).as_quat(), [0, 2, 0]])

        summed = G.add_pose(a, b)
        recovered = G.subtract_pose(summed, b)
        np.testing.assert_allclose(G.pose_vec2mat(recovered), G.pose_vec2mat(a), atol=1e-5)

    def test_identity(self):
        np.testing.assert_allclose(G.pose_vec2mat(G.get_identity_pose()), np.eye(4))


class TestProjectionHelpers:
    def setup_method(self):
        self.K = np.array([[580.0, 0, 319.5], [0, 580.0, 239.5], [0, 0, 1.0]])
        self.R = Rotation.from_euler("xyz", [3, 5, -2], degrees=True).as_matrix()
        self.t = np.array([[0.2], [0.1], [-0.3]])

    def test_world2image_image2world_roundtrip(self, rng):
        points = rng.uniform(-2, 2, size=(100, 3))
        points[:, 2] += 6.0

        uv, depth = G.world2image(points, self.K, self.R, self.t, dtype=np.float64)
        recovered = G.image2world(uv, depth, self.K, self.R, self.t)

        np.testing.assert_allclose(recovered, points, atol=1e-8)

    def test_point_cloud_from_depth_shapes(self, rng):
        depth = rng.uniform(0.5, 3.0, size=(32, 32))
        depth[:4, :] = 0.0  # invalid region
        mask = np.ones_like(depth, dtype=bool)
        mask[:, :8] = False

        cloud = G.point_cloud_from_depth(depth, mask, self.K, self.R, self.t)
        assert cloud.shape == ((32 - 4) * (32 - 8), 3)

    def test_point_cloud_from_rgbd_colors(self, rng):
        depth = rng.uniform(0.5, 3.0, size=(8, 8))
        rgb = (rng.uniform(0, 255, size=(8, 8, 3))).astype(np.uint8)
        mask = np.ones_like(depth, dtype=bool)

        cloud, colours = G.point_cloud_from_rgbd(rgb, depth, mask, self.K, self.R, self.t)
        assert cloud.shape == (64, 3)
        assert colours.shape == (64, 4)
        assert (colours[:, 3] == 255).all()


class TestTrajectory:
    def test_normalise_first_pose_identity(self):
        traj = make_trajectory().normalise()
        np.testing.assert_allclose(traj.values[0], G.get_identity_pose(), atol=1e-6)

    def test_normalise_preserves_relative_poses(self):
        traj = make_trajectory()
        norm = traj.normalise()

        rel_before = np.linalg.inv(traj.to_homogenous_transforms()[2]) \
            @ traj.to_homogenous_transforms()[5]
        rel_after = np.linalg.inv(norm.to_homogenous_transforms()[2]) \
            @ norm.to_homogenous_transforms()[5]

        np.testing.assert_allclose(rel_before, rel_after, atol=1e-4)

    def test_inverse_roundtrip(self):
        traj = make_trajectory()
        double_inv = traj.inverse().inverse()
        np.testing.assert_allclose(double_inv.to_homogenous_transforms(),
                                   traj.to_homogenous_transforms(), atol=1e-4)

    def test_homogeneous_roundtrip(self):
        traj = make_trajectory()
        again = G.Trajectory.from_homogenous_transforms(traj.to_homogenous_transforms())
        np.testing.assert_allclose(again.to_homogenous_transforms(),
                                   traj.to_homogenous_transforms(), atol=1e-5)

    def test_ate_zero_for_identical(self):
        traj = make_trajectory()
        err = traj.calculate_ate(traj.copy())
        np.testing.assert_allclose(err, 0.0, atol=1e-5)

    def test_rpe_zero_for_identical(self):
        traj = make_trajectory()
        rot_err, trans_err = traj.calculate_rpe(traj.copy())
        assert rot_err.shape == (len(traj) - 1,)
        np.testing.assert_allclose(rot_err, 0.0, atol=1e-3)
        np.testing.assert_allclose(trans_err, 0.0, atol=1e-4)

    def test_rpe_detects_perturbation(self):
        traj = make_trajectory()
        other = traj.copy()
        other.values[5, 4:] += 0.5
        _, trans_err = traj.calculate_rpe(other)
        assert trans_err.max() > 0.1

    def test_length_mismatch_raises(self):
        with pytest.raises(RuntimeError):
            make_trajectory(10).calculate_ate(make_trajectory(5))

    def test_save_load_roundtrip(self, tmp_path):
        traj = make_trajectory()
        path = str(tmp_path / "trajectory.txt")
        traj.save(path)
        loaded = G.Trajectory.load(path)
        np.testing.assert_allclose(loaded.values, traj.values, atol=1e-6)

    def test_interpolation_hits_keyframes(self):
        rot = Rotation.random(3, random_state=np.random.RandomState(5))
        keys = {0: np.hstack([rot[0].as_quat(), [0, 0, 0]]),
                5: np.hstack([rot[1].as_quat(), [1, 1, 1]]),
                9: np.hstack([rot[2].as_quat(), [2, 0, 1]])}

        traj = G.Trajectory.create_by_interpolating(keys, frame_count=10)
        assert len(traj) == 10
        for idx, pose in keys.items():
            np.testing.assert_allclose(traj[idx], pose, atol=1e-6)

        # Midpoint translation is the lerp of its bracketing keys.
        np.testing.assert_allclose(traj[7][4:], (keys[5][4:] + keys[9][4:]) / 2, atol=0.26)

    def test_interpolation_missing_endpoint_raises(self):
        with pytest.raises(RuntimeError):
            G.Trajectory.create_by_interpolating({0: G.get_identity_pose()}, frame_count=5)

    def test_scale_trajectory(self):
        traj = make_trajectory()
        scaled = traj.scale_trajectory(2.0)
        np.testing.assert_allclose(scaled.positions, traj.positions * 2.0)
        np.testing.assert_allclose(scaled.rotations, traj.rotations)


class TestCameraMatrix:
    def test_matrix_layout(self):
        cam = G.CameraMatrix(fx=580, fy=580, cx=319.5, cy=239.5, width=640, height=480)
        expected = np.array([[580, 0, 319.5], [0, 580, 239.5], [0, 0, 1]])
        np.testing.assert_allclose(cam.matrix, expected)

    def test_scale(self):
        cam = G.CameraMatrix(fx=580, fy=580, cx=319.5, cy=239.5, width=640, height=480)
        scaled = cam.scale((240, 320))
        assert scaled.width == 320 and scaled.height == 240
        np.testing.assert_allclose(scaled.fx, 290.0)
        np.testing.assert_allclose(scaled.cy, 119.75)

    def test_transpose(self):
        cam = G.CameraMatrix(fx=500, fy=600, cx=320, cy=240, width=640, height=480)
        t = cam.transpose()
        assert (t.fx, t.fy, t.cx, t.cy, t.width, t.height) == (600, 500, 240, 320, 480, 640)

    def test_from_matrix_roundtrip(self):
        cam = G.CameraMatrix(fx=580, fy=570, cx=319.5, cy=239.5, width=640, height=480)
        again = G.CameraMatrix.from_matrix(cam.matrix, (480, 640))
        assert again == cam

    def test_fov(self):
        cam = G.CameraMatrix(fx=580, fy=580, cx=319.5, cy=239.5, width=640, height=480)
        assert 0.0 < cam.fov_y < np.pi


class TestQuaternionClass:
    """The reference's quaternion test-vs-scipy oracle (tests/quaternion.py)."""

    def _to_scipy(self, quat: G.Quaternion) -> Rotation:
        return Rotation.from_quat(np.asarray(quat.values.T))

    def _from_scipy(self, rotation: Rotation) -> G.Quaternion:
        return G.Quaternion(rotation.as_quat().T)

    def test_normalise(self):
        q = Rotation.from_euler("xyz", [[90, 0, 0], [0, 90, 0], [0, 0, 90]], degrees=True)
        result = self._to_scipy(self._from_scipy(q).normalise()).as_rotvec()
        np.testing.assert_allclose(q.as_rotvec(), result, atol=1e-6)

    def test_conjugate(self):
        q = Rotation.from_euler("xyz", [[90, 0, 0], [0, 90, 0], [0, 0, 90]], degrees=True)
        result = self._to_scipy(self._from_scipy(q).conjugate())
        np.testing.assert_allclose(q.inv().as_rotvec(), result.as_rotvec(), atol=1e-6)

    def test_multiply_by_conjugate_gives_identity(self):
        q = self._from_scipy(Rotation.from_euler("xyz", [[90, 0, 0]], degrees=True))
        result = np.asarray((q * q.conjugate()).values)
        np.testing.assert_allclose(result, np.array([[0.0], [0.0], [0.0], [1.0]]), atol=1e-6)

    def test_multiplication(self):
        r1 = Rotation.from_euler("xyz", [[90, 0, 0], [0, 90, 0], [0, 0, 90]], degrees=True)
        r2 = Rotation.from_euler("xyz", [[45, 0, 0], [0, 45, 0], [0, 0, 45]], degrees=True)

        result = self._to_scipy(self._from_scipy(r1) * self._from_scipy(r2)).as_rotvec()
        np.testing.assert_allclose((r1 * r2).as_rotvec(), result, atol=1e-6)

    def test_rotating_vector(self):
        r = Rotation.from_euler("xyz", [[90, 0, 0], [0, 90, 0], [0, 0, 90]], degrees=True)
        v = np.eye(3)

        ours = np.asarray(self._from_scipy(r).apply(v))
        np.testing.assert_allclose(r.apply(v.T), ours.T, atol=1e-6)

    def test_invalid_shape_raises(self):
        with pytest.raises(ValueError):
            G.Quaternion(np.zeros((3, 5)))
