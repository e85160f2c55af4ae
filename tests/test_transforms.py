"""Core transform tests using SciPy's Rotation as the oracle (the reference's
test strategy, tests/quaternion.py:35-99, extended to the full SE(3) API)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

from hive_tpu.core import transforms as T


def random_quats(rng, n=16):
    return Rotation.random(n, random_state=np.random.RandomState(7)).as_quat()


class TestQuaternions:
    def test_normalize(self, rng):
        q = rng.normal(size=(8, 4))
        out = np.asarray(T.quat_normalize(jnp.asarray(q)))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)

    def test_multiply_matches_scipy(self, rng):
        q1 = random_quats(rng)
        q2 = Rotation.random(16, random_state=np.random.RandomState(8)).as_quat()

        ours = np.asarray(T.quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
        scipy_result = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_rotvec()

        np.testing.assert_allclose(Rotation.from_quat(ours).as_rotvec(),
                                   scipy_result, atol=1e-6)

    def test_conjugate_is_inverse(self, rng):
        q = random_quats(rng)
        identity = np.asarray(T.quat_multiply(jnp.asarray(q),
                                              T.quat_conjugate(jnp.asarray(q))))
        np.testing.assert_allclose(identity[:, :3], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.abs(identity[:, 3]), 1.0, atol=1e-6)

    def test_rotate_matches_scipy(self, rng):
        q = random_quats(rng)
        v = rng.normal(size=(16, 3))

        ours = np.asarray(T.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        expected = Rotation.from_quat(q).apply(v)

        np.testing.assert_allclose(ours, expected, atol=1e-5)

    def test_quat_to_matrix_matches_scipy(self, rng):
        q = random_quats(rng)
        ours = np.asarray(T.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(ours, Rotation.from_quat(q).as_matrix(), atol=1e-6)

    def test_matrix_to_quat_roundtrip(self, rng):
        q = random_quats(rng)
        m = Rotation.from_quat(q).as_matrix()
        recovered = np.asarray(T.matrix_to_quat(jnp.asarray(m)))

        # Compare as rotations (sign of q is ambiguous).
        np.testing.assert_allclose(Rotation.from_quat(recovered).as_matrix(), m, atol=1e-5)

    def test_matrix_to_quat_near_degenerate(self):
        # 180-degree rotations exercise every branch of Shepperd's method.
        for axis in np.eye(3):
            m = Rotation.from_rotvec(np.pi * axis).as_matrix()
            q = np.asarray(T.matrix_to_quat(jnp.asarray(m[None])))[0]
            np.testing.assert_allclose(Rotation.from_quat(q).as_matrix(), m, atol=1e-5)

    def test_slerp_matches_scipy(self, rng):
        q = random_quats(rng, n=2)
        times = np.linspace(0.0, 1.0, 11)

        slerp = Slerp([0.0, 1.0], Rotation.from_quat(q))
        expected = slerp(times).as_matrix()

        q0 = jnp.asarray(np.tile(q[0], (11, 1)))
        q1 = jnp.asarray(np.tile(q[1], (11, 1)))
        ours = np.asarray(T.quat_slerp(q0, q1, jnp.asarray(times[:, None])))

        np.testing.assert_allclose(Rotation.from_quat(ours).as_matrix(), expected, atol=1e-5)


class TestPoses:
    def _random_poses(self, n=8):
        rot = Rotation.random(n, random_state=np.random.RandomState(3))
        t = np.random.RandomState(4).normal(size=(n, 3))
        return np.concatenate([rot.as_quat(), t], axis=-1)

    def test_pose_matrix_roundtrip(self):
        poses = self._random_poses()
        m = np.asarray(T.pose_to_matrix(jnp.asarray(poses)))
        assert m.shape == (8, 4, 4)
        back = np.asarray(T.matrix_to_pose(jnp.asarray(m)))
        m2 = np.asarray(T.pose_to_matrix(jnp.asarray(back)))
        np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_pose_inverse(self):
        poses = self._random_poses()
        m = np.asarray(T.pose_to_matrix(jnp.asarray(poses)))
        inv = np.asarray(T.pose_to_matrix(T.pose_inverse(jnp.asarray(poses))))
        np.testing.assert_allclose(m @ inv, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)

    def test_pose_compose_matches_matrix_product(self):
        a = self._random_poses()
        b = self._random_poses()[::-1].copy()

        ab = np.asarray(T.pose_to_matrix(T.pose_compose(jnp.asarray(a), jnp.asarray(b))))
        expected = (np.asarray(T.pose_to_matrix(jnp.asarray(a)))
                    @ np.asarray(T.pose_to_matrix(jnp.asarray(b))))

        np.testing.assert_allclose(ab, expected, atol=1e-5)


class TestProjection:
    def setup_method(self):
        self.K = np.array([[580.0, 0.0, 319.5], [0.0, 580.0, 239.5], [0.0, 0.0, 1.0]])
        rot = Rotation.from_euler("xyz", [5.0, -3.0, 10.0], degrees=True)
        self.R = rot.as_matrix()
        self.t = np.array([[0.1], [-0.2], [0.3]])

    def test_project_unproject_roundtrip(self, rng):
        points = rng.uniform(-1.0, 1.0, size=(64, 3))
        points[:, 2] += 5.0  # keep in front of the camera

        uv, depth = T.project_points(jnp.asarray(points), jnp.asarray(self.K),
                                     jnp.asarray(self.R), jnp.asarray(self.t))
        recovered = np.asarray(T.unproject_pixels(uv, depth, jnp.asarray(self.K),
                                                  jnp.asarray(self.R), jnp.asarray(self.t)))

        np.testing.assert_allclose(recovered, points, atol=1e-4)

    def test_dense_unprojection_matches_pointwise(self, rng):
        h, w = 48, 64
        depth = rng.uniform(0.5, 5.0, size=(h, w)).astype(np.float32)
        K = self.K.astype(np.float32)

        cloud = np.asarray(T.unproject_depth_map(jnp.asarray(depth), jnp.asarray(K),
                                                 jnp.asarray(self.R.astype(np.float32)),
                                                 jnp.asarray(self.t.astype(np.float32)),
                                                 height=h, width=w))
        assert cloud.shape == (h, w, 3)

        vs, us = np.nonzero(depth > 0)
        pts2d = np.stack([us, vs], axis=-1).astype(np.float32)
        expected = np.asarray(T.unproject_pixels(jnp.asarray(pts2d),
                                                 jnp.asarray(depth[vs, us]),
                                                 jnp.asarray(K),
                                                 jnp.asarray(self.R.astype(np.float32)),
                                                 jnp.asarray(self.t.astype(np.float32))))
        np.testing.assert_allclose(cloud[vs, us], expected, atol=1e-3)
