"""Pose optimiser tests.

Oracle: generate a ground-truth trajectory + synthetic 3D landmarks, project
them into frames to build exact correspondences, perturb the trajectory, and
check the optimiser recovers it (lower ATE than the perturbed input).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from hive_tpu.geometric import Trajectory
from hive_tpu.pose_optimisation import (AlignmentType, EarlyStopping, FeatureData,
                                        FeatureSet, FrameSamplingMode, OptimisationOptions,
                                        OptimisationStep, PoseOptimiser, ResidualType,
                                        sample_frame_pairs)


class TestFrameSampling:
    def test_exhaustive(self):
        pairs = sample_frame_pairs(FrameSamplingMode.Exhaustive, 4)
        assert pairs == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

    def test_consecutive(self):
        assert sample_frame_pairs(FrameSamplingMode.Consecutive, 4) \
            == [(0, 1), (1, 2), (2, 3)]

    def test_no_overlap(self):
        assert sample_frame_pairs(FrameSamplingMode.ConsecutiveNoOverlap, 6) \
            == [(0, 1), (2, 3), (4, 5)]
        assert sample_frame_pairs(FrameSamplingMode.ConsecutiveNoOverlapOffset, 6) \
            == [(1, 2), (3, 4)]

    def test_hierarchical(self):
        pairs = sample_frame_pairs(FrameSamplingMode.Hierarchical, 8)
        assert (0, 1) in pairs
        assert (0, 2) in pairs
        assert (0, 4) in pairs
        assert (2, 4) in pairs
        # O(N log N), not O(N^2).
        assert len(pairs) < 8 * 8 / 2


class TestEarlyStopping:
    def test_stops_after_patience(self):
        stopper = EarlyStopping(patience=3, min_difference=0.0)
        assert not stopper.step(1.0)
        for _ in range(3):
            stopper.step(1.0)
        assert stopper.step(1.0)

    def test_improvement_resets(self):
        stopper = EarlyStopping(patience=2, min_difference=0.0)
        stopper.step(1.0)
        stopper.step(1.0)
        stopper.step(0.5)  # improvement resets the counter
        assert not stopper.should_stop


class TestFeatureSet:
    def _make(self):
        return FeatureSet(
            camera_matrix=np.eye(3),
            frame_i=FeatureData(np.array([0, 0, 1, 2]),
                                np.zeros((4, 2), np.float32),
                                np.ones(4, np.float32)),
            frame_j=FeatureData(np.array([1, 1, 2, 3]),
                                np.zeros((4, 2), np.float32),
                                np.ones(4, np.float32)))

    def test_sample_at(self):
        subset = self._make().sample_at([0, 1, 2])
        assert len(subset) == 3  # pairs (0,1), (0,1), (1,2)

    def test_subset_from(self):
        subset = self._make().subset_from([(0, 1)])
        assert len(subset) == 2
        assert (subset.frame_i.index == 0).all()

    def test_save_load_roundtrip(self, tmp_path):
        fs = self._make()
        path = str(tmp_path / "features.npz")
        fs.save(path)
        loaded = FeatureSet.load(path)
        np.testing.assert_array_equal(loaded.frame_i.index, fs.frame_i.index)
        np.testing.assert_array_equal(loaded.frame_j.points, fs.frame_j.points)


class _SyntheticProblem:
    """GT trajectory + landmarks → exact correspondences for frame pairs."""

    def __init__(self, num_frames=8, num_landmarks=120, seed=0):
        rng = np.random.default_rng(seed)

        self.K = np.array([[100.0, 0, 64.0], [0, 100.0, 48.0], [0, 0, 1.0]])
        self.width, self.height = 128, 96

        # Smooth sideways motion with slight rotation.
        angles = np.linspace(0, 8, num_frames)  # degrees
        quats = Rotation.from_euler("y", angles[:, None], degrees=True).as_quat()
        trans = np.stack([np.linspace(0, 0.5, num_frames),
                          np.zeros(num_frames), np.zeros(num_frames)], axis=-1)
        self.gt = np.hstack([quats, trans])

        # Landmarks in front of the cameras.
        self.landmarks = rng.uniform([-1.5, -1.0, 2.0], [1.5, 1.0, 4.0],
                                     size=(num_landmarks, 3))

    def project(self, frame: int):
        """Project landmarks into a frame → (uv, depth, visible mask)."""
        q = self.gt[frame, :4]
        t = self.gt[frame, 4:]
        R = Rotation.from_quat(q).as_matrix()

        cam = self.landmarks @ R.T + t
        depth = cam[:, 2]
        uv = cam[:, :2] / depth[:, None] * [self.K[0, 0], self.K[1, 1]] \
            + [self.K[0, 2], self.K[1, 2]]

        visible = ((depth > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < self.width)
                   & (uv[:, 1] >= 0) & (uv[:, 1] < self.height))
        return uv, depth, visible

    def feature_set(self, frame_pairs):
        idx_i, pts_i, d_i = [], [], []
        idx_j, pts_j, d_j = [], [], []

        for i, j in frame_pairs:
            uv_i, depth_i, vis_i = self.project(i)
            uv_j, depth_j, vis_j = self.project(j)
            both = vis_i & vis_j

            idx_i.append(np.full(both.sum(), i))
            pts_i.append(uv_i[both])
            d_i.append(depth_i[both])
            idx_j.append(np.full(both.sum(), j))
            pts_j.append(uv_j[both])
            d_j.append(depth_j[both])

        return FeatureSet(
            camera_matrix=self.K,
            frame_i=FeatureData(np.concatenate(idx_i),
                                np.concatenate(pts_i).astype(np.float32),
                                np.concatenate(d_i).astype(np.float32)),
            frame_j=FeatureData(np.concatenate(idx_j),
                                np.concatenate(pts_j).astype(np.float32),
                                np.concatenate(d_j).astype(np.float32)))


class _FakeDataset:
    """Just enough HiveDataset surface for the optimiser core."""

    def __init__(self, problem, trajectory):
        self.camera_matrix = problem.K
        self.camera_trajectory = Trajectory(trajectory)
        self.num_frames = len(trajectory)
        self.frame_width = problem.width
        self.frame_height = problem.height
        self.fps = 30.0
        self.base_path = "/nonexistent"


class TestPoseRecovery:
    @pytest.fixture(scope="class")
    def problem(self):
        return _SyntheticProblem()

    def _run(self, problem, perturbed, steps, num_epochs=600, **kwargs):
        dataset = _FakeDataset(problem, perturbed)
        optimiser = PoseOptimiser(
            dataset, debug=False,
            optimisation_options=OptimisationOptions(
                num_epochs=num_epochs, learning_rate=5e-3,
                steps=steps, fine_tune=False, clip_distance=None,
                pose_t_reg=0.0, pose_r_reg=0.0, **kwargs))

        pairs = sample_frame_pairs(FrameSamplingMode.Hierarchical, problem.gt.shape[0])
        feature_set = problem.feature_set(pairs)

        params = optimiser._init_params(perturbed)
        params = optimiser._optimise_pose(feature_set, params, problem.gt.shape[0])
        return optimiser._params_to_trajectory(params)

    def _ate_rmse(self, gt, estimate):
        err = Trajectory(gt).calculate_ate(estimate)
        return float(np.sqrt(np.mean(np.sum(err ** 2, axis=-1))))

    def test_global3d_recovers_perturbed_positions(self, problem):
        rng = np.random.default_rng(1)
        perturbed = problem.gt.copy()
        perturbed[1:, 4:] += rng.normal(scale=0.05, size=(len(perturbed) - 1, 3))

        before = self._ate_rmse(problem.gt, Trajectory(perturbed))
        result = self._run(problem, perturbed, steps=(OptimisationStep.Global3D,))
        after = self._ate_rmse(problem.gt, result)

        assert after < 0.35 * before

    def test_global2d_improves_alignment(self, problem):
        rng = np.random.default_rng(2)
        perturbed = problem.gt.copy()
        perturbed[1:, 4:] += rng.normal(scale=0.03, size=(len(perturbed) - 1, 3))

        before = self._ate_rmse(problem.gt, Trajectory(perturbed))
        result = self._run(problem, perturbed, steps=(OptimisationStep.Global2D,),
                           num_epochs=400)
        after = self._ate_rmse(problem.gt, result)

        assert after < before

    def test_first_frame_stays_pinned(self, problem):
        rng = np.random.default_rng(3)
        perturbed = problem.gt.copy()
        perturbed[1:, 4:] += rng.normal(scale=0.05, size=(len(perturbed) - 1, 3))

        result = self._run(problem, perturbed, steps=(OptimisationStep.Global3D,),
                           num_epochs=100)

        np.testing.assert_allclose(result[0][4:], problem.gt[0][4:], atol=1e-6)

    def test_pairwise_then_global(self, problem):
        rng = np.random.default_rng(4)
        perturbed = problem.gt.copy()
        perturbed[1:, 4:] += rng.normal(scale=0.04, size=(len(perturbed) - 1, 3))

        before = self._ate_rmse(problem.gt, Trajectory(perturbed))
        result = self._run(problem, perturbed,
                           steps=(OptimisationStep.PairWise3D, OptimisationStep.Global3D),
                           num_epochs=500)
        after = self._ate_rmse(problem.gt, result)

        assert after < before

    def test_debug_saves_initial_and_per_step_trajectory_plots(
            self, problem, tmp_path):
        """Reference parity: a plot of the current solution is saved before
        the first step and after every step (ref pose_optimisation.py:1141,
        :1166, :1181, rendering at :1590-1616)."""
        rng = np.random.default_rng(7)
        perturbed = problem.gt.copy()
        perturbed[1:, 4:] += rng.normal(scale=0.02, size=(len(perturbed) - 1, 3))

        dataset = _FakeDataset(problem, perturbed)
        optimiser = PoseOptimiser(
            dataset, debug=True,
            optimisation_options=OptimisationOptions(
                num_epochs=20, learning_rate=5e-3,
                steps=(OptimisationStep.Global3D,), fine_tune=True,
                clip_distance=None, pose_t_reg=0.0, pose_r_reg=0.0))
        optimiser.debug_path = str(tmp_path)

        pairs = sample_frame_pairs(FrameSamplingMode.Hierarchical,
                                   problem.gt.shape[0])
        feature_set = problem.feature_set(pairs)
        params = optimiser._init_params(perturbed)
        optimiser._optimise_pose(feature_set, params, problem.gt.shape[0])

        # Step plots are 1-based and contiguous with the fine-tune label
        # (matching the "step i/N" log lines).
        for name in ("initial_trajectory.png", "1_Global3D.png",
                     "2_FineTune.png"):
            path = tmp_path / name
            assert path.exists() and path.stat().st_size > 0, name

    def test_affine_alignment_recovers_depth_scale(self, problem):
        """With depth maps scaled by a constant, affine alignment should still
        converge (scale parameters absorb the distortion)."""
        pairs = sample_frame_pairs(FrameSamplingMode.Consecutive, problem.gt.shape[0])
        feature_set = problem.feature_set(pairs)
        # Distort all depths by 10%.
        feature_set.frame_i.depth *= 1.1
        feature_set.frame_j.depth *= 1.1

        dataset = _FakeDataset(problem, problem.gt.copy())
        optimiser = PoseOptimiser(
            dataset, debug=False,
            optimisation_options=OptimisationOptions(
                num_epochs=300, learning_rate=5e-3, fine_tune=False,
                steps=(OptimisationStep.Global3D,), clip_distance=None,
                alignment_type=AlignmentType.Affine))

        params = optimiser._init_params(problem.gt.copy())
        params = optimiser._optimisation_loop(feature_set, params,
                                              optimiser.optimisation_options,
                                              ResidualType.World3D)

        scale = np.asarray(params["scale"])
        assert scale.shape == (problem.gt.shape[0],)
        # Scales should have moved away from 1.0 toward compensating ~1/1.1.
        assert not np.allclose(scale, 1.0, atol=1e-3)

    def test_distance_clip_bounds_motion(self, problem):
        rng = np.random.default_rng(5)
        perturbed = problem.gt.copy()
        perturbed[4, 4:] += [5.0, 0, 0]  # a wild outlier jump

        dataset = _FakeDataset(problem, perturbed)
        optimiser = PoseOptimiser(
            dataset, debug=False,
            optimisation_options=OptimisationOptions(
                num_epochs=50, learning_rate=1e-3, fine_tune=False,
                steps=(OptimisationStep.Global3D,), clip_distance=1.0,
                pose_t_reg=0.0, pose_r_reg=0.0))

        pairs = sample_frame_pairs(FrameSamplingMode.Consecutive, problem.gt.shape[0])
        feature_set = problem.feature_set(pairs)

        params = optimiser._init_params(perturbed)
        params = optimiser._optimisation_loop(feature_set, params,
                                              optimiser.optimisation_options,
                                              ResidualType.World3D)

        positions = np.asarray(params["t"])
        step_sizes = np.linalg.norm(np.diff(positions, axis=0), axis=-1)
        max_allowed = 1.0 / dataset.fps

        assert (step_sizes <= max_allowed * 1.5).all()


class TestMatchVisualisation:
    def test_match_pair_writes_accepted_and_rejected_jpegs(self, tmp_path):
        """With save_match_visualisations on, _match_pair writes the
        accepted/rejected debug images (ref pose_optimisation.py:580-628)."""
        from types import SimpleNamespace

        from hive_tpu.pose_optimisation import (FeatureExtractionOptions,
                                                FeatureExtractor)
        from tests.test_sfm import K, make_sequence

        images, depths, _ = make_sequence(num_frames=2, seed=3)

        dataset = SimpleNamespace(camera_matrix=K, num_frames=2)
        extractor = FeatureExtractor.__new__(FeatureExtractor)
        extractor.dataset = dataset
        extractor.frame_pairs = [(0, 1)]
        extractor.options = FeatureExtractionOptions(
            save_match_visualisations=True)
        extractor.debug_path = str(tmp_path)
        extractor.frames = list(images)
        extractor.depth_maps = list(depths)
        extractor.masks = None

        import cv2 as _cv2

        extractor.sift = _cv2.SIFT_create()
        extractor.matcher = _cv2.FlannBasedMatcher(dict(algorithm=1, trees=5),
                                                   dict(checks=50))

        result = extractor._match_pair((0, 1))
        assert result is not None and len(result) >= 20

        accepted = tmp_path / "matches" / "000000-000001-accepted.jpg"
        rejected = tmp_path / "matches" / "000000-000001-rejected.jpg"
        assert accepted.is_file() and accepted.stat().st_size > 0
        assert rejected.is_file() and rejected.stat().st_size > 0
