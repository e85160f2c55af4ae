"""Native camera-pose estimation: depth-assisted PnP visual odometry.

The reference's only pose-estimation path shells out to the COLMAP binary
(hive/io.py:267-321, hive/dataset_adaptors.py:339-398). This module provides a
self-contained alternative with no external binaries: SIFT correspondences
between consecutive frames + RANSAC PnP against 3D points lifted from the
(estimated or measured) depth maps give *metric* relative poses directly — no
separate scale-alignment step — which chain into a trajectory. The result can
then be refined by :class:`hive_tpu.pose_optimisation.PoseOptimiser`
(hierarchical pairs restore long-range consistency).

Used automatically by the dataset adaptors when ``estimate_pose`` is requested
but the COLMAP binary is unavailable.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from hive_tpu.geometric import Trajectory, pose_mat2vec
from hive_tpu.utils import tqdm_imap


class PnPOdometry:
    """Frame-to-frame metric odometry from RGB + depth.

    For each consecutive pair (i, j): match SIFT features, lift frame i's
    matches to 3D with its depth map, and solve RANSAC PnP for frame j's pose
    relative to frame i. Relative poses chain into world-to-camera poses with
    frame 0 as the identity.
    """

    def __init__(self, camera_matrix: np.ndarray, min_matches: int = 20,
                 max_features: int = 2048, ratio_threshold: float = 0.75,
                 pnp_reprojection_error: float = 4.0):
        import threading

        self.camera_matrix = np.asarray(camera_matrix, dtype=np.float64)
        self.min_matches = min_matches
        self.max_features = max_features
        self.ratio_threshold = ratio_threshold
        self.pnp_reprojection_error = pnp_reprojection_error

        # cv2 detector/matcher instances are not documented thread-safe and
        # pair solving fans out over tqdm_imap's thread pool on multi-core
        # hosts — keep one instance per worker thread.
        self._tls = threading.local()

    @property
    def sift(self):
        if not hasattr(self._tls, "sift"):
            self._tls.sift = cv2.SIFT_create(nfeatures=self.max_features)
        return self._tls.sift

    @property
    def matcher(self):
        if not hasattr(self._tls, "matcher"):
            self._tls.matcher = cv2.FlannBasedMatcher(dict(algorithm=1, trees=5),
                                                      dict(checks=50))
        return self._tls.matcher

    # -- feature helpers ------------------------------------------------------
    def _detect(self, gray: np.ndarray, mask: Optional[np.ndarray]):
        sift_mask = None

        if mask is not None:
            # Exclude dynamic objects from odometry features.
            sift_mask = np.where(mask > 0, 0, 255).astype(np.uint8)

        return self.sift.detectAndCompute(gray, sift_mask)

    def _match(self, desc_a, desc_b) -> List[Tuple[int, int]]:
        if desc_a is None or desc_b is None or len(desc_a) < 2 or len(desc_b) < 2:
            return []

        matches = self.matcher.knnMatch(desc_a, desc_b, k=2)
        good = []

        for pair in matches:
            if len(pair) < 2:
                continue

            m, n = pair
            if m.distance < self.ratio_threshold * n.distance:
                good.append((m.queryIdx, m.trainIdx))

        return good

    # -- relative pose --------------------------------------------------------
    def relative_pose(self, gray_i, depth_i, gray_j, mask_i=None, mask_j=None,
                      features_i=None, features_j=None) -> Optional[np.ndarray]:
        """World-to-camera transform of frame j in frame i's camera frame.

        :param features_i/features_j: Optional precomputed ``(keypoints,
            descriptors)`` for the two frames — SIFT detection dominates
            odometry cost and interior frames appear in two pairs, so
            estimate_trajectory detects once per frame and passes them here.
        :return: (4, 4) matrix, or None when the pair cannot be solved.
        """
        kp_i, desc_i = (features_i if features_i is not None
                        else self._detect(gray_i, mask_i))
        kp_j, desc_j = (features_j if features_j is not None
                        else self._detect(gray_j, mask_j))

        matches = self._match(desc_i, desc_j)

        if len(matches) < self.min_matches:
            return None

        K = self.camera_matrix
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]

        object_points = []
        image_points = []

        h, w = depth_i.shape

        for qi, ti in matches:
            u, v = kp_i[qi].pt
            ui, vi = int(round(u)), int(round(v))

            if not (0 <= ui < w and 0 <= vi < h):
                continue

            z = float(depth_i[vi, ui])
            if z <= 0.0:
                continue

            object_points.append([(u - cx) * z / fx, (v - cy) * z / fy, z])
            image_points.append(kp_j[ti].pt)

        if len(object_points) < self.min_matches:
            return None

        object_points = np.asarray(object_points, dtype=np.float64)
        image_points = np.asarray(image_points, dtype=np.float64)

        ok, rvec, tvec, inliers = cv2.solvePnPRansac(
            object_points, image_points, K, None,
            reprojectionError=self.pnp_reprojection_error,
            iterationsCount=200, flags=cv2.SOLVEPNP_ITERATIVE)

        if not ok or inliers is None or len(inliers) < self.min_matches // 2:
            return None

        # Refine on the inliers.
        ok, rvec, tvec = cv2.solvePnP(
            object_points[inliers[:, 0]], image_points[inliers[:, 0]], K, None,
            rvec=rvec, tvec=tvec, useExtrinsicGuess=True,
            flags=cv2.SOLVEPNP_ITERATIVE)

        if not ok:
            return None

        R, _ = cv2.Rodrigues(rvec)

        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = tvec.reshape(3)
        return M

    # -- trajectory -----------------------------------------------------------
    def estimate_trajectory(self, grays: Sequence[np.ndarray],
                            depths: Sequence[np.ndarray],
                            masks: Optional[Sequence[np.ndarray]] = None) -> Trajectory:
        """Chain consecutive relative poses into a world-to-camera trajectory.

        Pairs that fail to solve fall back to the previous relative motion
        (constant-velocity assumption), keeping the trajectory complete.
        """
        num_frames = len(grays)

        if masks is None:
            masks = [None] * num_frames

        logging.info("Estimating frame-to-frame poses (PnP odometry)...")
        # One SIFT pass per frame (interior frames are in two pairs).
        features = tqdm_imap(lambda i: self._detect(grays[i], masks[i]),
                             range(num_frames), show_progress=False)

        def solve_pair(i):
            return self.relative_pose(grays[i], depths[i], grays[i + 1],
                                      features_i=features[i],
                                      features_j=features[i + 1])

        relative = tqdm_imap(solve_pair, range(num_frames - 1))

        poses = [np.eye(4)]
        last_motion = np.eye(4)
        failures = 0

        for rel in relative:
            if rel is None:
                rel = last_motion
                failures += 1
            else:
                last_motion = rel

            poses.append(rel @ poses[-1])

        if failures:
            logging.warning(f"PnP odometry failed for {failures}/{num_frames - 1} pairs "
                            f"(used constant-velocity fallback).")

        values = np.stack([pose_mat2vec(p) for p in poses])
        return Trajectory(values)


def estimate_camera_poses_native(rgb_frames: Sequence[np.ndarray],
                                 depth_maps_m: Sequence[np.ndarray],
                                 camera_matrix: np.ndarray,
                                 masks: Optional[Sequence[np.ndarray]] = None,
                                 frame_step: int = 1) -> Trajectory:
    """High-level driver: odometry over a frame subset + slerp re-densification.

    :param rgb_frames: RGB frames (any dtype).
    :param depth_maps_m: Depth maps in meters (0 = invalid).
    :param camera_matrix: (3, 3) intrinsics.
    :param masks: Optional dynamic-object masks (nonzero = dynamic).
    :param frame_step: Subsample stride for pose solving (intermediate frames
        interpolate, mirroring the COLMAP path's behaviour,
        dataset_adaptors.py:391-396).
    :return: The (N, 7) world-to-camera trajectory, first frame = identity.
    """
    num_frames = len(rgb_frames)
    if num_frames == 0:
        raise ValueError("estimate_camera_poses_native needs at least one "
                         "frame (got an empty sequence)")

    subset = list(range(0, num_frames, frame_step))
    if subset[-1] != num_frames - 1:
        subset.append(num_frames - 1)

    # Only the subset frames are ever solved — convert just those.
    grays = {i: cv2.cvtColor(np.asarray(rgb_frames[i])[..., :3],
                             cv2.COLOR_RGB2GRAY) for i in subset}

    odometry = PnPOdometry(camera_matrix)
    subset_trajectory = odometry.estimate_trajectory(
        [grays[i] for i in subset],
        [depth_maps_m[i] for i in subset],
        None if masks is None else [masks[i] for i in subset])

    if frame_step == 1:
        return subset_trajectory

    pose_mapping = {frame: subset_trajectory[k] for k, frame in enumerate(subset)}
    return Trajectory.create_by_interpolating(pose_mapping, frame_count=num_frames)
