"""Gradient-based camera-trajectory refinement from image correspondences.

Capability parity with reference hive/pose_optimisation.py (FrameSamplingMode:61,
FeatureData/FeatureSet:84/116, FeatureExtractor:267, AlignmentType:659,
OptimisationParameters:672, EarlyStopping:790, Residual/OptimisationStep:829/846,
OptimisationOptions:871, PoseOptimiser:967, ForegroundPoseOptimiser:1618,
standalone CLI main:1714). TPU-native design:

* SIFT/FLANN/MAGSAC feature matching stays on host (cv2, threaded) — it feeds
  small tensors once per run;
* the optimisation loop is jit-compiled: each chunk of epochs runs as a single
  ``lax.scan`` on device (Adam via optax), with quaternion renormalisation and
  the inter-frame distance clip — the reference's O(N) Python loop
  (pose_optimisation.py:1358) — recast as a cumulative-sum of clipped deltas;
* host code between chunks implements LR-plateau reduction and early stopping
  from the per-epoch loss history, so the data-dependent control flow never
  enters the compiled graph;
* correspondences are a flat, padded, weight-masked array — residuals shard
  over the ``data`` axis of a device mesh for multi-chip runs (gradients
  reduce with an XLA ``psum`` inserted automatically by sharding propagation).
"""

from __future__ import annotations

import argparse
import dataclasses
import enum
import json
import logging
import os
import shutil
from functools import partial
from os.path import join as pjoin
from typing import Dict, Iterable, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from hive_tpu.core import transforms as T
from hive_tpu.geometric import Trajectory, add_pose, get_identity_pose, subtract_pose
from hive_tpu.io import HiveDataset
from hive_tpu.utils import Domain, check_domain, temp_seed, tqdm_imap


# ---------------------------------------------------------------------------
# Frame pair sampling.
# ---------------------------------------------------------------------------

class FrameSamplingMode(enum.Enum):
    """Strategy for choosing which frame pairs constrain the pose graph."""

    Exhaustive = enum.auto()               # all unique pairs — O(N^2)
    Consecutive = enum.auto()              # (0,1), (1,2), ...
    ConsecutiveNoOverlap = enum.auto()     # (0,1), (2,3), ...
    ConsecutiveNoOverlapOffset = enum.auto()  # (1,2), (3,4), ...
    Hierarchical = enum.auto()             # power-of-two strides — O(N log N)


FramePair = Tuple[int, int]
FramePairs = List[FramePair]


def sample_frame_pairs(mode: FrameSamplingMode, num_frames: int) -> FramePairs:
    """Enumerate frame pairs for a sampling mode (ref pose_optimisation.py:1042-1092)."""
    if mode == FrameSamplingMode.Exhaustive:
        return [(i, j) for i in range(num_frames) for j in range(i + 1, num_frames)]

    if mode in (FrameSamplingMode.Consecutive, FrameSamplingMode.ConsecutiveNoOverlap,
                FrameSamplingMode.ConsecutiveNoOverlapOffset):
        start = 1 if mode == FrameSamplingMode.ConsecutiveNoOverlapOffset else 0
        step = 1 if mode == FrameSamplingMode.Consecutive else 2
        return [(i, i + 1) for i in range(start, num_frames - 1, step)]

    if mode == FrameSamplingMode.Hierarchical:
        # Consecutive pairs plus increasingly distant (power-of-two) pairs.
        pairs = []
        max_level = int(np.floor(np.log2(max(num_frames - 1, 1))))

        for level in range(max_level + 1):
            step = 1 << level
            for start in range(0, num_frames, step):
                if start + step < num_frames:
                    pairs.append((start, start + step))

        return pairs

    raise RuntimeError(f"No such frame sampling mode: {mode}.")


# ---------------------------------------------------------------------------
# Feature data containers (host NumPy; shipped to device as one batch).
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FeatureData:
    """Per-correspondence data for one side of the frame pairs."""

    index: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.int64))
    points: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 2), dtype=np.float32))
    depth: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.float32))

    def __len__(self):
        return len(self.index)

    def sample_at(self, mask_or_indices) -> "FeatureData":
        return FeatureData(self.index[mask_or_indices].copy(),
                           self.points[mask_or_indices].copy(),
                           self.depth[mask_or_indices].copy())

    @staticmethod
    def concatenate(items: List["FeatureData"]) -> "FeatureData":
        if not items:
            return FeatureData()

        return FeatureData(np.concatenate([d.index for d in items]),
                           np.concatenate([d.points for d in items]),
                           np.concatenate([d.depth for d in items]))


@dataclasses.dataclass
class FeatureSet:
    """Matched correspondences between frame pairs + shared intrinsics.

    Persisted as `.npz` (the reference used a torch state_dict `.pth`,
    pose_optimisation.py:143-172 — same content, portable format).
    """

    camera_matrix: np.ndarray = dataclasses.field(default_factory=lambda: np.eye(3))
    frame_i: FeatureData = dataclasses.field(default_factory=FeatureData)
    frame_j: FeatureData = dataclasses.field(default_factory=FeatureData)

    def __len__(self):
        return len(self.frame_i)

    def save(self, f):
        np.savez(f, camera_matrix=self.camera_matrix,
                 index_i=self.frame_i.index, points_i=self.frame_i.points,
                 depth_i=self.frame_i.depth,
                 index_j=self.frame_j.index, points_j=self.frame_j.points,
                 depth_j=self.frame_j.depth)

    @classmethod
    def load(cls, f) -> "FeatureSet":
        data = np.load(f)
        return cls(camera_matrix=data["camera_matrix"],
                   frame_i=FeatureData(data["index_i"], data["points_i"], data["depth_i"]),
                   frame_j=FeatureData(data["index_j"], data["points_j"], data["depth_j"]))

    def sample_at(self, frame_indices: Iterable[int]) -> "FeatureSet":
        """Keep only correspondences where both frames are in ``frame_indices``."""
        frame_set = np.asarray(sorted(set(frame_indices)))
        mask = (np.isin(self.frame_i.index, frame_set)
                & np.isin(self.frame_j.index, frame_set))

        return FeatureSet(self.camera_matrix.copy(),
                          self.frame_i.sample_at(mask), self.frame_j.sample_at(mask))

    def subset_from(self, frame_pairs: FramePairs) -> "FeatureSet":
        """Keep only correspondences belonging to the given frame pairs."""
        if len(self) == 0:
            return FeatureSet(self.camera_matrix.copy())

        pairs = np.asarray(list(frame_pairs), dtype=np.int64)
        # The key base must cover the REQUESTED pairs too: a base taken
        # from the feature set alone lets a requested j past our max wrap
        # into a colliding key and falsely match (review finding, r5).
        base = int(max(self.frame_j.index.max(), pairs[:, 1].max())) + 1
        ours = self.frame_i.index.astype(np.int64) * base + self.frame_j.index
        theirs = pairs[:, 0] * base + pairs[:, 1]
        mask = np.isin(ours, theirs)

        return FeatureSet(self.camera_matrix.copy(),
                          self.frame_i.sample_at(mask), self.frame_j.sample_at(mask))


# ---------------------------------------------------------------------------
# Feature extraction (host, cv2).
# ---------------------------------------------------------------------------

class FeatureExtractionOptions:
    """Options for the FeatureExtractor. (ref pose_optimisation.py:224-264)"""

    def __init__(self, ignore_dynamic_objects: bool = True, min_features: int = 20,
                 max_features: Optional[int] = 2048,
                 save_match_visualisations: bool = False):
        if not isinstance(min_features, int) or min_features < 5:
            raise ValueError(f"min_features needs an int >= 5 (RANSAC needs at least 5 "
                             f"correspondences); got {min_features}.")

        if max_features is not None and (not isinstance(max_features, int)
                                         or max_features <= min_features):
            raise ValueError(f"max_features must be an int above min_features "
                             f"(= {min_features}); got {max_features}.")

        if min_features < 20:
            logging.warning(f"min_features={min_features} is low; values under 20 tend to "
                            f"leave too few matches for a stable solve.")

        self.ignore_dynamic_objects = ignore_dynamic_objects
        self.min_features = min_features
        self.max_features = max_features
        # Write accepted/rejected match JPEGs per frame pair into
        # <debug_path>/matches (ref pose_optimisation.py:580-628).
        self.save_match_visualisations = save_match_visualisations


class FeatureExtractor:
    """SIFT + FLANN matching with ratio/depth/RANSAC filtering.

    Host-side by design: produces the small correspondence tensors that the
    jit-compiled optimiser consumes (ref pose_optimisation.py:267-628).
    """

    def __init__(self, dataset: HiveDataset, frame_pairs: FramePairs,
                 feature_extraction_options=FeatureExtractionOptions(),
                 debug_path: Optional[str] = None):
        self.dataset = dataset
        self.frame_pairs = frame_pairs
        self.options = feature_extraction_options
        self.debug_path = debug_path
        self.feature_set_path: Optional[str] = None
        self.frame_pairs_path: Optional[str] = None

        self.frames: Optional[List[np.ndarray]] = None
        self.depth_maps: Optional[List[np.ndarray]] = None
        self.masks: Optional[List[np.ndarray]] = None

        self.sift = cv2.SIFT_create(nfeatures=self.options.max_features or 0)
        self._detect_cache: Dict[int, tuple] = {}

        self.matcher = cv2.FlannBasedMatcher(dict(algorithm=1, trees=5), dict(checks=50))

    def extract_feature_points(self) -> FeatureSet:
        logging.info("Detecting and matching image features...")
        self._setup_cache()

        if self.feature_set_path and os.path.isfile(self.feature_set_path):
            logging.info(f"Reusing the cached feature set {self.feature_set_path}")
            return FeatureSet.load(self.feature_set_path)

        self._load_frame_data()

        results = tqdm_imap(self._match_pair, self.frame_pairs)
        good = [r for r in results if r is not None]

        feature_set = FeatureSet(
            camera_matrix=self.dataset.camera_matrix.copy(),
            frame_i=FeatureData.concatenate([g.frame_i for g in good]),
            frame_j=FeatureData.concatenate([g.frame_j for g in good]),
        )

        self._log_stats(feature_set, num_good_pairs=len(good))

        if self.feature_set_path:
            feature_set.save(self.feature_set_path)

        return feature_set

    def _setup_cache(self):
        if self.debug_path is None:
            return

        os.makedirs(self.debug_path, exist_ok=True)
        self.frame_pairs_path = pjoin(self.debug_path, "frame_pairs.txt")
        self.feature_set_path = pjoin(self.debug_path, "feature_set.npz")

        # Invalidate the cache if the frame-pair set OR the extraction
        # options changed (a cached feature set extracted with different
        # masking/ratio/count settings silently ignored new options —
        # review finding, r5).
        options_path = pjoin(self.debug_path, "feature_options.json")
        options_fingerprint = json.dumps(vars(self.options), sort_keys=True,
                                         default=str)

        keep_cache = False
        if os.path.isfile(self.frame_pairs_path):
            cached = np.loadtxt(self.frame_pairs_path)
            cached = cached.reshape(-1, 2)
            keep_cache = (len(cached) == len(self.frame_pairs)
                          and np.array_equal(cached, np.asarray(self.frame_pairs)))
        if keep_cache:
            try:
                with open(options_path) as f:
                    keep_cache = f.read() == options_fingerprint
            except OSError:
                keep_cache = False

        if not keep_cache:
            if os.path.isfile(self.feature_set_path):
                os.remove(self.feature_set_path)
            np.savetxt(self.frame_pairs_path, np.asarray(self.frame_pairs))
            with open(options_path, "w") as f:
                f.write(options_fingerprint)

    def _load_frame_data(self):
        logging.info("Loading frames...")

        def load_gray(i):
            return cv2.cvtColor(self.dataset.rgb_dataset[i], cv2.COLOR_RGB2GRAY)

        num_frames = self.dataset.num_frames
        self.frames = tqdm_imap(load_gray, range(num_frames))

        logging.info("Reading the depth maps into memory...")
        self.depth_maps = tqdm_imap(self.dataset.depth_dataset.__getitem__, range(num_frames))

        if self.options.ignore_dynamic_objects:
            logging.info("Loading masks...")

            def static_region_mask(i):
                mask = self.dataset.mask_dataset[i]
                # SIFT mask: nonzero = detect here; exclude dynamic objects.
                return np.where(mask > 0, 0, 255).astype(np.uint8)

            self.masks = tqdm_imap(static_region_mask, range(num_frames))
        else:
            self.masks = None

    def _detect(self, index: int):
        # Per-frame memo: with hierarchical sampling each frame appears in
        # ~2*log2(N) pairs (N-1 with exhaustive), and SIFT on a full frame
        # is the dominant host cost of extraction — detecting once per
        # frame instead of once per pair occurrence cuts it several-fold
        # on this 1-core VM (review finding, r5).
        cache = getattr(self, "_detect_cache", None)
        if cache is None:  # lazily created: tests build via __new__
            cache = self._detect_cache = {}
        cached = cache.get(index)
        if cached is None:
            mask = self.masks[index] if self.masks is not None else None
            cached = self.sift.detectAndCompute(self.frames[index], mask)
            cache[index] = cached
        return cached

    def _match_pair(self, frame_pair: FramePair) -> Optional[FeatureSet]:
        i, j = frame_pair

        kp_i, desc_i = self._detect(i)
        kp_j, desc_j = self._detect(j)

        if min(len(kp_i), len(kp_j)) < self.options.min_features:
            return None

        matches = self.matcher.knnMatch(desc_i, desc_j, k=2)

        points_i, points_j, depth_i, depth_j = [], [], [], []

        for pair in matches:
            if len(pair) < 2:
                continue

            m, n = pair
            # Lowe's ratio test.
            if m.distance > 0.7 * n.distance:
                continue

            pt_i = kp_i[m.queryIdx].pt
            pt_j = kp_j[m.trainIdx].pt
            d_i = self.depth_maps[i][round(pt_i[1]), round(pt_i[0])]
            d_j = self.depth_maps[j][round(pt_j[1]), round(pt_j[0])]

            if d_i == 0.0 or d_j == 0.0:
                continue

            points_i.append(pt_i)
            points_j.append(pt_j)
            depth_i.append(d_i)
            depth_j.append(d_j)

        if len(points_i) < self.options.min_features:
            return None

        points_i = np.asarray(points_i, dtype=np.float32)
        points_j = np.asarray(points_j, dtype=np.float32)
        depth_i = np.asarray(depth_i, dtype=np.float32)
        depth_j = np.asarray(depth_j, dtype=np.float32)

        # Robust geometric filter (MAGSAC homography, ref :562).
        _, inlier_mask = cv2.findHomography(points_i, points_j, cv2.USAC_MAGSAC)

        if inlier_mask is None:
            return None

        inliers = inlier_mask.ravel() > 0

        if self.options.save_match_visualisations and self.debug_path:
            self._save_matches_visualisation(frame_pair, points_i, points_j,
                                             inliers)

        if inliers.sum() < self.options.min_features:
            return None

        n_matches = int(inliers.sum())
        return FeatureSet(
            camera_matrix=self.dataset.camera_matrix.copy(),
            frame_i=FeatureData(np.full(n_matches, i, dtype=np.int64),
                                points_i[inliers], depth_i[inliers]),
            frame_j=FeatureData(np.full(n_matches, j, dtype=np.int64),
                                points_j[inliers], depth_j[inliers]),
        )

    def _save_matches_visualisation(self, frame_pair: FramePair,
                                    points_i: np.ndarray, points_j: np.ndarray,
                                    inliers: np.ndarray):
        """Write side-by-side accepted/rejected match images for a frame pair.

        Parity with the reference's debug JPEGs (ref
        pose_optimisation.py:580-628): one image of RANSAC-accepted matches
        (green lines) and one of rejected matches (red), saved under
        ``<debug_path>/matches/``.
        """
        i, j = frame_pair
        viz_dir = pjoin(self.debug_path, "matches")
        os.makedirs(viz_dir, exist_ok=True)

        frame_i = cv2.cvtColor(self.frames[i], cv2.COLOR_GRAY2BGR)
        frame_j = cv2.cvtColor(self.frames[j], cv2.COLOR_GRAY2BGR)
        h = max(frame_i.shape[0], frame_j.shape[0])
        offset_u = frame_i.shape[1]

        def draw(mask, colour, suffix):
            canvas = np.zeros((h, offset_u + frame_j.shape[1], 3), np.uint8)
            canvas[:frame_i.shape[0], :offset_u] = frame_i
            canvas[:frame_j.shape[0], offset_u:] = frame_j

            for p, q in zip(points_i[mask], points_j[mask]):
                a = (int(round(p[0])), int(round(p[1])))
                b = (int(round(q[0])) + offset_u, int(round(q[1])))
                cv2.circle(canvas, a, 3, colour, 1, cv2.LINE_AA)
                cv2.circle(canvas, b, 3, colour, 1, cv2.LINE_AA)
                cv2.line(canvas, a, b, colour, 1, cv2.LINE_AA)

            cv2.imwrite(pjoin(viz_dir, f"{i:06d}-{j:06d}-{suffix}.jpg"), canvas)

        draw(inliers, (0, 192, 0), "accepted")
        draw(~inliers, (0, 0, 224), "rejected")

    def _log_stats(self, feature_set: FeatureSet, num_good_pairs: int):
        covered = set(feature_set.frame_i.index.tolist()) \
            | set(feature_set.frame_j.index.tolist())
        coverage = len(covered) / max(self.dataset.num_frames, 1)

        logging.info(f"Usable frame pairs: {num_good_pairs} of {len(self.frame_pairs)}")
        logging.info(f"Pair coverage: {100 * coverage:.2f}% of all frames.")


# ---------------------------------------------------------------------------
# Optimisation configuration.
# ---------------------------------------------------------------------------

class AlignmentType(enum.Enum):
    """How depth maps are scaled/shifted during alignment."""

    Rigid = enum.auto()       # pose only
    Affine = enum.auto()      # + per-frame inverse-depth scale & shift
    Deformable = enum.auto()  # + per-frame 3x3 grid of scale & shift


class ResidualType(enum.Enum):
    World3D = enum.auto()  # 3D distance between correspondences in world space
    Image2D = enum.auto()  # pixel distance after cross-projection


class OptimisationStep(enum.Enum):
    PairWise3D = enum.auto()
    Global3D = enum.auto()
    PairWise2D = enum.auto()
    Global2D = enum.auto()


class EarlyStopping:
    """Stagnation tracker (host side). (ref pose_optimisation.py:790-825)"""

    def __init__(self, patience: int = 10, min_difference: float = 0.0):
        self.patience = patience
        self.min_difference = min_difference
        self.best_loss = float("inf")
        self.calls_since_last_best = 0
        self.should_stop = False

    def step(self, loss: float) -> bool:
        if loss < self.best_loss and abs(loss - self.best_loss) > self.min_difference:
            self.best_loss = loss
            self.calls_since_last_best = 0
        else:
            self.calls_since_last_best += 1

        if self.calls_since_last_best > self.patience:
            self.should_stop = True

        return self.should_stop


class OptimisationOptions:
    """Configuration for PoseOptimiser. (ref pose_optimisation.py:871-964)"""

    default_pipeline = (OptimisationStep.PairWise3D, OptimisationStep.Global3D)

    def __init__(self, num_epochs: int = 4000, learning_rate: float = 1e-2,
                 l2_regularisation: float = 0.5, min_loss_delta: float = 1e-4,
                 lr_scheduler_patience: int = 50, early_stopping_patience: int = 75,
                 alignment_type: AlignmentType = AlignmentType.Rigid,
                 steps=default_pipeline, position_only: bool = False, fine_tune: bool = True,
                 pose_t_reg: float = 0.5, pose_r_reg: float = 1.0,
                 trajectory_smoothing: Optional[float] = None,
                 clip_distance: Optional[float] = 1.0,
                 epochs_per_chunk: int = 25,
                 checkpoint_dir: Optional[str] = None,
                 checkpoint_every_chunks: int = 20):
        check_domain(num_epochs, "num_epochs", int, Domain.Positive)
        check_domain(learning_rate, "learning_rate", float, Domain.Positive)
        check_domain(l2_regularisation, "l2_regularisation", float, Domain.NonNegative)
        check_domain(min_loss_delta, "min_loss_delta", float, Domain.Positive)
        check_domain(lr_scheduler_patience, "lr_scheduler_patience", int, Domain.Positive)
        check_domain(early_stopping_patience, "early_stopping_patience", int, Domain.Positive)
        check_domain(pose_t_reg, "pose_t_reg", float, Domain.NonNegative)
        check_domain(pose_r_reg, "pose_r_reg", float, Domain.NonNegative)
        check_domain(trajectory_smoothing, "trajectory_smoothing", float, Domain.NonNegative,
                     nullable=True)
        check_domain(clip_distance, "clip_distance", float, Domain.NonNegative, nullable=True)
        check_domain(epochs_per_chunk, "epochs_per_chunk", int, Domain.Positive)
        check_domain(checkpoint_every_chunks, "checkpoint_every_chunks", int,
                     Domain.Positive)

        if not isinstance(steps, (tuple, list)) or len(steps) == 0:
            raise ValueError("steps must be a tuple or list with at least one element.")

        for step in steps:
            if not isinstance(step, OptimisationStep):
                raise ValueError(f"steps must only contain OptimisationStep values, "
                                 f"found {type(step)}")

        self.num_epochs = num_epochs
        self.learning_rate = learning_rate
        self.l2_regularisation = l2_regularisation
        self.min_loss_delta = min_loss_delta
        self.lr_scheduler_patience = lr_scheduler_patience
        self.early_stopping_patience = early_stopping_patience
        self.alignment_type = alignment_type
        self.steps = tuple(steps)
        self.position_only = position_only
        self.fine_tune = fine_tune
        self.pose_t_reg = pose_t_reg
        self.pose_r_reg = pose_r_reg
        self.trajectory_smoothing = trajectory_smoothing
        self.clip_distance = clip_distance
        self.epochs_per_chunk = epochs_per_chunk
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every_chunks = checkpoint_every_chunks

    def copy(self) -> "OptimisationOptions":
        return OptimisationOptions(
            num_epochs=self.num_epochs, learning_rate=self.learning_rate,
            l2_regularisation=self.l2_regularisation, min_loss_delta=self.min_loss_delta,
            lr_scheduler_patience=self.lr_scheduler_patience,
            early_stopping_patience=self.early_stopping_patience,
            alignment_type=self.alignment_type, steps=self.steps,
            position_only=self.position_only, fine_tune=self.fine_tune,
            pose_t_reg=self.pose_t_reg, pose_r_reg=self.pose_r_reg,
            trajectory_smoothing=self.trajectory_smoothing,
            clip_distance=self.clip_distance, epochs_per_chunk=self.epochs_per_chunk,
            checkpoint_dir=self.checkpoint_dir,
            checkpoint_every_chunks=self.checkpoint_every_chunks)


# ---------------------------------------------------------------------------
# Device-side optimisation core.
# ---------------------------------------------------------------------------

def _apply_depth_alignment(depth, points, indices, scale, shift, alignment: AlignmentType,
                           frame_size):
    """Optionally warp inverse depth by learned per-frame scale/shift."""
    if alignment == AlignmentType.Rigid:
        return depth

    if alignment == AlignmentType.Affine:
        s = scale[indices]
        b = shift[indices]
        return 1.0 / (s * (1.0 / depth) + b)

    # Deformable: bilinear sample a per-frame 3x3 scale/shift grid at the
    # correspondence location (the reference materialised full-resolution
    # fields with torch interpolate, pose_optimisation.py:1485-1495; sampling
    # at the points directly is equivalent and far cheaper).
    w, h = frame_size
    gx = jnp.clip(points[:, 0] / jnp.maximum(w - 1, 1) * 2.0, 0.0, 2.0)
    gy = jnp.clip(points[:, 1] / jnp.maximum(h - 1, 1) * 2.0, 0.0, 2.0)

    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, 1)
    fx = gx - x0
    fy = gy - y0

    def sample(field):
        f = field[indices]  # (M, 3, 3) — grid rows index y, columns x
        f00 = f[jnp.arange(len(indices)), y0, x0]
        f01 = f[jnp.arange(len(indices)), y0, x0 + 1]
        f10 = f[jnp.arange(len(indices)), y0 + 1, x0]
        f11 = f[jnp.arange(len(indices)), y0 + 1, x0 + 1]
        return ((1 - fy) * ((1 - fx) * f00 + fx * f01)
                + fy * ((1 - fx) * f10 + fx * f11))

    s = sample(scale)
    b = sample(shift)
    return 1.0 / (s * (1.0 / depth) + b)


def _unproject_to_world(points, depth, indices, quats, trans, intrinsics):
    """Correspondences → world space via the (inverse) camera poses."""
    fx, fy, cx, cy = intrinsics
    x = (points[:, 0] - cx) * depth / fx
    y = (points[:, 1] - cy) * depth / fy
    cam = jnp.stack([x, y, depth], axis=-1)

    q = T.quat_normalize(quats[indices])
    # World = R^T (cam - t): rotate by the conjugate.
    return T.quat_rotate(T.quat_conjugate(q), cam - trans[indices])


def _project_to_image(world, indices, quats, trans, intrinsics):
    fx, fy, cx, cy = intrinsics
    q = T.quat_normalize(quats[indices])
    cam = T.quat_rotate(q, world) + trans[indices]

    x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    return jnp.stack([(fx * x + cx * z) / safe_z, (fy * y + cy * z) / safe_z], axis=-1)


def _clip_frame_distances(positions, max_frame_distance):
    """Limit inter-frame displacement, propagating shifts downstream.

    Equivalent to the reference's sequential clip loop
    (pose_optimisation.py:1340-1378) but expressed as a cumulative sum of
    clipped deltas — O(N) parallel work instead of a Python loop.
    """
    deltas = positions[1:] - positions[:-1]
    norms = jnp.linalg.norm(deltas, axis=-1, keepdims=True)
    factor = jnp.minimum(1.0, max_frame_distance / jnp.maximum(norms, 1e-12))
    clipped = deltas * factor

    return jnp.concatenate([positions[:1], positions[:1] + jnp.cumsum(clipped, axis=0)])


def _make_loss_fn(residual_type: ResidualType, alignment: AlignmentType, smooth: bool,
                  position_only: bool, pose_t_reg: float, pose_r_reg: float,
                  l2_reg: float, frame_size):
    """Build the (pure) loss function for one optimisation configuration."""

    def loss_fn(params, features, intrinsics):
        quats, trans, scale, shift = (params["q"], params["t"],
                                      params["scale"], params["shift"])

        depth_i = _apply_depth_alignment(features["depth_i"], features["points_i"],
                                         features["idx_i"], scale, shift, alignment,
                                         frame_size)
        p = _unproject_to_world(features["points_i"], depth_i, features["idx_i"],
                                quats, trans, intrinsics)

        if residual_type == ResidualType.World3D:
            depth_j = _apply_depth_alignment(features["depth_j"], features["points_j"],
                                             features["idx_j"], scale, shift, alignment,
                                             frame_size)
            q_pts = _unproject_to_world(features["points_j"], depth_j, features["idx_j"],
                                        quats, trans, intrinsics)
            residuals = p - q_pts
        else:
            projected = _project_to_image(p, features["idx_j"], quats, trans, intrinsics)
            residuals = features["points_j"] - projected

        weights = features["weight"]
        # Safe L2: jnp.linalg.norm has a NaN gradient at exactly zero, which
        # residuals reach once pairwise alignment converges.
        distances = jnp.sqrt(jnp.sum(jnp.square(residuals), axis=-1) + 1e-12)
        loss = jnp.sum(weights * distances) / jnp.maximum(jnp.sum(weights), 1.0)

        if smooth:
            # Guard each difference order on trajectory length (static
            # shapes, so plain Python conditions): jnp.mean over an EMPTY
            # d2/d3 (2- or 3-frame runs) is NaN, which poisoned the loss
            # and every gradient from epoch 1 (review finding, r5).
            n = trans.shape[0]
            if n >= 2:
                d1 = trans[:-1] - trans[1:]
                loss += pose_t_reg * jnp.mean(jnp.sum(jnp.square(d1), axis=1))
                q_dot = jnp.sum(quats[:-1] * quats[1:], axis=-1)
                loss += pose_r_reg * jnp.mean(1.0 - jnp.square(q_dot))
            if n >= 3:
                d2 = trans[:-2] - 2 * trans[1:-1] + trans[2:]
                loss += pose_t_reg * jnp.mean(jnp.sum(jnp.square(d2), axis=1))
                if n >= 4:
                    d3 = d2[:-1] - d2[1:]
                    loss += pose_t_reg * jnp.mean(
                        jnp.sum(jnp.square(d3), axis=1))

        if alignment != AlignmentType.Rigid:
            loss += l2_reg * jnp.mean(jnp.square(1.0 / scale - 1.0))
            loss += 2 * l2_reg * jnp.mean(jnp.square(shift))

        return loss

    return loss_fn


@partial(jax.jit, static_argnames=("loss_fn", "num_epochs", "position_only",
                                   "use_clip"))
def _run_epoch_chunk(params, opt_state, features, intrinsics, learning_rate,
                     max_frame_distance, *, loss_fn, num_epochs: int,
                     position_only: bool, use_clip: bool):
    """Run ``num_epochs`` Adam epochs as one compiled scan. Returns per-epoch
    losses for host-side plateau/early-stop logic."""
    optimiser = optax.adam(learning_rate=1.0)  # scaled by lr below

    def epoch(carry, _):
        params, opt_state = carry

        # Constraint projection (outside the gradient): unit quaternions and
        # bounded inter-frame distance.
        params = dict(params)
        params["q"] = T.quat_normalize(params["q"])

        if use_clip:
            params["t"] = _clip_frame_distances(params["t"], max_frame_distance)

        loss, grads = jax.value_and_grad(loss_fn)(params, features, intrinsics)

        # Pin the first frame; optionally freeze all rotations.
        grads = dict(grads)
        grads["t"] = grads["t"].at[0].set(0.0)
        if position_only:
            grads["q"] = jnp.zeros_like(grads["q"])
        else:
            grads["q"] = grads["q"].at[0].set(0.0)

        updates, opt_state = optimiser.update(grads, opt_state, params)
        # Adam is invariant to gradient scale, so the dynamic learning rate
        # must scale the *updates* (keeps lr a traced value — no recompiles
        # when the host's plateau scheduler lowers it).
        updates = jax.tree.map(lambda u: u * learning_rate, updates)
        params = optax.apply_updates(params, updates)

        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state), None,
                                               length=num_epochs)
    return params, opt_state, losses


def optimise_packed_features(features: dict, intrinsics, params,
                             options: OptimisationOptions,
                             residual_type: ResidualType,
                             frame_size: Tuple[int, int], fps: float,
                             smooth_trajectory: bool = True, mesh=None):
    """The production optimisation loop over packed correspondence arrays:
    compiled Adam epoch chunks (:func:`_run_epoch_chunk`) with host-side
    LR-plateau reduction, early stopping and optional mid-run checkpointing.

    This is the single compiled training step of the framework — both
    :class:`PoseOptimiser` and the driver's multi-chip dryrun run exactly
    this code.

    :param features: packed correspondences from ``PoseOptimiser._pack_features``
        (weight-masked; padding rows carry weight 0). With ``mesh``, the
        leading axis must divide by the mesh size.
    :param mesh: optional device mesh. Correspondence arrays shard over the
        mesh's first axis; parameters and optimiser state replicate, so the
        per-epoch gradient reduction lowers to an XLA ``psum`` over ICI
        (inserted by sharding propagation — no explicit collectives).
    """
    loss_fn = _make_loss_fn(
        residual_type=residual_type, alignment=options.alignment_type,
        smooth=smooth_trajectory, position_only=options.position_only,
        pose_t_reg=options.pose_t_reg, pose_r_reg=options.pose_r_reg,
        l2_reg=options.l2_regularisation, frame_size=frame_size)

    params = jax.tree.map(jnp.asarray, dict(params))
    optimiser = optax.adam(learning_rate=1.0)
    opt_state = optimiser.init(params)

    if mesh is not None:
        from hive_tpu.parallel.mesh import replicate, shard_batch

        m = len(features["weight"])
        if m % int(mesh.devices.size) != 0:
            raise ValueError(f"{m} correspondences do not divide over "
                             f"{mesh.devices.size} devices; pad first.")

        features = {k: shard_batch(mesh, jnp.asarray(v))
                    for k, v in features.items()}
        intrinsics = replicate(mesh, intrinsics)
        params = jax.tree.map(lambda a: replicate(mesh, a), params)
        opt_state = jax.tree.map(lambda a: replicate(mesh, jnp.asarray(a)),
                                 opt_state)

    lr = options.learning_rate
    use_clip = options.clip_distance is not None
    max_frame_distance = (options.clip_distance or 0.0) / max(fps, 1e-6)

    early_stopping = EarlyStopping(patience=options.early_stopping_patience,
                                   min_difference=options.min_loss_delta)
    plateau_best = float("inf")
    plateau_count = 0

    epochs_done = 0

    # Optional mid-run checkpointing (pre-emption safety for long runs).
    manager = None
    if options.checkpoint_dir:
        from hive_tpu.checkpoint import CheckpointManager

        manager = CheckpointManager(options.checkpoint_dir)
        restored, meta = manager.restore()

        if restored is not None:
            _, treedef = jax.tree.flatten((params, opt_state))
            leaves = [jnp.asarray(leaf) for leaf in restored]
            params, opt_state = jax.tree.unflatten(treedef, leaves)
            if mesh is not None:
                # Restored leaves are plain default-device arrays; the
                # sharded path's contract (params/opt_state REPLICATE over
                # the mesh, established above) must be re-applied or the
                # next epoch chunk sees incompatible placements (review
                # finding, r5).
                from hive_tpu.parallel.mesh import replicate

                params = jax.tree.map(lambda a: replicate(mesh, a), params)
                opt_state = jax.tree.map(lambda a: replicate(mesh, a),
                                         opt_state)
            epochs_done = int(meta.get("epochs_done", 0))
            lr = float(meta.get("lr", lr))
            logging.info(f"Resumed pose optimisation from epoch {epochs_done}.")

    chunks_since_checkpoint = 0

    while epochs_done < options.num_epochs:
        chunk = min(options.epochs_per_chunk, options.num_epochs - epochs_done)

        params, opt_state, losses = _run_epoch_chunk(
            params, opt_state, features, intrinsics,
            jnp.float32(lr), jnp.float32(max_frame_distance),
            loss_fn=loss_fn, num_epochs=chunk,
            position_only=options.position_only, use_clip=use_clip)

        losses = np.asarray(losses)
        epochs_done += chunk

        stop = False
        for loss in losses:
            loss = float(loss)

            # ReduceLROnPlateau (threshold-abs mode).
            if loss < plateau_best - options.min_loss_delta:
                plateau_best = loss
                plateau_count = 0
            else:
                plateau_count += 1
                if plateau_count > options.lr_scheduler_patience:
                    lr *= 0.1
                    plateau_count = 0
                    logging.debug(f"Reducing learning rate to {lr:.2e}")

            if early_stopping.step(loss):
                stop = True
                break

        logging.debug(f"Epoch {epochs_done}: loss={float(losses[-1]):.6f} lr={lr:.2e}")

        chunks_since_checkpoint += 1
        if manager is not None \
                and chunks_since_checkpoint >= options.checkpoint_every_chunks:
            leaves, _ = jax.tree.flatten((params, opt_state))
            manager.save(epochs_done, [np.asarray(leaf) for leaf in leaves],
                         metadata={"epochs_done": epochs_done, "lr": lr})
            chunks_since_checkpoint = 0

        if stop or not np.isfinite(losses[-1]):
            break

    params["q"] = T.quat_normalize(params["q"])
    return params


# ---------------------------------------------------------------------------
# PoseOptimiser.
# ---------------------------------------------------------------------------

class PoseOptimiser:
    """Optimises the camera trajectory of an RGB-D sequence.

    Pipeline (ref pose_optimisation.py:990-1033): sample frame pairs → extract
    features → pairwise alignment → global alignment → optional fine-tune →
    interpolate uncovered frames → optional EMA smoothing.
    """

    DEBUG_FOLDER = "pose_optim"

    def __init__(self, dataset: HiveDataset,
                 frame_sampling: FrameSamplingMode = FrameSamplingMode.Hierarchical,
                 feature_extraction_options=FeatureExtractionOptions(),
                 optimisation_options=OptimisationOptions(), debug: bool = True):
        self.dataset = dataset
        self.frame_sampling = frame_sampling
        self.feature_extraction_options = feature_extraction_options
        self.optimisation_options = optimisation_options
        self.debug = debug
        self.debug_path: Optional[str] = None

    # -- public API ----------------------------------------------------------
    def run(self, num_frames: int = -1) -> Tuple[Trajectory, np.ndarray, np.ndarray]:
        if num_frames == -1:
            num_frames = self.dataset.num_frames

        self._setup_debug_folder()

        frame_pairs = sample_frame_pairs(self.frame_sampling, self.dataset.num_frames)
        feature_set = self._extract_feature_points(frame_pairs)

        initial = self.dataset.camera_trajectory[:num_frames]
        params = self._init_params(initial)

        if num_frames != self.dataset.num_frames:
            feature_set = feature_set.sample_at(range(num_frames))

        params = self._optimise_pose(feature_set, params, num_frames)

        trajectory = self._params_to_trajectory(params)
        trajectory = self._interpolate_poses_without_matches(feature_set, trajectory)

        if self.optimisation_options.trajectory_smoothing:
            trajectory = self._smooth_trajectory(
                trajectory, weight=self.optimisation_options.trajectory_smoothing)

        scale = np.asarray(params["scale"])
        shift = np.asarray(params["shift"])

        if self.debug and self.debug_path:
            trajectory.save(pjoin(self.debug_path, "optimised_camera_trajectory.txt"))
            np.savetxt(pjoin(self.debug_path, "scale.txt"), scale.reshape(num_frames, -1)
                       if scale.size else scale)
            np.savetxt(pjoin(self.debug_path, "shift.txt"), shift.reshape(num_frames, -1)
                       if shift.size else shift)

        return trajectory, scale, shift

    # -- setup ----------------------------------------------------------------
    def _setup_debug_folder(self):
        if self.debug:
            self.debug_path = pjoin(str(self.dataset.base_path), self.DEBUG_FOLDER)
            os.makedirs(self.debug_path, exist_ok=True)

    def _extract_feature_points(self, frame_pairs: FramePairs) -> FeatureSet:
        extractor = FeatureExtractor(self.dataset, frame_pairs,
                                     self.feature_extraction_options,
                                     debug_path=self.debug_path)
        feature_set = extractor.extract_feature_points()
        return feature_set.subset_from(frame_pairs)

    def _init_params(self, initial_trajectory: np.ndarray) -> Dict[str, jnp.ndarray]:
        n = len(initial_trajectory)
        alignment = self.optimisation_options.alignment_type

        if alignment == AlignmentType.Affine:
            scale = jnp.ones((n,), dtype=jnp.float32)
            shift = jnp.zeros((n,), dtype=jnp.float32)
        elif alignment == AlignmentType.Deformable:
            scale = jnp.ones((n, 3, 3), dtype=jnp.float32)
            shift = jnp.zeros((n, 3, 3), dtype=jnp.float32)
        else:
            scale = jnp.zeros((0,), dtype=jnp.float32)
            shift = jnp.zeros((0,), dtype=jnp.float32)

        return {
            "q": jnp.asarray(initial_trajectory[:, :4], dtype=jnp.float32),
            "t": jnp.asarray(initial_trajectory[:, 4:], dtype=jnp.float32),
            "scale": scale,
            "shift": shift,
        }

    @staticmethod
    def _params_to_trajectory(params) -> Trajectory:
        q = np.asarray(params["q"], dtype=np.float64)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        t = np.asarray(params["t"], dtype=np.float64)
        return Trajectory(np.hstack([q, t]))

    # -- feature packing -------------------------------------------------------
    @staticmethod
    def _pack_features(feature_set: FeatureSet, pad_to: Optional[int] = None) -> dict:
        """Correspondence arrays → padded device dict with a validity weight."""
        m = len(feature_set)
        size = pad_to if pad_to is not None else m

        def pad(a):
            out = np.zeros((size, *a.shape[1:]), dtype=a.dtype)
            out[:m] = a
            return jnp.asarray(out)

        weight = np.zeros(size, dtype=np.float32)
        weight[:m] = 1.0

        return {
            "idx_i": pad(feature_set.frame_i.index.astype(np.int32)),
            "points_i": pad(feature_set.frame_i.points.astype(np.float32)),
            "depth_i": pad(np.maximum(feature_set.frame_i.depth.astype(np.float32), 1e-6)),
            "idx_j": pad(feature_set.frame_j.index.astype(np.int32)),
            "points_j": pad(feature_set.frame_j.points.astype(np.float32)),
            "depth_j": pad(np.maximum(feature_set.frame_j.depth.astype(np.float32), 1e-6)),
            "weight": jnp.asarray(weight),
        }

    # -- optimisation steps ----------------------------------------------------
    def _visualise_solution(self, params, label: str) -> None:
        """Save an XY/XZ plot of the current solution's camera positions.

        Parity with the reference's per-step debug plots (ref
        pose_optimisation.py:1590-1616, called at :1141/:1166/:1181): one
        ``<label>.png`` under ``debug_path`` before the first step and after
        every optimisation step, so a diverging step is visible at a glance.
        """
        if not (self.debug and self.debug_path):
            return
        try:
            self._params_to_trajectory(params).plot(
                pjoin(self.debug_path, f"{label}.png"))
        except Exception as exc:  # noqa: BLE001 — plots must never kill a run
            logging.warning(f"Trajectory plot {label!r} failed: {exc}")

    def _optimise_pose(self, feature_set: FeatureSet, params, num_frames: int):
        options = self.optimisation_options
        num_steps = len(options.steps) + (1 if options.fine_tune else 0)

        self._visualise_solution(params, "initial_trajectory")

        for i, step in enumerate(options.steps):
            logging.info(f"Optimisation step {i + 1}/{num_steps}: {step.name} alignment")

            residual_type = (ResidualType.Image2D
                             if step in (OptimisationStep.PairWise2D, OptimisationStep.Global2D)
                             else ResidualType.World3D)

            if step in (OptimisationStep.PairWise2D, OptimisationStep.PairWise3D):
                params = self._optimise_pairwise(feature_set, params, residual_type,
                                                 num_frames)
            else:
                params = self._optimisation_loop(feature_set, params, options,
                                                 residual_type)

            self._visualise_solution(params, f"{i + 1}_{step.name}")

        if options.fine_tune:
            logging.info(f"Optimisation step {num_steps}/{num_steps}: fine-tune (no smoothing)")
            params = self._optimisation_loop(feature_set, params, options,
                                             ResidualType.World3D, smooth_trajectory=False)
            self._visualise_solution(params, f"{num_steps}_FineTune")  # contiguous with the 1-based step labels

        return params

    def _optimise_pairwise(self, feature_set: FeatureSet, params,
                           residual_type: ResidualType, num_frames: int):
        """Align consecutive pairs independently, then chain relative poses.

        Two interleaved no-overlap passes (so pairs don't interact through
        gradients) and a chaining pass, as in the reference
        (pose_optimisation.py:1185-1254).
        """
        options = self.optimisation_options.copy()
        options.alignment_type = AlignmentType.Rigid

        pose_data = {}

        for mode in (FrameSamplingMode.ConsecutiveNoOverlap,
                     FrameSamplingMode.ConsecutiveNoOverlapOffset):
            frame_pairs = sample_frame_pairs(mode, num_frames)
            subset = feature_set.subset_from(frame_pairs)

            if len(subset) == 0:
                # No matches for this whole mode: fill its pairs from the
                # UNOPTIMISED trajectory rather than dropping them — the
                # chaining loop below maps merged-list position to frame
                # index, so a missing every-other pair would assign each
                # remaining pair's relative pose to the wrong frame and
                # shift every downstream frame (review finding, r5; the
                # reference also fills unmatched pairs from the input
                # trajectory).
                trajectory = self._params_to_trajectory(params)
            else:
                rigid_params = {**params,
                                "scale": jnp.zeros((0,), dtype=jnp.float32),
                                "shift": jnp.zeros((0,), dtype=jnp.float32)}
                optimised = self._optimisation_loop(subset, rigid_params,
                                                    options, residual_type)
                trajectory = self._params_to_trajectory(optimised)

            for pair in frame_pairs:
                pose_data[tuple(pair)] = trajectory[list(pair)]

        if not pose_data:
            return params

        merged = [get_identity_pose()]
        previous = merged[0]

        for i, j in sorted(pose_data.keys()):
            pose_i, pose_j = pose_data[(i, j)]
            relative = subtract_pose(pose_i, pose_j)
            previous = add_pose(previous, relative)
            merged.append(previous)

        merged = np.asarray(merged)

        # Keep any trailing frames beyond the chained range unchanged.
        chained = {**params}
        n = min(len(merged), len(np.asarray(params["q"])))
        chained["q"] = jnp.asarray(params["q"]).at[:n].set(
            jnp.asarray(merged[:n, :4], dtype=jnp.float32))
        chained["t"] = jnp.asarray(params["t"]).at[:n].set(
            jnp.asarray(merged[:n, 4:], dtype=jnp.float32))

        return chained

    def _optimisation_loop(self, feature_set: FeatureSet, params,
                           options: OptimisationOptions,
                           residual_type: ResidualType,
                           smooth_trajectory: bool = True):
        """The compiled Adam loop with host-side LR plateau + early stopping.

        Under a multi-device runtime (``--num_devices``), correspondences pad
        to a multiple of the mesh size and shard over its data axis.
        """
        if len(feature_set) == 0:
            logging.warning("No correspondences available; skipping optimisation loop.")
            return params

        from hive_tpu.parallel.runtime import runtime_mesh

        mesh = runtime_mesh()
        pad_to = None
        if mesh is not None:
            n = int(mesh.devices.size)
            pad_to = -(-len(feature_set) // n) * n

        features = self._pack_features(feature_set, pad_to=pad_to)
        K = feature_set.camera_matrix
        intrinsics = jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], dtype=jnp.float32)

        return optimise_packed_features(
            features, intrinsics, params, options,
            residual_type=residual_type,
            frame_size=(self.dataset.frame_width, self.dataset.frame_height),
            fps=self.dataset.fps, smooth_trajectory=smooth_trajectory,
            mesh=mesh)

    # -- post-processing -------------------------------------------------------
    @staticmethod
    def _interpolate_poses_without_matches(feature_set: FeatureSet,
                                           trajectory: Trajectory) -> Trajectory:
        """Slerp/lerp over gaps in feature coverage (ref :1521-1569)."""
        num_frames = len(trajectory)
        covered = set(int(i) for i in np.concatenate([feature_set.frame_i.index,
                                                      feature_set.frame_j.index])
                      if i < num_frames)

        uncovered = [i for i in range(num_frames) if i not in covered]

        if not uncovered or not covered:
            return trajectory

        values = trajectory.values.copy()

        # Build gap chunks of consecutive uncovered frames.
        chunks: List[List[int]] = []
        chunk: List[int] = []

        for i in range(num_frames):
            if i in covered:
                if chunk:
                    chunks.append(chunk)
                    chunk = []
            else:
                chunk.append(i)

        if chunk:
            chunks.append(chunk)

        for chunk in chunks:
            start = max(0, chunk[0] - 1)
            end = min(chunk[-1] + 1, num_frames - 1)

            if start == end:
                continue

            alphas = np.linspace(0.0, 1.0, num=end - start + 1)
            q = np.asarray(T.quat_slerp(
                jnp.asarray(np.tile(values[start, :4], (len(alphas), 1)), dtype=jnp.float32),
                jnp.asarray(np.tile(values[end, :4], (len(alphas), 1)), dtype=jnp.float32),
                jnp.asarray(alphas[:, None], dtype=jnp.float32)))
            t = (values[start, 4:] * (1 - alphas[:, None])
                 + values[end, 4:] * alphas[:, None])

            values[start:end + 1, :4] = q
            values[start:end + 1, 4:] = t

        return Trajectory(values)

    @staticmethod
    def _smooth_trajectory(trajectory: Trajectory, weight: float = 0.9) -> Trajectory:
        """EMA smoothing of the positions (ref :1571-1588)."""
        smoothed = trajectory.copy()

        for i in range(1, len(smoothed)):
            smoothed.positions[i] = (weight * trajectory.positions[i]
                                     + (1 - weight) * smoothed.positions[i - 1])

        return smoothed


# ---------------------------------------------------------------------------
# ForegroundPoseOptimiser.
# ---------------------------------------------------------------------------

class ForegroundPoseOptimiser:
    """Smooths foreground-object centroid motion by refining the trajectory.

    (ref pose_optimisation.py:1618-1711; the chunked loss is compiled once per
    dataset — chunks are static — and all epochs run on device.)
    """

    def __init__(self, dataset: HiveDataset, learning_rate: float = 1e-5,
                 num_epochs: int = 100):
        self.dataset = dataset
        self.learning_rate = learning_rate
        self.num_epochs = num_epochs

    def run(self) -> Trajectory:
        num_frames = self.dataset.num_frames

        def centroid(index):
            depth = self.dataset.depth_dataset[index]
            mask = self.dataset.mask_dataset[index] > 0
            valid = mask & (depth > 0)

            if valid.sum() == 0:
                return None

            from hive_tpu.geometric import point_cloud_from_depth

            cloud = point_cloud_from_depth(depth, mask, self.dataset.camera_matrix)
            return np.mean(cloud, axis=0)

        centroids_list = tqdm_imap(centroid, list(range(num_frames)))

        centroids = np.zeros((num_frames, 3))
        has_fg = np.zeros(num_frames, dtype=bool)

        for i, c in enumerate(centroids_list):
            if c is not None:
                centroids[i] = c
                has_fg[i] = True

        # Split into chunks of >= 3 consecutive frames with foreground.
        chunks: List[List[int]] = []
        chunk: List[int] = []

        for i in range(num_frames):
            if has_fg[i]:
                chunk.append(i)
            else:
                if len(chunk) >= 3:
                    chunks.append(chunk)
                chunk = []

        if len(chunk) >= 3:
            chunks.append(chunk)

        if not chunks:
            return self.dataset.camera_trajectory.copy()

        trajectory = self.dataset.camera_trajectory.values
        q0 = jnp.asarray(trajectory[:, :4], dtype=jnp.float32)
        t0 = jnp.asarray(trajectory[:, 4:], dtype=jnp.float32)
        cents = jnp.asarray(centroids, dtype=jnp.float32)

        # Ground-truth world centroids under the initial trajectory.
        q_norm = T.quat_normalize(q0)
        gt_world = T.quat_rotate(T.quat_conjugate(q_norm), cents - t0)

        chunk_indices = [jnp.asarray(c, dtype=jnp.int32) for c in chunks]

        def safe_norm(x):
            return jnp.sqrt(jnp.sum(jnp.square(x), axis=1) + 1e-12)

        def loss_fn(params):
            q, t = params
            loss = 0.0

            for idx in chunk_indices:
                qc = T.quat_normalize(q[idx])
                tc = t[idx]

                world = T.quat_rotate(T.quat_conjugate(qc), cents[idx] - tc)

                error_geom = jnp.mean(safe_norm(gt_world[idx] - world))
                error_temp = jnp.mean(safe_norm(tc[:-2] - 2 * tc[1:-1] + tc[2:]))
                error_vel = jnp.mean(safe_norm(tc[:-1] - tc[1:]))

                loss += 0.01 * error_geom + 0.1 * error_temp + 0.1 * error_vel

            return loss

        optimiser = optax.adamw(learning_rate=self.learning_rate, weight_decay=1e-4)
        params = (q0, t0)
        opt_state = optimiser.init(params)

        @jax.jit
        def run_all(params, opt_state):
            def epoch(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optimiser.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state), None,
                                                       length=self.num_epochs)
            return params, losses

        (q, t), losses = run_all(params, opt_state)
        logging.info(f"Foreground pose optimisation: final loss {float(losses[-1]):.6f}")

        q = np.asarray(T.quat_normalize(q), dtype=np.float64)
        return Trajectory(np.hstack([q, np.asarray(t, dtype=np.float64)]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_path", type=str, help="Path to the HIVE formatted dataset.")
    parser.add_argument("--num_frames", type=int, default=-1,
                        help="Number of frames to optimise. -1 (default) uses all frames.")
    parser.add_argument("--fine_tune", action="store_true",
                        help="Run an extra fine-tuning pass after the main optimisation.")
    parser.add_argument("--params_init", type=str, choices=["gt", "random"], default="gt",
                        help="Source of the initial camera trajectory.")
    parser.add_argument("--random_seed", type=int, default=None,
                        help="Random seed when initialising the trajectory randomly.")
    args = parser.parse_args()

    if not HiveDataset.is_valid_folder_structure(args.dataset_path):
        raise RuntimeError(f"No valid HIVE dataset found at {args.dataset_path}.")

    dataset = HiveDataset(args.dataset_path)

    num_frames = args.num_frames
    if num_frames == -1:
        num_frames = dataset.num_frames
    elif num_frames < 2:
        raise RuntimeError(f"--num_frames must be at least 2, but got {num_frames}.")

    if args.params_init == "random":
        from scipy.spatial.transform import Rotation

        with temp_seed(args.random_seed or 0):
            dataset.camera_trajectory[:, :4] = Rotation.random(
                len(dataset), random_state=args.random_seed).as_quat()
            dataset.camera_trajectory[:, 4:] = np.random.normal(
                loc=0.0, scale=0.1, size=(len(dataset), 3))

    optimiser = PoseOptimiser(
        dataset,
        feature_extraction_options=FeatureExtractionOptions(min_features=40,
                                                            max_features=2048),
        optimisation_options=OptimisationOptions(num_epochs=20000, learning_rate=1e-2,
                                                 lr_scheduler_patience=50,
                                                 fine_tune=args.fine_tune))
    trajectory, _, _ = optimiser.run(num_frames)

    if optimiser.debug_path:
        from hive_tpu.fusion import tsdf_fusion
        from hive_tpu.meshing.ply import save_ply
        from hive_tpu.options import BackgroundMeshOptions

        reconstruction_options = BackgroundMeshOptions(sdf_max_voxels=80_000_000)

        logging.info("Fusing a debug mesh from the pre-optimisation poses...")
        mesh_before = tsdf_fusion(dataset, options=reconstruction_options,
                                  num_frames=num_frames)
        save_ply(pjoin(optimiser.debug_path, "before.ply"), mesh_before)

        dataset.camera_trajectory = trajectory
        logging.info("Running TSDFFusion on final pose data...")
        mesh_after = tsdf_fusion(dataset, options=reconstruction_options,
                                 num_frames=num_frames)
        save_ply(pjoin(optimiser.debug_path, "after.ply"), mesh_after)


if __name__ == "__main__":
    main()
