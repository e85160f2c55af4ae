"""Dataset adaptors: ingest TUM / Unreal / StrayScanner / plain-video inputs
into the HIVE dataset format, with optional depth and pose estimation.

Capability parity with reference hive/dataset_adaptors.py (DatasetAdaptor:57,
convert:176, _estimate_camera_parameters:339, _inpaint_frame_data:473,
TUMAdaptor:574, UnrealAdaptor:769, VideoAdaptorBase:854, VideoAdaptor:1023,
DeviceOrientation:1094, StrayScannerAdaptor:1158, estimate_depth_dpt:1346,
get_dataset:1438). TPU-native differences:

* depth estimation runs the Flax DPT model batched under one jit
  (:mod:`hive_tpu.models.dpt`) instead of a per-frame torch loop;
* video frames extract with cv2 (sequential decode + threaded writes) — no
  ffmpeg subprocess dependency;
* inpainting routes through :mod:`hive_tpu.models.lama` (JAX) or cv2.
"""

from __future__ import annotations

import enum
import logging
import os
import shutil
from abc import ABC
from os.path import join as pjoin
from pathlib import Path
from typing import List, Optional, Tuple, Union

import cv2
import imageio.v3 as iio
import numpy as np

from hive_tpu.custom_types import File, Size
from hive_tpu.geometric import CameraMatrix, Trajectory
from hive_tpu.image_processing import calculate_target_resolution
from hive_tpu.io import (COLMAPProcessor, Dataset, DatasetMetadata, HiveDataset,
                         ImageFolderDataset, InvalidDatasetFormatError, VideoMetadata,
                         create_masks, make_depth_map_transform)
from hive_tpu.options import (BackgroundMeshOptions, COLMAPOptions, InpaintingMode,
                              PipelineOptions, StorageOptions)
from hive_tpu.sensor import KinectSensor
from hive_tpu.utils import timed_block, tqdm_imap


def create_folder(*args, exist_ok: bool = False) -> str:
    path = pjoin(*args)
    os.makedirs(path, exist_ok=exist_ok)
    return str(path)


class DatasetAdaptor(Dataset, ABC):
    """Converts an input dataset into the HIVE format (rgb/depth/mask folders,
    camera files, metadata) — the dataset-creation pipeline."""

    def __init__(self, base_path: File, output_path: File, num_frames: int = -1,
                 frame_step: int = 1, colmap_options: COLMAPOptions = COLMAPOptions()):
        super().__init__(base_path=base_path)

        # realpath comparison: a trailing slash, './' prefix, or symlink
        # spelling of the same directory must not slip past this guard —
        # convert(no_cache=True) rmtree's output_path, which would DELETE
        # the user's input dataset (review finding, r5).
        if os.path.realpath(str(output_path)) == os.path.realpath(str(base_path)):
            raise RuntimeError(
                "A dataset adaptor must write to a different folder than it reads from.")

        self.output_path = output_path
        self.num_frames = num_frames
        self.frame_step = frame_step
        self.colmap_options = colmap_options

    # -- per-format API -------------------------------------------------------
    def get_full_num_frames(self) -> int:
        """Number of frames in the non-truncated dataset."""
        raise NotImplementedError

    def get_metadata(self, estimate_pose: bool, estimate_depth: bool) -> DatasetMetadata:
        raise NotImplementedError

    def get_camera_matrix(self) -> np.ndarray:
        """Ground-truth (3, 3) intrinsics, if the format provides them."""
        raise NotImplementedError

    def get_pose(self, index: int) -> np.ndarray:
        """Ground-truth pose 7-vector for a frame, if the format provides it."""
        raise NotImplementedError

    def get_camera_trajectory(self) -> Trajectory:
        return Trajectory(np.vstack([self.get_pose(i) for i in range(self.num_frames)]))

    def get_frame(self, index: int) -> np.ndarray:
        """The RGB frame at ``index``."""
        raise NotImplementedError

    def get_depth_map(self, index: int) -> np.ndarray:
        """Ground-truth uint16 millimetre depth at ``index``, if provided."""
        raise NotImplementedError

    def _resolve_num_frames(self, num_frames: int):
        """Clamp the requested frame count to what the dataset actually has."""
        full = self.get_full_num_frames()
        self.num_frames = full if num_frames == -1 else min(num_frames, full)

    # -- bulk copies ----------------------------------------------------------
    def copy_frames(self, output_path: str, num_frames: int = -1, file_extension: str = "png"):
        num_frames = self.num_frames if num_frames == -1 else num_frames

        def copy_image(index: int):
            image = self.get_frame(index)
            iio.imwrite(pjoin(output_path,
                              HiveDataset.index_to_filename(index, file_extension)), image)

        tqdm_imap(copy_image, range(num_frames))

    def copy_depth_maps(self, output_path: str):
        def copy_image(index: int):
            image = self.get_depth_map(index)
            iio.imwrite(pjoin(output_path, HiveDataset.index_to_filename(index)), image)

        tqdm_imap(copy_image, range(self.num_frames))

    # -- conversion pipeline --------------------------------------------------
    def convert(self, estimate_pose: bool, estimate_depth: bool,
                inpainting_mode: InpaintingMode, static_camera: bool = False,
                no_cache: bool = False, profiling: Optional[dict] = None) -> HiveDataset:
        """Create the HIVE dataset: metadata → frames → masks → depth →
        camera parameters → optional inpainting (ref :176-266)."""
        if no_cache and os.path.exists(self.output_path):
            logging.warning(f"`no_cache` requested — deleting the cached conversion at "
                            f"{self.output_path}.")
            shutil.rmtree(self.output_path)
        elif cached := self._try_get_cached_dataset(estimate_pose, estimate_depth):
            logging.info(f"Reusing the cached converted dataset at {self.output_path}.")
            return cached

        logging.info(f"Converting {self.base_path} -> {self.output_path} (HIVE format).")

        image_folder, depth_folder, mask_folder = self._setup_folders(exist_ok=not no_cache)

        with timed_block("Writing dataset metadata.", profiling,
                         ["timing", "load_dataset", "create_metadata"]):
            metadata = self.get_metadata(estimate_pose, estimate_depth)
            metadata.save(pjoin(str(self.output_path), HiveDataset.metadata_filename))

        with timed_block("Copying RGB frames.", profiling,
                         ["timing", "load_dataset", "copy_frames"]):
            self.copy_frames(image_folder, file_extension="jpg")

        with timed_block(None, profiling,
                         ["timing", "load_dataset", "create_instance_segmentation_masks"]):
            create_masks(ImageFolderDataset(image_folder), mask_folder=mask_folder)

        with timed_block(None, profiling, ["timing", "load_dataset", "get_depth_maps"]):
            if estimate_depth:
                logging.info("Estimating depth maps.")
                estimate_depth_dpt(ImageFolderDataset(image_folder), depth_folder)
            else:
                logging.info("Copying depth maps.")
                self.copy_depth_maps(depth_folder)

        with timed_block(None, profiling, ["timing", "load_dataset", "get_camera_parameters"]):
            if static_camera:
                # The DPT depth model was trained on Kinect data, so the Kinect
                # intrinsics are the sensible static-camera default.
                camera = KinectSensor.get_camera_matrix()

                if metadata.height > metadata.width:
                    camera = camera.transpose()

                camera_matrix = camera.scale((metadata.height, metadata.width)).matrix
                camera_trajectory = Trajectory(
                    np.tile([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], (metadata.num_frames, 1)))
            elif estimate_pose:
                debug_folder = pjoin(str(self.output_path), "debug")
                camera_matrix, camera_trajectory = self._estimate_camera_parameters(
                    debug_folder, depth_folder, metadata, file_extension="jpg")
            else:
                camera_matrix = self.get_camera_matrix()
                camera_trajectory = self.get_camera_trajectory()

            np.savetxt(pjoin(str(self.output_path), HiveDataset.camera_matrix_filename),
                       camera_matrix)
            camera_trajectory.save(
                pjoin(str(self.output_path), HiveDataset.camera_trajectory_filename))

        with timed_block(None, profiling, ["timing", "load_dataset", "inpainting"]):
            self._inpaint_frame_data(mode=inpainting_mode)

        logging.info(f"Converted dataset ready at {self.output_path}.")
        return HiveDataset(self.output_path)

    def _try_get_cached_dataset(self, estimate_pose: bool,
                                estimate_depth: bool) -> Optional[HiveDataset]:
        """Reuse a previous conversion iff folder structure, frame counts and
        metadata all match (ref :268-300)."""
        if not HiveDataset.is_valid_folder_structure(self.output_path):
            return None

        dataset = HiveDataset(self.output_path)

        num_frames = len(os.listdir(dataset.path_to_rgb_frames))
        num_depth_maps = len(os.listdir(dataset.path_to_depth_maps))
        same_num_frames = self.num_frames in (num_frames, num_depth_maps)
        same_trajectory_length = len(dataset.camera_trajectory) == self.num_frames
        same_metadata = dataset.metadata == self.get_metadata(estimate_pose, estimate_depth)

        if same_num_frames and same_trajectory_length and same_metadata:
            return dataset

        return None

    def _setup_folders(self, exist_ok: bool = False) -> Tuple[str, str, str]:
        if not exist_ok and os.path.isdir(self.output_path):
            raise RuntimeError(f"Output path {self.output_path} exists already — "
                               f"pick another output path or pass `--no_cache` to replace it.")

        os.makedirs(self.output_path, exist_ok=exist_ok)

        return (create_folder(self.output_path, HiveDataset.rgb_folder, exist_ok=exist_ok),
                create_folder(self.output_path, HiveDataset.depth_folder, exist_ok=exist_ok),
                create_folder(self.output_path, HiveDataset.mask_folder, exist_ok=exist_ok))

    @staticmethod
    def _get_frame_subset(num_frames: int, frame_step: int):
        """All frame indices + the frame_step subsample (always keeping the
        last frame so interpolation has both endpoints)."""
        frames = list(range(num_frames))
        subset = frames[::frame_step]

        if subset[-1] != frames[-1]:
            subset.append(frames[-1])

        return frames, subset

    # -- pose estimation ------------------------------------------------------
    def _estimate_camera_parameters(self, output_folder: str, output_depth_folder: str,
                                    metadata: DatasetMetadata,
                                    file_extension: str = "png") -> Tuple[np.ndarray, Trajectory]:
        """Estimate intrinsics + trajectory with COLMAP on a frame subset, then
        metric-scale and re-densify (ref :339-398).

        Falls back to the built-in depth-assisted PnP odometry
        (:mod:`hive_tpu.sfm`) when the COLMAP binary is unavailable — the
        reference hard-fails in that case.
        """
        if not os.path.isfile(self.colmap_options.binary_path):
            logging.warning(f"COLMAP binary not found at "
                            f"{self.colmap_options.binary_path}; using the native "
                            f"PnP-odometry pose estimator instead.")
            return self._estimate_camera_parameters_native(output_depth_folder, metadata)

        if os.path.exists(output_folder):
            shutil.rmtree(output_folder)

        colmap_folder = create_folder(output_folder, "colmap")
        colmap_rgb_path = create_folder(colmap_folder, "rgb")
        colmap_workspace_path = create_folder(colmap_folder, "workspace")

        frames, frames_subset = self._get_frame_subset(self.num_frames, self.frame_step)

        logging.info("Staging RGB frames for the COLMAP run...")
        self.copy_frames(colmap_rgb_path, self.num_frames, file_extension=file_extension)

        if self.frame_step > 1:
            # Keep only the subset, renumbered densely for COLMAP.
            for index in set(frames).difference(frames_subset):
                os.remove(pjoin(colmap_rgb_path,
                                HiveDataset.index_to_filename(index, file_extension)))

            for dst_index, src_index in enumerate(frames_subset):
                shutil.move(
                    pjoin(colmap_rgb_path,
                          HiveDataset.index_to_filename(src_index, file_extension)),
                    pjoin(colmap_rgb_path,
                          HiveDataset.index_to_filename(dst_index, file_extension)))

        logging.info("Starting the COLMAP reconstruction (this can take a long time)...")
        processor = COLMAPProcessor(image_path=colmap_rgb_path,
                                    workspace_path=colmap_workspace_path,
                                    colmap_options=self.colmap_options)
        processor.run()

        camera_matrix, camera_poses_scaled = self._get_scaled_colmap_camera_params(
            processor, output_depth_folder, metadata, frames_subset)

        if self.frame_step > 1:
            pose_mapping = {frame_index: pose for frame_index, pose
                            in zip(frames_subset, camera_poses_scaled)}
            camera_poses_scaled = Trajectory.create_by_interpolating(
                pose_mapping, frame_count=self.num_frames)

        camera_poses_scaled = Trajectory(camera_poses_scaled[:self.num_frames])
        return camera_matrix, camera_poses_scaled.normalise()

    def _estimate_camera_parameters_native(self, output_depth_folder: str,
                                           metadata: DatasetMetadata) -> Tuple[np.ndarray, Trajectory]:
        """Pose estimation without external binaries: PnP odometry against the
        (estimated) depth maps. Intrinsics use the Kinect prior scaled to the
        frame size — the same prior as the static-camera path (the depth
        network was trained on Kinect data)."""
        from hive_tpu.sfm import estimate_camera_poses_native

        camera = KinectSensor.get_camera_matrix()

        if metadata.height > metadata.width:
            camera = camera.transpose()

        camera_matrix = camera.scale((metadata.height, metadata.width)).matrix

        rgb_folder = pjoin(str(self.output_path), HiveDataset.rgb_folder)
        mask_folder = pjoin(str(self.output_path), HiveDataset.mask_folder)

        rgb_dataset = ImageFolderDataset(rgb_folder)
        mask_dataset = ImageFolderDataset(mask_folder)

        depth_transform = make_depth_map_transform(
            HiveDataset.depth_scaling_factor, metadata.max_depth)
        depth_dataset = ImageFolderDataset(output_depth_folder, transform=depth_transform)

        n = min(self.num_frames, len(rgb_dataset), len(depth_dataset))

        rgb_frames = tqdm_imap(rgb_dataset.__getitem__, range(n), show_progress=False)
        depth_maps = tqdm_imap(depth_dataset.__getitem__, range(n), show_progress=False)
        masks = tqdm_imap(mask_dataset.__getitem__, range(n), show_progress=False)

        trajectory = estimate_camera_poses_native(
            rgb_frames, depth_maps, camera_matrix, masks=masks,
            frame_step=self.frame_step)

        return camera_matrix, trajectory.normalise()

    def _get_scaled_colmap_camera_params(self, processor: COLMAPProcessor,
                                         output_depth_folder: str,
                                         metadata: DatasetMetadata,
                                         frames_subset: List[int]) -> Tuple[np.ndarray, Trajectory]:
        """Scale COLMAP's arbitrary-unit poses to metric using the ratio of
        estimated depth to COLMAP depth (median, ref :400-471)."""
        logging.info("Scaling COLMAP poses to metric depth...")
        camera_matrix, camera_poses = processor.load_camera_params(raw_pose=True)

        if processor.colmap_options.dense:
            colmap_depth = processor.get_dense_depth_maps(
                resize_to=(metadata.height, metadata.width))
        else:
            colmap_depth = processor.get_sparse_depth_maps(camera_matrix, camera_poses)

        transform = make_depth_map_transform(HiveDataset.depth_scaling_factor,
                                             metadata.max_depth)
        depth_dataset = ImageFolderDataset(output_depth_folder, transform=transform)
        subset = [i for i in frames_subset if i < len(depth_dataset)]
        est_depth = np.asarray(tqdm_imap(depth_dataset.__getitem__, subset))
        if len(colmap_depth) != len(est_depth):
            # A count mismatch means the frame pairing below is wrong —
            # scaling poses from misaligned frames silently corrupts every
            # camera position. Fail loudly instead of truncating.
            raise ValueError(
                f"COLMAP produced {len(colmap_depth)} dense depth maps but "
                f"{len(est_depth)} frames were estimated — cannot pair "
                f"frames for metric pose scaling")

        nonzero = (colmap_depth > 0.0) & (est_depth > 0.0)

        if not nonzero.any():
            # median of an empty selection is NaN and would silently corrupt
            # every pose; an unscaled trajectory is at least usable.
            logging.warning("No pixel has both COLMAP and estimated depth — "
                            "cannot recover metric scale; keeping COLMAP's "
                            "arbitrary scale (factor 1.0).")
            scaling_factor = 1.0
        else:
            scaling_factor = float(
                np.median(est_depth[nonzero] / colmap_depth[nonzero]))
        logging.info(f"Depth scale: {scaling_factor:.4f}")

        scaled = camera_poses.copy()
        scaled.values[:, 4:] *= scaling_factor

        if processor.colmap_options.dense:
            colmap_depth_output = create_folder(Path(output_depth_folder).parent,
                                                "colmap_depth", exist_ok=True)

            def save_depth(args):
                index, depth_map = args
                as_mm = (1000 * scaling_factor * depth_map).astype(np.uint16)
                iio.imwrite(pjoin(colmap_depth_output,
                                  HiveDataset.index_to_filename(index)), as_mm)

            tqdm_imap(save_depth, list(zip(subset, colmap_depth)))

        return camera_matrix, scaled

    # -- inpainting -----------------------------------------------------------
    def _inpaint_frame_data(self, mode: InpaintingMode):
        """Inpaint RGB + depth behind dynamic objects (ref :473-571)."""
        if mode == InpaintingMode.Off:
            return

        logging.info("Inpainting masked frame regions.")

        rgb_path = pjoin(str(self.output_path), HiveDataset.rgb_folder)
        depth_path = pjoin(str(self.output_path), HiveDataset.depth_folder)
        mask_path = pjoin(str(self.output_path), HiveDataset.mask_folder)

        rgb_filenames = sorted(os.listdir(rgb_path))
        depth_filenames = sorted(os.listdir(depth_path))
        mask_filenames = sorted(os.listdir(mask_path))

        inpainted_rgb_path = create_folder(self.output_path, HiveDataset.inpainted_rgb_folder,
                                           exist_ok=True)
        inpainted_depth_path = create_folder(self.output_path,
                                             HiveDataset.inpainted_depth_folder, exist_ok=True)
        inpainted_mask_path = create_folder(self.output_path,
                                            HiveDataset.inpainted_mask_folder, exist_ok=True)

        def create_mask(mask_filename):
            mask = cv2.imread(pjoin(mask_path, mask_filename), cv2.IMREAD_GRAYSCALE)
            mask = cv2.dilate(mask, np.ones((5, 5), np.uint8), iterations=5)
            cv2.imwrite(pjoin(inpainted_mask_path, mask_filename), mask)

        def inpaint_with_cv2(input_path, output_path, image_filename):
            mask_filename = f"{Path(image_filename).stem}.png"
            mask = cv2.imread(pjoin(inpainted_mask_path, mask_filename), cv2.IMREAD_GRAYSCALE)
            image = cv2.imread(pjoin(input_path, image_filename), cv2.IMREAD_UNCHANGED)
            inpainted = cv2.inpaint(image, mask, 30, cv2.INPAINT_TELEA)
            cv2.imwrite(pjoin(output_path, image_filename), inpainted)

        logging.info("Creating inpainting masks (dilated object masks)...")
        tqdm_imap(create_mask, mask_filenames)

        if InpaintingMode.CV2_Image in mode:
            logging.info("Inpainting RGB frames with cv2 (TELEA)...")
            tqdm_imap(lambda f: inpaint_with_cv2(rgb_path, inpainted_rgb_path, f),
                      rgb_filenames)
        elif InpaintingMode.Lama_Image in mode:
            logging.info("Inpainting RGB frames with LaMa...")
            from hive_tpu.models.lama import lama_inpaint_folder

            lama_inpaint_folder(image_dir=rgb_path, mask_dir=inpainted_mask_path,
                                output_dir=inpainted_rgb_path)
        else:
            raise RuntimeError(f"Inpainting mode {mode} names no image inpainter "
                               f"(and is not {InpaintingMode.Off}).")

        if InpaintingMode.CV2_Depth in mode:
            logging.info("Inpainting depth maps with cv2 (TELEA)...")
            tqdm_imap(lambda f: inpaint_with_cv2(depth_path, inpainted_depth_path, f),
                      depth_filenames)
        elif InpaintingMode.Lama_Depth in mode:
            logging.info("Inpainting depth maps with LaMa...")
            from hive_tpu.models.lama import lama_inpaint_folder

            lama_inpaint_folder(image_dir=depth_path, mask_dir=inpainted_mask_path,
                                output_dir=inpainted_depth_path, depth=True)
        else:
            raise RuntimeError(f"Inpainting mode should be {InpaintingMode.Off} or name a "
                               f"depth-inpainting backend.")

        # Inpainted data has no dynamic objects left, so downstream consumers
        # get all-black masks.
        def write_black_mask(filename):
            mask = cv2.imread(pjoin(inpainted_mask_path, filename), cv2.IMREAD_UNCHANGED)
            cv2.imwrite(pjoin(inpainted_mask_path, filename),
                        np.zeros(mask.shape, np.uint8))

        tqdm_imap(write_black_mask, mask_filenames)


class TUMAdaptor(DatasetAdaptor):
    """Ingests TUM RGB-D sequences (timestamped rgb/depth/groundtruth lists).

    Format docs: https://cvg.cit.tum.de/data/datasets/rgbd-dataset/file_formats
    (ref hive/dataset_adaptors.py:574-766).
    """

    fx, fy = 580.0, 580.0
    cx, cy = 319.5, 239.5
    width, height = 640, 480
    fps = 30.0

    intrinsic_matrix = np.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])

    pose_path = "groundtruth.txt"
    rgb_files_path = "rgb.txt"
    depth_map_files_path = "depth.txt"

    required_files = [pose_path, rgb_files_path, depth_map_files_path]
    required_folders = ["rgb", "depth"]

    def __init__(self, base_path: File, output_path: File, num_frames: int = -1,
                 frame_step: int = 1, colmap_options: COLMAPOptions = COLMAPOptions(),
                 is_16_bit: bool = True):
        super().__init__(base_path=base_path, output_path=output_path, num_frames=num_frames,
                         frame_step=frame_step, colmap_options=colmap_options)

        self.is_16_bit = is_16_bit
        # 16-bit PNGs store depth in units of 1/5000 m; 32-bit floats are meters.
        self.depth_scale_factor = 1.0 / 5000.0 if is_16_bit else 1.0

        (self.image_filenames, self.depth_filenames,
         self.camera_trajectory) = self._get_synced_frame_data()

        self._resolve_num_frames(num_frames)

        # TUM poses are cam-to-world; the pipeline wants world-to-cam, with the
        # scene upright (the dataset's convention leaves it rotated 90° about
        # x — same fix as ref :643-650).
        self.camera_trajectory = self.camera_trajectory.normalise_position().inverse()

        rotation = np.eye(4)
        rotation[1, 1] = 0.0
        rotation[1, 2] = 1.0
        rotation[2, 1] = -1.0
        rotation[2, 2] = 0.0  # -90° about x
        self.camera_trajectory = self.camera_trajectory.apply(rotation)

    def _get_synced_frame_data(self):
        """Associate RGB frames, depth maps and poses by nearest timestamp.

        The Kinect's three streams are unsynchronised; depth timestamps anchor
        the association (ref :653-729).
        """

        def load_list(path):
            timestamps, payloads = [], []

            with open(pjoin(str(self.base_path), path)) as fh:
                for line in fh:
                    line = line.strip()

                    if not line or line.startswith("#"):
                        continue

                    parts = line.split(" ")
                    timestamps.append(float(parts[0]))
                    payloads.append(parts[1:])

            return np.asarray(timestamps), payloads

        image_ts, image_rows = load_list(self.rgb_files_path)
        depth_ts, depth_rows = load_list(self.depth_map_files_path)
        pose_ts, pose_rows = load_list(self.pose_path)

        def nearest(query_ts, anchor_ts):
            deltas = np.abs(query_ts.reshape(-1, 1) - anchor_ts.reshape(1, -1))
            return deltas.argmin(axis=0)

        image_indices = nearest(image_ts, depth_ts)
        image_filenames = [Path(image_rows[i][0]).name for i in image_indices]
        depth_filenames = [Path(row[0]).name for row in depth_rows]

        pose_indices = nearest(pose_ts, depth_ts)
        poses = []
        for i in pose_indices:
            tx, ty, tz, qx, qy, qz, qw = map(float, pose_rows[i])
            poses.append((qx, qy, qz, qw, tx, ty, tz))

        return image_filenames, depth_filenames, Trajectory(np.asarray(poses))

    def get_full_num_frames(self) -> int:
        return len(self.image_filenames)

    def get_metadata(self, estimate_pose: bool, estimate_depth: bool) -> DatasetMetadata:
        return DatasetMetadata(
            num_frames=self.num_frames, frame_step=self.frame_step, fps=self.fps,
            width=self.width, height=self.height,
            estimate_pose=estimate_pose, estimate_depth=estimate_depth,
            depth_mask_dilation_iterations=BackgroundMeshOptions().depth_mask_dilation_iterations,
            depth_scale=HiveDataset.depth_scaling_factor, colmap_options=self.colmap_options)

    def get_camera_matrix(self) -> np.ndarray:
        return self.intrinsic_matrix

    def get_pose(self, index: int) -> np.ndarray:
        return self.camera_trajectory[index]

    def get_frame(self, index: int) -> np.ndarray:
        return iio.imread(pjoin(str(self.base_path), "rgb", self.image_filenames[index]))

    def get_depth_map(self, index: int) -> np.ndarray:
        depth = iio.imread(pjoin(str(self.base_path), "depth", self.depth_filenames[index]))
        meters = depth * self.depth_scale_factor
        return (1000 * meters).astype(np.uint16)


class UnrealAdaptor(DatasetAdaptor):
    """Ingests synthetic captures from Unreal Engine / UnrealCV
    (ref hive/dataset_adaptors.py:769-851)."""

    metadata_filename = "info.json"
    camera_matrix_filename = "camera.txt"
    camera_trajectory_filename = "trajectory.txt"

    required_files = [metadata_filename, camera_matrix_filename, camera_trajectory_filename]

    rgb_folder = "colour"
    depth_folder = "depth"
    required_folders = [rgb_folder, depth_folder]

    depth_scale_factor = 1.0 / 1000.0

    def __init__(self, base_path: File, output_path: File, num_frames: int = -1,
                 frame_step: int = 1, colmap_options: COLMAPOptions = COLMAPOptions()):
        super().__init__(base_path=base_path, output_path=output_path, num_frames=num_frames,
                         frame_step=frame_step, colmap_options=colmap_options)

        import json

        with open(pjoin(str(base_path), self.metadata_filename)) as fh:
            self.info = json.load(fh)

        self.camera_matrix = np.loadtxt(pjoin(str(base_path), self.camera_matrix_filename))

        trajectory = np.loadtxt(pjoin(str(base_path), self.camera_trajectory_filename))
        self.camera_trajectory = Trajectory(trajectory).inverse().normalise()

        self._resolve_num_frames(num_frames)

    def get_full_num_frames(self) -> int:
        return int(self.info["num_frames"])

    def get_metadata(self, estimate_pose: bool, estimate_depth: bool) -> DatasetMetadata:
        return DatasetMetadata(
            num_frames=self.num_frames,
            fps=float(self.info.get("fps", 30.0)),
            width=int(self.info["width"]), height=int(self.info["height"]),
            estimate_pose=estimate_pose, estimate_depth=estimate_depth,
            depth_mask_dilation_iterations=BackgroundMeshOptions().depth_mask_dilation_iterations,
            depth_scale=self.depth_scale_factor, frame_step=self.frame_step,
            colmap_options=self.colmap_options)

    def get_camera_matrix(self) -> np.ndarray:
        return self.camera_matrix

    def get_pose(self, index: int) -> np.ndarray:
        return self.camera_trajectory[index]

    def get_frame(self, index: int) -> np.ndarray:
        return iio.imread(pjoin(str(self.base_path), self.rgb_folder,
                                HiveDataset.index_to_filename(index)))

    def get_depth_map(self, index: int) -> np.ndarray:
        depth = iio.imread(pjoin(str(self.base_path), self.depth_folder,
                                 HiveDataset.index_to_filename(index)))
        return depth.astype(np.uint16)  # already millimetres


class VideoAdaptorBase(DatasetAdaptor, ABC):
    """Shared machinery for video-file-backed datasets (ref :854-1020)."""

    def __init__(self, base_path: File, output_path: File, video_path: Union[str, Path],
                 num_frames: int = -1, frame_step: int = 1,
                 colmap_options: COLMAPOptions = COLMAPOptions(),
                 resize_to: Optional[Union[int, Size]] = None):
        super().__init__(base_path=base_path, output_path=output_path, num_frames=num_frames,
                         frame_step=frame_step, colmap_options=colmap_options)

        self.video_path = str(video_path)

        self._resolve_num_frames(num_frames)

        capture = cv2.VideoCapture(self.video_path)
        try:
            self.source_width = int(capture.get(cv2.CAP_PROP_FRAME_WIDTH))
            self.source_height = int(capture.get(cv2.CAP_PROP_FRAME_HEIGHT))
            self.fps = float(capture.get(cv2.CAP_PROP_FPS)) or 30.0
        finally:
            capture.release()

        if resize_to is not None:
            self.target_height, self.target_width = calculate_target_resolution(
                (self.source_height, self.source_width),
                resize_to if isinstance(resize_to, int) else tuple(resize_to))
        else:
            self.target_height, self.target_width = self.source_height, self.source_width

        if (self.target_height, self.target_width) != (self.source_height, self.source_width):
            logging.info(f"Frames will be resized {self.source_width}x{self.source_height} -> "
                         f"{self.target_width}x{self.target_height} (w x h).")

    def _count_frames(self) -> int:
        """Exact frame count by decoding (metadata counts can lie, ref :907-928).

        Memoised on the instance — lru_cache on a method keys on ``self`` in
        a module-global cache, pinning every adaptor (and its arrays) for the
        process lifetime.
        """
        if getattr(self, "_cached_frame_count", None) is not None:
            return self._cached_frame_count

        logging.debug(f"Determining the exact frame count of {self.video_path}...")
        count = 0

        capture = cv2.VideoCapture(self.video_path)
        try:
            while capture.isOpened() and capture.grab():
                count += 1
        finally:
            capture.release()

        self._cached_frame_count = count
        return count

    def get_full_num_frames(self) -> int:
        return self._count_frames()

    def get_metadata(self, estimate_pose: bool, estimate_depth: bool) -> DatasetMetadata:
        return DatasetMetadata(
            num_frames=self.num_frames, fps=self.fps,
            width=self.target_width, height=self.target_height,
            frame_step=self.frame_step, estimate_pose=estimate_pose,
            estimate_depth=estimate_depth,
            depth_mask_dilation_iterations=BackgroundMeshOptions().depth_mask_dilation_iterations,
            depth_scale=HiveDataset.depth_scaling_factor, colmap_options=self.colmap_options)

    def get_frame(self, index: int) -> np.ndarray:
        capture = cv2.VideoCapture(self.video_path)
        try:
            capture.set(cv2.CAP_PROP_POS_FRAMES, index)
            ok, frame = capture.read()
        finally:
            capture.release()

        if not ok:
            raise RuntimeError(f"Failed to decode frame index {index} (0-based) of "
                               f"{self.video_path}.")

        frame = cv2.resize(frame, (self.target_width, self.target_height))
        return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

    def copy_frames(self, output_path: str, num_frames: int = -1, file_extension: str = "png"):
        num_frames = self.num_frames if num_frames == -1 else num_frames
        self.extract_video(self.video_path, output_path, num_frames,
                           target_resolution=(self.target_height, self.target_width),
                           file_extension=file_extension)

    @staticmethod
    def extract_video(path_to_video: str, output_path: str, num_frames: int = -1,
                      target_resolution: Optional[Tuple[int, int]] = None,
                      rotation: Optional[int] = None, file_extension: str = "png"):
        """Decode a video to numbered frames: sequential cv2 decode (the only
        fast way to read video), resize+encode fanned out to worker threads
        (the reference shelled out to ffmpeg, ref :978-1020)."""
        from concurrent.futures import ThreadPoolExecutor

        capture = cv2.VideoCapture(path_to_video)
        futures = []

        def process(index, frame):
            if rotation is not None:
                frame = cv2.rotate(frame, rotation)

            if target_resolution is not None:
                height, width = target_resolution
                frame = cv2.resize(frame, (width, height))

            cv2.imwrite(pjoin(output_path, f"{index:06d}.{file_extension}"), frame)

        workers = os.cpu_count() or 1
        # Backpressure: decode outruns PNG encode+write several-fold, and
        # every queued frame pins ~6 MB of decoded pixels — an unbounded
        # submit loop grows RSS by GBs on long videos (review finding, r5).
        # Draining the oldest future once 4x workers are in flight bounds
        # memory at O(workers) frames while keeping every worker busy.
        max_in_flight = 4 * workers
        try:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                index = 0
                while capture.isOpened():
                    if num_frames != -1 and index >= num_frames:
                        break

                    ok, frame = capture.read()
                    if not ok:
                        break

                    futures.append(pool.submit(process, index, frame))
                    if len(futures) >= max_in_flight:
                        futures.pop(0).result()
                    index += 1

                for future in futures:
                    future.result()
        finally:
            capture.release()

        if num_frames != -1 and index < num_frames:
            raise RuntimeError(f"Video {path_to_video} only yielded {index} frames "
                               f"({num_frames} requested).")


class VideoAdaptor(VideoAdaptorBase):
    """Ingests a plain RGB video (.mp4); depth and pose must be estimated
    (ref :1023-1090)."""

    _no_ground_truth_error_message = (
        "Plain video inputs carry no ground-truth poses or depth; pass "
        "'--estimate_pose' and '--estimate_depth' so both are estimated.")

    def __init__(self, base_path: File, output_path: File, num_frames: int = -1,
                 frame_step: int = 1, colmap_options: COLMAPOptions = COLMAPOptions(),
                 resize_to: Optional[Union[int, Size]] = None):
        path = Path(base_path)

        if os.path.isfile(path):
            video_path = str(path)
            base_path = str(path.parent)
        else:
            # Sorted: os.listdir order is arbitrary and the chosen video must
            # be deterministic across machines/runs.
            mp4s = sorted(f for f in os.listdir(path) if f.endswith(".mp4"))
            if not mp4s:
                raise InvalidDatasetFormatError(
                    f"No .mp4 file found in {path}.")
            video_path = pjoin(str(path), mp4s[0])

        super().__init__(base_path=base_path, output_path=output_path, video_path=video_path,
                         num_frames=num_frames, frame_step=frame_step,
                         colmap_options=colmap_options, resize_to=resize_to)

    @classmethod
    def _validate_dataset(cls, base_path):
        if os.path.isfile(base_path) and Path(base_path).suffix == ".mp4":
            return

        if os.path.isdir(base_path):
            files = [f for f in os.listdir(base_path)
                     if os.path.isfile(pjoin(str(base_path), f))]

            if not files:
                raise InvalidDatasetFormatError(f"Nothing to load: {base_path} has no files.")

            if not any(Path(f).suffix == ".mp4" for f in files):
                raise InvalidDatasetFormatError(
                    f"The folder {base_path} contains no .mp4 video.")
        else:
            raise InvalidDatasetFormatError(f"Dataset folder {base_path} is missing.")

    def get_camera_matrix(self) -> np.ndarray:
        raise NotImplementedError(self._no_ground_truth_error_message)

    def get_pose(self, index: int) -> np.ndarray:
        raise NotImplementedError(self._no_ground_truth_error_message)

    def get_camera_trajectory(self) -> Trajectory:
        raise NotImplementedError(self._no_ground_truth_error_message)

    def get_depth_map(self, index: int) -> np.ndarray:
        raise NotImplementedError(self._no_ground_truth_error_message)


class DeviceOrientation(enum.Enum):
    """Capture-device orientation inferred from the first pose's roll
    (ref :1094-1155)."""

    Landscape = enum.auto()         # no rotation needed
    Portrait = enum.auto()          # rotate 90° CW
    LandscapeReverse = enum.auto()  # rotate 180°
    PortraitReverse = enum.auto()   # rotate 90° CCW

    @classmethod
    def from_angle(cls, angle: float, degrees: bool = False) -> "DeviceOrientation":
        if not degrees:
            angle = np.rad2deg(angle)

        if abs(angle) <= 45:
            return cls.Landscape
        if -135 <= angle < -45:
            return cls.Portrait
        if 45 < angle <= 135:
            return cls.PortraitReverse
        if 135 < abs(angle) <= 180:
            return cls.LandscapeReverse

        raise ValueError(f"Roll angle {angle} lies outside [-180, 180]"
                         + ("." if degrees else " (after radians-to-degrees conversion)."))

    @classmethod
    def to_opencv_rotation(cls, orientation: "DeviceOrientation") -> Optional[int]:
        return {
            cls.Portrait: cv2.ROTATE_90_CLOCKWISE,
            cls.LandscapeReverse: cv2.ROTATE_180,
            cls.PortraitReverse: cv2.ROTATE_90_COUNTERCLOCKWISE,
        }.get(orientation)


class StrayScannerAdaptor(VideoAdaptorBase):
    """Ingests 'Stray Scanner' captures from iOS LiDAR devices
    (ref hive/dataset_adaptors.py:1158-1335)."""

    video_filename = "rgb.mp4"
    camera_matrix_filename = "camera_matrix.csv"
    camera_trajectory_filename = "odometry.csv"
    required_files = [video_filename, camera_matrix_filename, camera_trajectory_filename]

    depth_folder = "depth"
    confidence_map_folder = "confidence"
    required_folders = [depth_folder, confidence_map_folder]

    depth_confidence_levels = (0, 1, 2)
    valid_depth_map_types = {np.dtype("uint16"), np.dtype("uint32"), np.dtype("uint64"),
                             np.dtype("int32"), np.dtype("int64")}

    def __init__(self, base_path: File, output_path: File, num_frames: int = -1,
                 frame_step: int = 1, colmap_options: COLMAPOptions = COLMAPOptions(),
                 resize_to: Optional[Union[int, Size]] = None,
                 depth_confidence_filter_level: int = 0, fix_orientation: bool = True):
        video_path = pjoin(str(base_path), StrayScannerAdaptor.video_filename)

        super().__init__(base_path=base_path, output_path=output_path, video_path=video_path,
                         num_frames=num_frames, frame_step=frame_step,
                         colmap_options=colmap_options, resize_to=resize_to)

        if depth_confidence_filter_level not in self.depth_confidence_levels:
            raise ValueError(f"Confidence filter must be one of: "
                             f"{self.depth_confidence_levels}.")

        self.depth_confidence_filter_level = depth_confidence_filter_level
        self.fix_orientation = fix_orientation

        (self.device_orientation,
         self.camera_trajectory) = self._get_device_orientation_and_trajectory()

        if self.device_orientation in (DeviceOrientation.Portrait,
                                       DeviceOrientation.PortraitReverse):
            # A 90° frame rotation swaps width and height.
            self.target_height, self.target_width = self.target_width, self.target_height

    def _get_device_orientation_and_trajectory(self) -> Tuple[DeviceOrientation, Trajectory]:
        trajectory = self._load_camera_trajectory()

        if self.fix_orientation:
            from scipy.spatial.transform import Rotation

            # Orientation must be read off the raw first pose (normalisation
            # resets rotations, ref :1223-1226).
            roll = Rotation.from_quat(trajectory.rotations[0]).as_euler("xyz")[-1]
            orientation = DeviceOrientation.from_angle(roll)
        else:
            orientation = DeviceOrientation.Landscape

        if orientation != DeviceOrientation.Landscape:
            angle = {DeviceOrientation.LandscapeReverse: 180,
                     DeviceOrientation.Portrait: -90,
                     DeviceOrientation.PortraitReverse: 90}[orientation]

            from scipy.spatial.transform import Rotation

            rotation = np.eye(4)
            rotation[:3, :3] = Rotation.from_euler("z", angle, degrees=True).as_matrix()
            trajectory = trajectory.apply(rotation)

        trajectory = trajectory.normalise_position().inverse()

        # Scenes from this adaptor end up upside down without this final 180°
        # about x (ref :1249-1253).
        flip = np.eye(4)
        flip[1, 1] = -1.0
        flip[2, 2] = -1.0
        trajectory = trajectory.apply(flip)

        return orientation, trajectory

    def _load_camera_trajectory(self) -> Trajectory:
        # odometry.csv rows: timestamp, frame, tx, ty, tz, qx, qy, qz, qw.
        raw = np.loadtxt(pjoin(str(self.base_path), self.camera_trajectory_filename),
                         delimiter=",", skiprows=1)

        poses = np.zeros((len(raw), 7))
        poses[:, :4] = raw[:, 5:9]  # qx qy qz qw
        poses[:, 4:] = raw[:, 2:5]  # tx ty tz

        return Trajectory(poses)

    def get_camera_matrix(self) -> np.ndarray:
        raw = np.loadtxt(pjoin(str(self.base_path), self.camera_matrix_filename),
                         delimiter=",")

        camera = CameraMatrix(fx=raw[0, 0], fy=raw[1, 1], cx=raw[0, 2], cy=raw[1, 2],
                              width=self.source_width, height=self.source_height)

        return camera.scale((self.target_height, self.target_width)).matrix

    def get_pose(self, index: int) -> np.ndarray:
        return self.camera_trajectory[index]

    def copy_frames(self, output_path: str, num_frames: int = -1, file_extension: str = "png"):
        num_frames = self.num_frames if num_frames == -1 else num_frames
        self.extract_video(self.video_path, output_path, num_frames,
                           target_resolution=(self.target_height, self.target_width),
                           rotation=DeviceOrientation.to_opencv_rotation(self.device_orientation),
                           file_extension=file_extension)

    def get_depth_map(self, index: int) -> np.ndarray:
        filename = HiveDataset.index_to_filename(index)
        depth_map = iio.imread(pjoin(str(self.base_path), self.depth_folder, filename))

        if depth_map.dtype not in self.valid_depth_map_types:
            raise RuntimeError(f"Depth maps must be one of {self.valid_depth_map_types}; "
                               f"this one is {depth_map.dtype}.")

        confidence = iio.imread(pjoin(str(self.base_path), self.confidence_map_folder,
                                      filename))
        depth_map = depth_map.copy()
        depth_map[confidence < self.depth_confidence_filter_level] = 0

        # Rotate before resizing so orientation fixes land correctly.
        if (rotation := DeviceOrientation.to_opencv_rotation(self.device_orientation)) \
                is not None:
            depth_map = cv2.rotate(depth_map, rotation)

        original_type = depth_map.dtype
        as_float = depth_map.astype(np.float32)
        resized = cv2.resize(as_float, (self.target_width, self.target_height),
                             interpolation=cv2.INTER_LINEAR)

        return np.round(resized).astype(original_type)


def estimate_depth_dpt(rgb_dataset: ImageFolderDataset, output_path: str,
                       weights_filename: str = "dpt_hybrid_nyu.npz",
                       batch_size: int = 8):
    """Estimate metric depth for every frame with the Flax DPT-Hybrid model.

    TPU-native replacement for the reference's per-frame fp16 torch loop
    (ref :1346-1435): frames are resized/normalised and batched, the whole
    batch runs in one jit call, and outputs are written as uint16 millimetre
    PNGs — the same on-disk contract.
    """
    from hive_tpu.models.dpt import DPTDepthEstimator
    from hive_tpu.ops.resize import keep_aspect_multiple_of

    os.makedirs(output_path, exist_ok=True)

    # Per-dataset net canvas from the source aspect (the reference's
    # aspect-preserving 'minimal' resize policy): stretching a portrait
    # sequence onto the fixed landscape 480x640 canvas squashed the aspect
    # from e.g. 0.75 to 1.33 before the forward pass, silently distorting
    # every depth map (review finding, r5). One shape per dataset keeps the
    # single-compile property.
    net_size = keep_aspect_multiple_of(rgb_dataset[0].shape[:2],
                                       target_hw=(480, 640))
    estimator = DPTDepthEstimator(weights_filename=weights_filename,
                                  net_size=net_size)

    index = 0
    for batch in rgb_dataset.batches(batch_size):
        depth_batch = estimator.predict_batch(batch)  # (B, H, W) meters

        for depth in depth_batch:
            as_mm = (depth * 1000.0).astype(np.uint16)
            iio.imwrite(pjoin(output_path, f"{index:06d}.png"), as_mm)
            index += 1


def get_dataset(storage_options: StorageOptions,
                colmap_options: COLMAPOptions = COLMAPOptions(),
                pipeline_options: PipelineOptions = PipelineOptions(),
                resize_to: Optional[Union[int, Size]] = 640,
                depth_confidence_filter_level: int = 0,
                profiling: Optional[dict] = None) -> HiveDataset:
    """Load a HIVE dataset, converting from a recognised input format if needed.

    Format sniffing order matches the reference (ref :1438-1498): HIVE cache →
    TUM → Unreal → StrayScanner → plain video.
    """
    dataset_path = storage_options.dataset_path
    output_path = storage_options.output_path

    if not storage_options.no_cache and HiveDataset.is_valid_folder_structure(output_path):
        return HiveDataset(output_path)

    base_kwargs = dict(base_path=dataset_path, output_path=output_path,
                       num_frames=pipeline_options.num_frames,
                       frame_step=pipeline_options.frame_step,
                       colmap_options=colmap_options)

    if TUMAdaptor.is_valid_folder_structure(dataset_path):
        adaptor = TUMAdaptor(**base_kwargs)
    elif UnrealAdaptor.is_valid_folder_structure(dataset_path):
        adaptor = UnrealAdaptor(**base_kwargs)
    elif StrayScannerAdaptor.is_valid_folder_structure(dataset_path):
        adaptor = StrayScannerAdaptor(
            **base_kwargs, resize_to=resize_to,
            depth_confidence_filter_level=depth_confidence_filter_level,
            fix_orientation=not pipeline_options.estimate_pose)
    elif VideoAdaptor.is_valid_folder_structure(dataset_path):
        adaptor = VideoAdaptor(resize_to=resize_to, **base_kwargs)
    elif not os.path.isdir(dataset_path):
        raise RuntimeError(f"{dataset_path} is unreadable or not a directory.")
    else:
        raise RuntimeError(f"The folder {dataset_path} matches no known dataset layout "
                           f"(TUM, Unreal, StrayScanner, video, or HIVE).")

    return adaptor.convert(estimate_pose=pipeline_options.estimate_pose,
                           estimate_depth=pipeline_options.estimate_depth,
                           inpainting_mode=pipeline_options.inpainting_mode,
                           static_camera=pipeline_options.static_camera,
                           no_cache=storage_options.no_cache, profiling=profiling)
