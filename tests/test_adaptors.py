"""Dataset adaptor tests over synthetic TUM / Unreal / video inputs."""

import json
import os
from os.path import join as pjoin

import numpy as np
import pytest
from PIL import Image

from hive_tpu.dataset_adaptors import (DatasetAdaptor, DeviceOrientation, TUMAdaptor,
                                       UnrealAdaptor, VideoAdaptor, get_dataset)
from hive_tpu.io import HiveDataset
from hive_tpu.options import InpaintingMode, PipelineOptions, StorageOptions


def make_tum_dataset(base_path, num_frames=4, width=64, height=48):
    """Write a minimal synthetic TUM-format dataset."""
    base_path = str(base_path)
    os.makedirs(pjoin(base_path, "rgb"), exist_ok=True)
    os.makedirs(pjoin(base_path, "depth"), exist_ok=True)

    rgb_lines = ["# colour images"]
    depth_lines = ["# depth maps"]
    pose_lines = ["# ground truth"]

    rng = np.random.default_rng(0)

    for i in range(num_frames):
        t = 1000.0 + i * 0.033

        rgb_name = f"{t:.6f}.png"
        Image.fromarray(rng.integers(0, 255, (height, width, 3), dtype=np.uint8)) \
            .save(pjoin(base_path, "rgb", rgb_name))
        rgb_lines.append(f"{t:.6f} rgb/{rgb_name}")

        depth_t = t + 0.005
        depth_name = f"{depth_t:.6f}.png"
        depth = np.full((height, width), 5000, dtype=np.uint16)  # 1m at 1/5000 scale
        Image.fromarray(depth).save(pjoin(base_path, "depth", depth_name))
        depth_lines.append(f"{depth_t:.6f} depth/{depth_name}")

        # TUM pose rows: timestamp tx ty tz qx qy qz qw.
        pose_lines.append(f"{t:.6f} {0.01 * i} 0 0 0 0 0 1")

    for filename, lines in (("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                            ("groundtruth.txt", pose_lines)):
        with open(pjoin(base_path, filename), "w") as fh:
            fh.write("\n".join(lines) + "\n")

    return base_path


def make_video_dataset(base_path, num_frames=6, width=64, height=48, fps=10):
    """Write a small mp4 with cv2."""
    import cv2

    base_path = str(base_path)
    os.makedirs(base_path, exist_ok=True)
    video_path = pjoin(base_path, "video.mp4")

    writer = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (width, height))
    rng = np.random.default_rng(1)

    for i in range(num_frames):
        frame = np.full((height, width, 3), i * 30 % 255, dtype=np.uint8)
        frame[:, :16] = rng.integers(0, 255, (height, 16, 3), dtype=np.uint8)
        writer.write(frame)

    writer.release()
    return video_path


class TestTUMAdaptor:
    def test_validation(self, tmp_path):
        path = make_tum_dataset(tmp_path / "tum")
        assert TUMAdaptor.is_valid_folder_structure(path)
        assert not TUMAdaptor.is_valid_folder_structure(str(tmp_path))

    def test_synced_frames_and_trajectory(self, tmp_path):
        path = make_tum_dataset(tmp_path / "tum", num_frames=5)
        adaptor = TUMAdaptor(base_path=path, output_path=str(tmp_path / "out"))

        assert adaptor.get_full_num_frames() == 5
        assert adaptor.num_frames == 5

        trajectory = adaptor.get_camera_trajectory()
        assert trajectory.shape == (5, 7)
        # Trajectory is normalised: first position at origin.
        np.testing.assert_allclose(trajectory[0][4:], 0.0, atol=1e-6)

    def test_depth_units_milimetres(self, tmp_path):
        path = make_tum_dataset(tmp_path / "tum")
        adaptor = TUMAdaptor(base_path=path, output_path=str(tmp_path / "out"))
        depth = adaptor.get_depth_map(0)

        assert depth.dtype == np.uint16
        assert depth.max() == 1000  # 1 m in mm

    def test_convert_produces_hive_dataset(self, tmp_path):
        path = make_tum_dataset(tmp_path / "tum", num_frames=3)
        adaptor = TUMAdaptor(base_path=path, output_path=str(tmp_path / "converted"))

        dataset = adaptor.convert(estimate_pose=False, estimate_depth=False,
                                  inpainting_mode=InpaintingMode.Off)

        assert isinstance(dataset, HiveDataset)
        assert dataset.num_frames == 3
        assert len(dataset.rgb_dataset) == 3
        assert len(dataset.depth_dataset) == 3
        assert len(dataset.mask_dataset) == 3
        assert dataset.camera_matrix.shape == (3, 3)

    def test_convert_uses_cache(self, tmp_path):
        path = make_tum_dataset(tmp_path / "tum", num_frames=3)
        output = str(tmp_path / "converted")

        adaptor = TUMAdaptor(base_path=path, output_path=output)
        adaptor.convert(estimate_pose=False, estimate_depth=False,
                        inpainting_mode=InpaintingMode.Off)

        # Second conversion must hit the cache (same metadata).
        marker = pjoin(output, "rgb", "000000.jpg")
        mtime = os.path.getmtime(marker)

        adaptor2 = TUMAdaptor(base_path=path, output_path=output)
        adaptor2.convert(estimate_pose=False, estimate_depth=False,
                         inpainting_mode=InpaintingMode.Off)

        assert os.path.getmtime(marker) == mtime


class TestUnrealAdaptor:
    def _make(self, tmp_path, num_frames=3, width=64, height=48):
        base = str(tmp_path / "unreal")
        os.makedirs(pjoin(base, "colour"), exist_ok=True)
        os.makedirs(pjoin(base, "depth"), exist_ok=True)

        rng = np.random.default_rng(2)

        for i in range(num_frames):
            Image.fromarray(rng.integers(0, 255, (height, width, 3), dtype=np.uint8)) \
                .save(pjoin(base, "colour", f"{i:06d}.png"))
            Image.fromarray(np.full((height, width), 1500, dtype=np.uint16)) \
                .save(pjoin(base, "depth", f"{i:06d}.png"))

        with open(pjoin(base, "info.json"), "w") as fh:
            json.dump({"num_frames": num_frames, "fps": 30.0,
                       "width": width, "height": height}, fh)

        K = np.array([[50.0, 0, 31.5], [0, 50.0, 23.5], [0, 0, 1]])
        np.savetxt(pjoin(base, "camera.txt"), K)

        poses = np.zeros((num_frames, 7))
        poses[:, 3] = 1.0
        np.savetxt(pjoin(base, "trajectory.txt"), poses)

        return base

    def test_loads(self, tmp_path):
        base = self._make(tmp_path)
        adaptor = UnrealAdaptor(base_path=base, output_path=str(tmp_path / "out"))

        assert adaptor.get_full_num_frames() == 3
        assert adaptor.get_camera_matrix().shape == (3, 3)
        assert adaptor.get_depth_map(0).max() == 1500


class TestVideoAdaptor:
    def test_frame_extraction(self, tmp_path):
        video_path = make_video_dataset(tmp_path / "video")
        adaptor = VideoAdaptor(base_path=video_path, output_path=str(tmp_path / "out"))

        assert adaptor.get_full_num_frames() == 6

        out = str(tmp_path / "frames")
        os.makedirs(out)
        adaptor.copy_frames(out, num_frames=4)
        assert sorted(os.listdir(out)) == [f"{i:06d}.png" for i in range(4)]

    def test_resize(self, tmp_path):
        video_path = make_video_dataset(tmp_path / "video")
        adaptor = VideoAdaptor(base_path=video_path, output_path=str(tmp_path / "out"),
                               resize_to=32)

        frame = adaptor.get_frame(0)
        assert max(frame.shape[:2]) == 32

    def test_ground_truth_raises(self, tmp_path):
        video_path = make_video_dataset(tmp_path / "video")
        adaptor = VideoAdaptor(base_path=video_path, output_path=str(tmp_path / "out"))

        with pytest.raises(NotImplementedError):
            adaptor.get_depth_map(0)
        with pytest.raises(NotImplementedError):
            adaptor.get_camera_matrix()


class TestDeviceOrientation:
    def test_from_angle(self):
        assert DeviceOrientation.from_angle(0, degrees=True) == DeviceOrientation.Landscape
        assert DeviceOrientation.from_angle(-90, degrees=True) == DeviceOrientation.Portrait
        assert DeviceOrientation.from_angle(90, degrees=True) \
            == DeviceOrientation.PortraitReverse
        assert DeviceOrientation.from_angle(180, degrees=True) \
            == DeviceOrientation.LandscapeReverse

    def test_invalid_angle_raises(self):
        with pytest.raises(ValueError):
            DeviceOrientation.from_angle(400, degrees=True)


class TestGetDataset:
    def test_tum_sniffing(self, tmp_path):
        path = make_tum_dataset(tmp_path / "tum", num_frames=2)

        storage = StorageOptions(dataset_path=path, output_path=str(tmp_path / "out"))
        options = PipelineOptions(num_frames=2)

        dataset = get_dataset(storage, pipeline_options=options)
        assert isinstance(dataset, HiveDataset)
        assert dataset.num_frames == 2

    def test_existing_hive_dataset_reused(self, tmp_path):
        from tests.helpers import make_synthetic_hive_dataset

        path = make_synthetic_hive_dataset(tmp_path / "hive", num_frames=2)
        storage = StorageOptions(dataset_path="unused", output_path=path)

        dataset = get_dataset(storage)
        assert dataset.num_frames == 2

    def test_frame_subset_includes_last(self):
        frames, subset = DatasetAdaptor._get_frame_subset(10, 4)
        assert subset == [0, 4, 8, 9]

        frames, subset = DatasetAdaptor._get_frame_subset(9, 4)
        assert subset == [0, 4, 8]


class TestEstimatePoseEndToEnd:
    def test_convert_with_native_pnp_odometry(self, tmp_path):
        """convert(estimate_pose=True) without a COLMAP binary must fall back
        to the native PnP odometry (hive_tpu.sfm) and produce a coherent
        metric trajectory (ref _estimate_camera_parameters :339-398 hard-fails
        without COLMAP; here it degrades). Frames are the TUM-native 640x480
        (the adaptor pins the Kinect intrinsics for that geometry, like the
        reference)."""
        import cv2

        width, height, num_frames = 640, 480, 4
        shift = 12  # px/frame of simulated camera translation at 1 m depth

        base_path = str(tmp_path / "tum")
        os.makedirs(pjoin(base_path, "rgb"), exist_ok=True)
        os.makedirs(pjoin(base_path, "depth"), exist_ok=True)

        rng = np.random.default_rng(7)
        # A wide textured wall; each frame crops a window sliding right —
        # exactly the image motion of a camera translating left along x at
        # constant 1 m depth. Smoothed so SIFT finds stable blobs.
        wall = rng.integers(0, 255,
                            (height, width + shift * num_frames, 3),
                            dtype=np.uint8)
        wall = cv2.GaussianBlur(wall, (0, 0), 1.5)

        rgb_lines, depth_lines, pose_lines = (["# rgb"], ["# depth"], ["# gt"])
        for i in range(num_frames):
            t = 1000.0 + i * 0.033
            Image.fromarray(wall[:, i * shift:i * shift + width]) \
                .save(pjoin(base_path, "rgb", f"{t:.6f}.png"))
            rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")

            depth_t = t + 0.004
            depth = np.full((height, width), 5000, np.uint16)  # 1 m
            Image.fromarray(depth).save(
                pjoin(base_path, "depth", f"{depth_t:.6f}.png"))
            depth_lines.append(f"{depth_t:.6f} depth/{depth_t:.6f}.png")
            pose_lines.append(f"{t:.6f} 0 0 0 0 0 0 1")

        for filename, lines in (("rgb.txt", rgb_lines),
                                ("depth.txt", depth_lines),
                                ("groundtruth.txt", pose_lines)):
            with open(pjoin(base_path, filename), "w") as fh:
                fh.write("\n".join(lines) + "\n")

        output = str(tmp_path / "converted")
        adaptor = TUMAdaptor(base_path=base_path, output_path=output)

        dataset = adaptor.convert(estimate_pose=True, estimate_depth=False,
                                  inpainting_mode=InpaintingMode.Off,
                                  static_camera=False, no_cache=True)

        transforms = dataset.camera_trajectory.to_homogenous_transforms()
        assert transforms.shape == (num_frames, 4, 4)
        assert np.all(np.isfinite(transforms))

        # Normalised trajectory: first pose is identity.
        np.testing.assert_allclose(transforms[0], np.eye(4), atol=1e-5)

        # The camera translates dominantly along x, roughly shift*Z/fx per
        # frame (TUM Kinect fx=580), with a consistent direction.
        step = np.diff(transforms[:, :3, 3], axis=0)
        assert np.all(np.abs(step[:, 0]) > 1e-3)
        assert np.abs(step[:, 0]).mean() > 2 * np.abs(step[:, 1:]).mean()
        assert len(set(np.sign(step[:, 0]))) == 1  # no direction flips
        expected = shift * 1.0 / 580.0
        assert 0.5 * expected < np.abs(step[:, 0]).mean() < 2 * expected
