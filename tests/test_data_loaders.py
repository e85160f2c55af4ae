"""LLFF and HyperNeRF loader tests over synthetic capture folders."""

import json
import os
from os.path import join as pjoin

import numpy as np
import pytest
from PIL import Image

from hive_tpu.data.hypernerf import HyperNeRFDataset
from hive_tpu.data.llff import LLFFDataset, evaluate_renders


def make_llff_capture(base_path, num_images=9, width=64, height=48, focal=50.0):
    base_path = str(base_path)
    os.makedirs(pjoin(base_path, "images"), exist_ok=True)

    rng = np.random.default_rng(0)
    rows = []

    for i in range(num_images):
        Image.fromarray(rng.integers(0, 255, (height, width, 3), dtype=np.uint8)) \
            .save(pjoin(base_path, "images", f"image{i:03d}.png"))

        # LLFF pose: 3x5 [R | t | hwf], axes (down, right, back).
        R_llff = np.array([[0.0, 1.0, 0.0],   # down = world +y
                           [1.0, 0.0, 0.0],   # right = world +x
                           [0.0, 0.0, -1.0]]).T  # back = world -z
        t = np.array([0.1 * i, 0.0, 0.0])

        pose = np.zeros((3, 5))
        pose[:, :3] = R_llff
        pose[:, 3] = t
        pose[:, 4] = [height, width, focal]

        rows.append(np.concatenate([pose.reshape(-1), [1.0, 10.0]]))

    np.save(pjoin(base_path, "poses_bounds.npy"), np.stack(rows))
    return base_path


def make_hypernerf_capture(base_path, num_frames=4, width=64, height=48):
    base_path = str(base_path)
    os.makedirs(pjoin(base_path, "camera"), exist_ok=True)
    os.makedirs(pjoin(base_path, "rgb", "2x"), exist_ok=True)

    ids = [f"{i:06d}" for i in range(num_frames)]

    with open(pjoin(base_path, "dataset.json"), "w") as fh:
        json.dump({"ids": ids, "train_ids": ids[:-1], "val_ids": ids[-1:]}, fh)

    with open(pjoin(base_path, "scene.json"), "w") as fh:
        json.dump({"center": [0, 0, 0], "scale": 1.0, "near": 0.1, "far": 5.0}, fh)

    rng = np.random.default_rng(1)

    for i, item_id in enumerate(ids):
        camera = {
            "orientation": np.eye(3).tolist(),
            "position": [0.1 * i, 0.0, -2.0],
            "focal_length": 100.0,
            "principal_point": [width, height],  # full-res (2x) principal point
            "image_size": [width * 2, height * 2],
            "skew": 0.0,
            "pixel_aspect_ratio": 1.0,
            "radial_distortion": [0.0, 0.0, 0.0],
        }

        with open(pjoin(base_path, "camera", f"{item_id}.json"), "w") as fh:
            json.dump(camera, fh)

        Image.fromarray(rng.integers(0, 255, (height, width, 3), dtype=np.uint8)) \
            .save(pjoin(base_path, "rgb", "2x", f"{item_id}.png"))

    return base_path


class TestLLFF:
    def test_loads_capture(self, tmp_path):
        path = make_llff_capture(tmp_path / "llff")
        llff = LLFFDataset(path)

        assert llff.num_images == 9
        assert llff.camera_matrix.shape == (3, 3)
        assert llff.camera_matrix[0, 0] == pytest.approx(50.0)

        image = llff.get_image(0)
        assert image.shape == (48, 64, 3)

    def test_trajectory_conversion(self, tmp_path):
        path = make_llff_capture(tmp_path / "llff")
        llff = LLFFDataset(path)

        trajectory = llff.get_trajectory()
        assert trajectory.shape == (9, 7)

        # Camera positions step along world +x by 0.1.
        cam_positions = llff.cam_to_world[:, :3, 3]
        steps = np.diff(cam_positions[:, 0])
        np.testing.assert_allclose(steps, 0.1, atol=1e-6)

    def test_train_test_split(self, tmp_path):
        path = make_llff_capture(tmp_path / "llff")
        llff = LLFFDataset(path)

        train, test = llff.train_test_split(holdout_every=8)
        assert test == [0, 8]
        assert 1 in train and 8 not in train

    def test_evaluate_renders_runs(self, tmp_path):
        from hive_tpu.meshing.mesh import TriangleMesh

        path = make_llff_capture(tmp_path / "llff", num_images=2)
        llff = LLFFDataset(path)

        # A quad in front of the cameras.
        mesh = TriangleMesh(
            vertices=np.array([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]],
                              dtype=np.float32),
            faces=np.array([[0, 1, 2], [0, 2, 3]]),
            vertex_colors=np.full((4, 3), 120, dtype=np.uint8))

        results = evaluate_renders(mesh, llff, view_indices=[0],
                                   output_folder=str(tmp_path / "renders"))

        assert "mean" in results
        assert len(results["ssim"]) == 1
        assert os.path.isfile(pjoin(str(tmp_path / "renders"), "render_000.png"))


class TestHyperNeRF:
    def test_loads_capture(self, tmp_path):
        path = make_hypernerf_capture(tmp_path / "hn")
        dataset = HyperNeRFDataset(path, image_scale=2)

        assert dataset.num_frames == 4

        camera = dataset.cameras["000000"]
        # Intrinsics are halved for the 2x pyramid level.
        assert camera.focal_length == pytest.approx(50.0)
        assert camera.image_size == (64, 48)

        image = dataset.get_image("000001")
        assert image.shape == (48, 64, 3)

    def test_world_to_camera(self, tmp_path):
        path = make_hypernerf_capture(tmp_path / "hn")
        dataset = HyperNeRFDataset(path, image_scale=2)

        camera = dataset.cameras["000002"]
        M = camera.world_to_camera

        # The camera at position p maps p to the origin.
        p = np.append(camera.position, 1.0)
        np.testing.assert_allclose((M @ p)[:3], 0.0, atol=1e-9)

    def test_trajectory_and_split(self, tmp_path):
        path = make_hypernerf_capture(tmp_path / "hn")
        dataset = HyperNeRFDataset(path, image_scale=2)

        trajectory = dataset.get_trajectory()
        assert trajectory.shape == (4, 7)

        train, val = dataset.train_val_split()
        assert len(train) == 3 and len(val) == 1
