"""Dataset format / IO tests over a synthetic HIVE dataset."""

import numpy as np
import pytest

from hive_tpu.data import colmap_model
from hive_tpu.geometric import Trajectory
from hive_tpu.io import (DatasetMetadata, HiveDataset, ImageFolderDataset,
                         InvalidDatasetFormatError, VideoMetadata, load_raw_float32_image,
                         save_raw_float32_image, temporary_trajectory)
from hive_tpu.options import COLMAPOptions, MaskDilationOptions
from tests.helpers import make_synthetic_hive_dataset


@pytest.fixture
def dataset_path(tmp_path):
    return make_synthetic_hive_dataset(tmp_path / "synthetic")


class TestRawFloatCodec:
    def test_roundtrip_single_channel(self, tmp_path, rng):
        image = rng.normal(size=(24, 32)).astype(np.float32)
        path = str(tmp_path / "image.raw")
        save_raw_float32_image(path, image)
        np.testing.assert_array_equal(load_raw_float32_image(path), image)

    def test_roundtrip_multichannel(self, tmp_path, rng):
        image = rng.normal(size=(16, 20, 3)).astype(np.float32)
        path = str(tmp_path / "image3.raw")
        save_raw_float32_image(path, image)
        np.testing.assert_array_equal(load_raw_float32_image(path), image)

    @staticmethod
    def _reference_writer_bytes(image: np.ndarray) -> bytes:
        """Byte-level emulation of the reference writer (ref hive/io.py:88-132):
        header (h, w, cv_type, pixel_size) + F-order iteration over the
        transposed image — which emits the ORIGINAL image's C-order bytes."""
        import struct

        if image.ndim == 2:
            h, w = image.shape
            d = 1
            payload = np.transpose(image).astype(np.float32)
        else:
            h, w, d = image.shape
            payload = np.transpose(image, [2, 1, 0]).astype(np.float32)

        out = struct.pack("iii", h, w, 5 + ((d - 1) << 3)) + struct.pack("Q", d * 4)
        chunks = [chunk.tobytes("C") for chunk in
                  np.nditer(payload, flags=["external_loop", "buffered",
                                            "zerosize_ok"], order="F")]
        return out + b"".join(chunks)

    def test_bit_compatible_with_reference_writer(self, tmp_path, rng):
        """Files written by the reference toolchain must load unscrambled,
        and files written here must be byte-identical to the reference's."""
        for shape in ((6, 9), (5, 7, 3)):
            image = rng.normal(size=shape).astype(np.float32)

            ref_path = str(tmp_path / f"ref_{len(shape)}.raw")
            with open(ref_path, "wb") as fh:
                fh.write(self._reference_writer_bytes(image))
            np.testing.assert_array_equal(load_raw_float32_image(ref_path), image)

            our_path = str(tmp_path / f"ours_{len(shape)}.raw")
            save_raw_float32_image(our_path, image)
            with open(our_path, "rb") as fh:
                assert fh.read() == self._reference_writer_bytes(image)


class TestHiveDataset:
    def test_loads_and_validates(self, dataset_path):
        dataset = HiveDataset(dataset_path)
        assert dataset.num_frames == 4
        assert dataset.frame_width == 128
        assert dataset.frame_height == 96
        assert len(dataset) == 4
        assert dataset.fx == pytest.approx(100.0)
        assert 0 < dataset.fov_y < 180

    def test_depth_scaled_to_meters(self, dataset_path):
        dataset = HiveDataset(dataset_path)
        depth = dataset.depth_dataset[0]
        assert depth.dtype == np.float32
        assert depth.max() == pytest.approx(2.0)

    def test_mask_ids(self, dataset_path):
        dataset = HiveDataset(dataset_path)
        mask = dataset.mask_dataset[0]
        assert set(np.unique(mask)) == {0, 1}

    def test_missing_folder_raises(self, tmp_path):
        with pytest.raises(InvalidDatasetFormatError):
            HiveDataset(str(tmp_path / "nope"))

    def test_is_valid_folder_structure(self, dataset_path, tmp_path):
        assert HiveDataset.is_valid_folder_structure(dataset_path)
        assert not HiveDataset.is_valid_folder_structure(str(tmp_path))

    def test_create_masked_depth(self, dataset_path):
        dataset = HiveDataset(dataset_path)
        dataset.create_masked_depth(MaskDilationOptions(num_iterations=2))

        masked = ImageFolderDataset(dataset.masked_depth_path)
        assert len(masked) == 4
        # The dynamic object region must be zeroed out.
        depth0 = masked[0]
        mask0 = dataset.mask_dataset[0]
        assert (depth0[mask0 > 0] == 0).all()

    def test_masked_depth_cache(self, dataset_path):
        dataset = HiveDataset(dataset_path)
        dataset.create_masked_depth(MaskDilationOptions(num_iterations=2))
        # Second call must hit the cache (metadata records the iterations).
        dataset2 = HiveDataset(dataset_path)
        dataset2.create_masked_depth(MaskDilationOptions(num_iterations=2))
        assert dataset2.metadata.depth_mask_dilation_iterations == 2

    def test_select_key_frames_thresholds(self, dataset_path):
        dataset = HiveDataset(dataset_path)
        assert dataset.select_key_frames(threshold=0.0) == [0]
        assert dataset.select_key_frames(threshold=1.0) == [0, 1, 2, 3]

        keys = dataset.select_key_frames(threshold=0.3, frame_step=1)
        assert keys[0] == 0

    def test_temporary_trajectory(self, dataset_path):
        dataset = HiveDataset(dataset_path)
        original = dataset.camera_trajectory.values.copy()
        replacement = Trajectory(np.zeros((4, 7)) + [0, 0, 0, 1, 9, 9, 9])

        with temporary_trajectory(dataset, replacement):
            assert (dataset.camera_trajectory.positions == 9).all()

        np.testing.assert_array_equal(dataset.camera_trajectory.values, original)

    def test_index_to_filename(self):
        assert HiveDataset.index_to_filename(42) == "000042.png"


class TestImageFolderDataset:
    def test_batches(self, dataset_path):
        folder = ImageFolderDataset(dataset_path + "/rgb")
        batches = list(folder.batches(batch_size=3))
        assert [len(b) for b in batches] == [3, 1]
        assert batches[0].shape[1:] == (96, 128, 3)

    def test_load_all(self, dataset_path):
        folder = ImageFolderDataset(dataset_path + "/rgb")
        stack = folder.load_all()
        assert stack.shape == (4, 96, 128, 3)


class TestMetadata:
    def test_json_roundtrip(self):
        metadata = DatasetMetadata(num_frames=10, fps=30.0, width=640, height=480,
                                   estimate_pose=True, estimate_depth=False,
                                   depth_mask_dilation_iterations=10,
                                   depth_scale=0.001)
        again = DatasetMetadata.from_json(metadata.to_json())
        assert again == metadata

    def test_save_load(self, tmp_path):
        metadata = DatasetMetadata(num_frames=5, fps=25.0, width=320, height=240,
                                   estimate_pose=False, estimate_depth=True,
                                   depth_mask_dilation_iterations=3, depth_scale=0.001)
        path = str(tmp_path / "metadata.json")
        metadata.save(path)
        assert DatasetMetadata.load(path) == metadata

    def test_validation(self):
        with pytest.raises(ValueError):
            DatasetMetadata(num_frames=-1, fps=30.0, width=640, height=480,
                            estimate_pose=False, estimate_depth=False,
                            depth_mask_dilation_iterations=10, depth_scale=0.001)

        with pytest.raises(ValueError):
            DatasetMetadata(num_frames=10, fps=30.0, width=640, height=480,
                            estimate_pose="yes", estimate_depth=False,
                            depth_mask_dilation_iterations=10, depth_scale=0.001)

    def test_video_metadata(self, tmp_path):
        metadata = VideoMetadata("video.mp4", width=1920, height=1080,
                                 num_frames=300, fps=30.0)
        assert metadata.length_seconds == pytest.approx(10.0)

        path = str(tmp_path / "video.json")
        metadata.save(path)
        loaded = VideoMetadata.load(path)
        assert loaded.num_frames == 300


class TestColmapModelIO:
    def test_model_roundtrip(self, tmp_path):
        cameras = {1: colmap_model.ColmapCamera(
            camera_id=1, model="SIMPLE_RADIAL", width=640, height=480,
            params=np.array([580.0, 320.0, 240.0, 0.01]))}

        images = {}
        rng = np.random.default_rng(3)
        for i in range(1, 4):
            qvec = rng.normal(size=4)
            qvec /= np.linalg.norm(qvec)
            images[i] = colmap_model.ColmapImage(
                image_id=i, qvec=qvec, tvec=rng.normal(size=3), camera_id=1,
                name=f"{i - 1:06d}.png",
                xys=rng.uniform(0, 640, size=(5, 2)),
                point3d_ids=np.array([1, 2, -1, 3, -1], dtype=np.int64))

        points = {j: colmap_model.ColmapPoint3D(
            point3d_id=j, xyz=rng.normal(size=3),
            rgb=np.array([10, 20, 30]), error=0.5) for j in (1, 2, 3)}

        colmap_model.write_model(str(tmp_path), cameras, images, points)
        cams2, imgs2, pts2 = colmap_model.read_model(str(tmp_path))

        assert cams2[1].model == "SIMPLE_RADIAL"
        np.testing.assert_allclose(cams2[1].params, cameras[1].params)
        assert imgs2[2].name == "000001.png"
        np.testing.assert_allclose(imgs2[2].qvec, images[2].qvec)
        np.testing.assert_array_equal(imgs2[2].point3d_ids, images[2].point3d_ids)
        np.testing.assert_allclose(pts2[3].xyz, points[3].xyz)

    def test_rotation_matrix_orthonormal(self):
        qvec = np.array([0.7071, 0.7071, 0.0, 0.0])
        image = colmap_model.ColmapImage(image_id=1, qvec=qvec, tvec=np.zeros(3),
                                         camera_id=1, name="x",
                                         xys=np.zeros((0, 2)),
                                         point3d_ids=np.zeros(0, dtype=np.int64))
        R = image.rotation_matrix()
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


class TestExperimentFixtures:
    def test_temporary_camera_matrix(self, tmp_path):
        from hive_tpu.io import HiveDataset, temporary_camera_matrix
        from tests.helpers import make_synthetic_hive_dataset

        dataset = HiveDataset(make_synthetic_hive_dataset(tmp_path / "ds",
                                                          num_frames=1))
        original = dataset.camera_matrix.copy()
        replacement = original * 2.0

        with temporary_camera_matrix(dataset, replacement):
            assert np.allclose(dataset.camera_matrix, replacement)

        assert np.allclose(dataset.camera_matrix, original)

    def test_disable_inpainted_data(self, tmp_path):
        from hive_tpu.io import HiveDataset, disable_inpainted_data
        from tests.helpers import make_synthetic_hive_dataset

        dataset = HiveDataset(make_synthetic_hive_dataset(tmp_path / "ds",
                                                          num_frames=1))
        # Fake inpainted datasets (the flag logic is what's under test).
        dataset.inpainted_rgb_dataset = dataset.rgb_dataset
        dataset.inpainted_depth_dataset = dataset.depth_dataset
        assert dataset.has_inpainted_frame_data

        with disable_inpainted_data(dataset):
            assert not dataset.has_inpainted_frame_data
            assert dataset.bg_rgb_dataset is dataset.rgb_dataset

        assert dataset.has_inpainted_frame_data
