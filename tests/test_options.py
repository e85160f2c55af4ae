"""CLI contract tests: flag names and defaults must match the reference
(hive/options.py) so existing invocations keep working."""

import argparse

import pytest

from hive_tpu.options import (
    BackgroundMeshOptions,
    COLMAPOptions,
    ForegroundTrajectorySmoothingOptions,
    InpaintingMode,
    MaskDilationOptions,
    MeshDecimationOptions,
    MeshFilteringOptions,
    MeshReconstructionMethod,
    PipelineOptions,
    StorageOptions,
    WebXROptions,
)

ALL_GROUPS = [PipelineOptions, StorageOptions, MaskDilationOptions, MeshFilteringOptions,
              MeshDecimationOptions, COLMAPOptions, BackgroundMeshOptions, WebXROptions]


def build_parser():
    parser = argparse.ArgumentParser()
    for group in ALL_GROUPS:
        group.add_args(parser)
    return parser


def parse(argv):
    return build_parser().parse_args(argv)


REQUIRED = ["--dataset_path", "data/x", "--output_path", "out/x"]


class TestCLIDefaults:
    def test_defaults_match_reference(self):
        args = parse(REQUIRED)

        assert args.num_frames == -1
        assert args.frame_step == 15
        assert args.estimate_pose is False
        assert args.estimate_depth is False
        assert args.inpainting_mode == 0
        assert args.dilate_mask_iter == 0
        assert args.max_depth_dist == 0.1
        assert args.max_pixel_dist == 2
        assert args.min_num_components == 5
        assert args.num_faces_background == 2 ** 14
        assert args.num_faces_object == 2 ** 10
        assert args.decimation_max_error == 0.001
        assert args.quality == "low"
        assert args.mesh_reconstruction_method == "tsdf_fusion"
        assert args.depth_mask_dilation_iterations == 10
        assert args.sdf_volume_size == 5.0
        assert args.sdf_voxel_size == 0.005
        assert args.sdf_max_voxels == 320_000_000
        assert args.key_frame_threshold == 0.3
        assert args.key_frame_step == 30
        assert args.log_file == "logs.log"

    def test_roundtrip_from_args(self):
        args = parse(REQUIRED + ["--num_frames", "100", "--estimate_depth",
                                 "--sdf_voxel_size", "0.01", "--quality", "high"])

        pipeline = PipelineOptions.from_args(args)
        assert pipeline.num_frames == 100
        assert pipeline.estimate_depth is True

        storage = StorageOptions.from_args(args)
        assert storage.dataset_path == "data/x"

        colmap = COLMAPOptions.from_args(args)
        assert colmap.quality == "high"
        assert colmap.is_single_camera is True

        bg = BackgroundMeshOptions.from_args(args)
        assert bg.sdf_voxel_size == 0.01


class TestCOLMAPOptions:
    def test_json_roundtrip(self):
        opts = COLMAPOptions(dense=True, quality="medium")
        again = COLMAPOptions.from_json(opts.to_json())
        assert again == opts

    def test_json_missing_key_uses_default(self):
        payload = COLMAPOptions().to_json()
        del payload["single_camera_per_folder"]
        assert COLMAPOptions.from_json(payload).single_camera_per_folder is False

    def test_invalid_quality_raises(self):
        with pytest.raises(ValueError):
            COLMAPOptions(quality="ultra")


class TestInpaintingMode:
    def test_integer_mapping_roundtrip(self):
        for value in InpaintingMode.get_modes_as_integer():
            assert InpaintingMode.from_integer(value).to_integer() == value

    def test_integer_codes_match_reference(self):
        # The reference fixes the 0-4 integer codes (hive/options.py:546-559).
        assert InpaintingMode.Off.to_integer() == 0
        assert InpaintingMode.CV2_Image_Depth.to_integer() == 1
        assert InpaintingMode.Lama_Image_CV2_Depth.to_integer() == 2
        assert InpaintingMode.CV2_Image_Lama_Depth.to_integer() == 3
        assert InpaintingMode.Lama_Image_Depth.to_integer() == 4

    def test_flag_composition(self):
        assert InpaintingMode.CV2_Image | InpaintingMode.CV2_Depth \
            == InpaintingMode.CV2_Image_Depth

    def test_invalid_integer_raises(self):
        with pytest.raises(RuntimeError):
            InpaintingMode.from_integer(99)


class TestBackgroundMeshOptions:
    def test_validation(self):
        with pytest.raises(ValueError):
            BackgroundMeshOptions(sdf_voxel_size=-1.0)
        with pytest.raises(ValueError):
            BackgroundMeshOptions(key_frame_threshold=2.0)
        with pytest.raises(ValueError):
            BackgroundMeshOptions(key_frame_step=1)

    def test_method_from_string(self):
        assert MeshReconstructionMethod.from_string("tsdf_fusion") \
            == MeshReconstructionMethod.TSDFFusion
        with pytest.raises(RuntimeError):
            MeshReconstructionMethod.from_string("nope")


class TestMaskDilationOptions:
    def test_filter_is_rect(self):
        f = MaskDilationOptions(num_iterations=3).filter
        assert f.shape == (3, 3)
        assert (f == 1).all()


class TestFtsOptions:
    def test_defaults(self):
        parser = argparse.ArgumentParser()
        ForegroundTrajectorySmoothingOptions.add_args(parser)
        args = parser.parse_args([])
        opts = ForegroundTrajectorySmoothingOptions.from_args(args)
        assert opts.num_epochs == 0
        assert opts.learning_rate == 1e-5


class TestReferenceFlagParity:
    # Every CLI flag the reference's option groups register
    # (grep "'--...'" over ref hive/options.py — the public CLI contract).
    REFERENCE_FLAGS = [
        "--align_scene", "--background_only", "--billboard", "--binary_path",
        "--dataset_path", "--decimation_max_error", "--dense",
        "--depth_mask_dilation_iterations", "--dilate_mask_iter",
        "--disable_coverage_constraint", "--disable_scaling",
        "--estimate_depth", "--estimate_pose", "--frame_step",
        "--fts_learning_rate", "--fts_num_epochs", "--inpainting_mode",
        "--key_frame_step", "--key_frame_threshold", "--log_file",
        "--max_depth_dist", "--max_pixel_dist", "--mesh_reconstruction_method",
        "--min_num_components", "--multiple_cameras", "--no_cache",
        "--num_faces_background", "--num_faces_object", "--num_frames",
        "--output_path", "--overwrite_ok", "--quality", "--sdf_max_voxels",
        "--sdf_volume_size", "--sdf_voxel_size", "--single_camera_per_folder",
        "--static_camera", "--vocab_path", "--webxr_add_ground_plane",
        "--webxr_add_sky_box", "--webxr_path", "--webxr_run_server",
        "--webxr_source_path", "--webxr_url",
    ]

    def test_every_reference_flag_is_accepted(self):
        import argparse

        from hive_tpu.options import (BackgroundMeshOptions, COLMAPOptions,
                                      ForegroundTrajectorySmoothingOptions,
                                      MaskDilationOptions,
                                      MeshDecimationOptions,
                                      MeshFilteringOptions, PipelineOptions,
                                      StorageOptions, WebXROptions)

        parser = argparse.ArgumentParser()
        for group in (StorageOptions, COLMAPOptions, MeshDecimationOptions,
                      MaskDilationOptions, MeshFilteringOptions,
                      BackgroundMeshOptions,
                      ForegroundTrajectorySmoothingOptions, WebXROptions,
                      PipelineOptions):
            group.add_args(parser)

        ours = set()
        for action in parser._actions:
            ours.update(action.option_strings)

        missing = [flag for flag in self.REFERENCE_FLAGS if flag not in ours]
        assert not missing, f"reference CLI flags missing: {missing}"
