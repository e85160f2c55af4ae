"""Pipeline variant tests: RGBD background method, inpainting, billboard,
estimated depth, coverage constraint."""

import os
from os.path import join as pjoin

import numpy as np
import pytest

from hive_tpu.io import HiveDataset
from hive_tpu.meshing.gltf import load_glb
from hive_tpu.options import (BackgroundMeshOptions, InpaintingMode,
                              MeshReconstructionMethod, PipelineOptions, StorageOptions,
                              WebXROptions)
from hive_tpu.pipeline import Pipeline
from tests.helpers import make_synthetic_hive_dataset


def run_pipeline(tmp_path, pipeline_options=None, static_mesh_options=None,
                 num_frames=2, **dataset_kwargs):
    dataset_path = make_synthetic_hive_dataset(tmp_path / "ds", num_frames=num_frames,
                                               **dataset_kwargs)
    output_path = str(tmp_path / "out")

    pipeline = Pipeline(
        options=pipeline_options or PipelineOptions(log_file=str(tmp_path / "l.log")),
        storage_options=StorageOptions(dataset_path=dataset_path,
                                       output_path=output_path, overwrite_ok=True),
        static_mesh_options=static_mesh_options or BackgroundMeshOptions(
            sdf_voxel_size=0.05, sdf_max_voxels=4_000_000,
            depth_mask_dilation_iterations=2),
        webxr_options=WebXROptions(webxr_path=str(tmp_path / "webxr")),
    )

    pipeline.run(dataset=HiveDataset(dataset_path))
    return output_path


class TestRGBDBackgroundMethod:
    def test_rgbd_method_produces_textured_background(self, tmp_path):
        output = run_pipeline(
            tmp_path,
            pipeline_options=PipelineOptions(log_file=str(tmp_path / "l.log")),
            static_mesh_options=BackgroundMeshOptions(
                reconstruction_method=MeshReconstructionMethod.RGBD,
                depth_mask_dilation_iterations=2))

        bg = load_glb(pjoin(output, "mesh", "bg.glb"))
        assert len(bg.geometry) >= 1

        # RGBD background meshes are textured (per-frame key frames), not
        # vertex-coloured.
        first = next(iter(bg.geometry.values()))
        assert first.texture is not None
        assert first.num_faces > 0


class TestBillboard:
    def test_billboard_flattens_objects(self, tmp_path):
        output = run_pipeline(
            tmp_path,
            pipeline_options=PipelineOptions(billboard=True,
                                             log_file=str(tmp_path / "l.log")))

        fg = load_glb(pjoin(output, "mesh", "fg.glb"))
        mesh = fg.geometry["000000"]

        # All vertices of a billboard share (nearly) one camera-space depth;
        # with an identity-ish pose that is one z-plane.
        z_spread = mesh.vertices[:, 2].max() - mesh.vertices[:, 2].min()
        assert z_spread < 0.02


class TestCoverageConstraint:
    def test_small_objects_skipped_by_default(self, tmp_path):
        # A tiny blob (below 1% coverage) is dropped unless the constraint is
        # disabled.
        dataset_path = make_synthetic_hive_dataset(tmp_path / "small", num_frames=1,
                                                   width=256, height=192)

        # Shrink the mask to a tiny dot.
        from PIL import Image

        mask_path = pjoin(dataset_path, "mask", "000000.png")
        mask = np.asarray(Image.open(mask_path)).copy()
        mask[:] = 0
        mask[10:13, 10:13] = 1
        Image.fromarray(mask).save(mask_path)

        out_default = str(tmp_path / "out1")
        pipeline = Pipeline(
            options=PipelineOptions(log_file=str(tmp_path / "l1.log")),
            storage_options=StorageOptions(dataset_path=dataset_path,
                                           output_path=out_default, overwrite_ok=True),
            static_mesh_options=BackgroundMeshOptions(sdf_voxel_size=0.05,
                                                      sdf_max_voxels=4_000_000,
                                                      depth_mask_dilation_iterations=2),
            webxr_options=WebXROptions(webxr_path=str(tmp_path / "w1")),
        )
        pipeline.run(dataset=HiveDataset(dataset_path))

        fg = load_glb(pjoin(out_default, "mesh", "fg.glb"))
        assert len(fg.geometry) == 0  # too small -> skipped


class TestInpaintingPipeline:
    def test_cv2_inpainting_mode_creates_folders(self, tmp_path):
        from hive_tpu.dataset_adaptors import TUMAdaptor
        from tests.test_adaptors import make_tum_dataset

        tum_path = make_tum_dataset(tmp_path / "tum", num_frames=2)
        output = str(tmp_path / "converted")

        adaptor = TUMAdaptor(base_path=tum_path, output_path=output)
        dataset = adaptor.convert(estimate_pose=False, estimate_depth=False,
                                  inpainting_mode=InpaintingMode.CV2_Image_Depth)

        assert dataset.has_inpainted_frame_data
        assert os.path.isdir(pjoin(output, "rgb_inpainted"))
        assert os.path.isdir(pjoin(output, "depth_inpainted"))
        assert os.path.isdir(pjoin(output, "mask_inpainted"))

        # Inpainted masks are blacked out (no dynamic objects remain).
        from PIL import Image

        inpainted_mask = np.asarray(
            Image.open(pjoin(output, "mask_inpainted", "000000.png")))
        assert (inpainted_mask == 0).all()

        # Background datasets route to the inpainted data.
        assert dataset.bg_rgb_dataset is dataset.inpainted_rgb_dataset


class TestEstimatedDepthConversion:
    def test_convert_with_estimated_depth(self, tmp_path, monkeypatch):
        """estimate_depth runs the (randomly initialised) DPT model end to end
        and writes uint16 mm PNGs."""
        import hive_tpu.models.dpt as dpt_mod

        from hive_tpu.dataset_adaptors import TUMAdaptor
        from tests.test_adaptors import make_tum_dataset

        # The production net size (480x640, a 577-token ViT) costs ~a minute
        # of CPU compile; the depth-estimation contract under test (batching,
        # resize-back, u16-mm PNGs) is resolution-independent.
        original = dpt_mod.DPTDepthEstimator
        monkeypatch.setattr(
            dpt_mod, "DPTDepthEstimator",
            lambda **kwargs: original(**{**kwargs, "net_size": (96, 128)}))

        tum_path = make_tum_dataset(tmp_path / "tum", num_frames=2, width=64, height=48)
        output = str(tmp_path / "converted")

        adaptor = TUMAdaptor(base_path=tum_path, output_path=output)
        dataset = adaptor.convert(estimate_pose=False, estimate_depth=True,
                                  inpainting_mode=InpaintingMode.Off)

        assert len(dataset.depth_dataset) == 2
        depth = dataset.depth_dataset[0]
        assert depth.dtype == np.float32  # scaled from uint16 mm on load
        assert np.isfinite(depth).all()


def _dealias_synthetic_scene(dataset_path):
    """Perturb the synthetic dataset's intrinsics/poses off exact grid
    alignment. The pristine scene (2.0 m wall, fx=100, 0.05 m voxels) lands
    voxel-centre projections on exact half-pixel ties, where differently
    compiled programs (shard_map vs plain jit) may legitimately round ties
    differently; off-tie, sharded integration is bit-exact."""
    k_path = pjoin(dataset_path, "camera_matrix.txt")
    K = np.loadtxt(k_path)
    K[0, 0], K[1, 1] = 101.37, 99.81
    K[0, 2] += 0.123
    K[1, 2] -= 0.077
    np.savetxt(k_path, K)

    t_path = pjoin(dataset_path, "camera_trajectory.txt")
    trajectory = np.loadtxt(t_path)
    trajectory[:, 4:] += [[0.0131, 0.0072, -0.0053]]
    np.savetxt(t_path, trajectory)


class TestMultiDevicePipeline:
    def test_num_devices_pipeline_output_bit_identical(self, tmp_path):
        """--num_devices 8 routes the TSDF stage through the block-sharded
        integrator; since blocks are independent the exported background glb
        must be byte-identical to the single-device run."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")

        from hive_tpu.parallel import runtime

        def run(sub_path, num_devices):
            dataset_path = make_synthetic_hive_dataset(sub_path / "ds",
                                                       num_frames=2)
            _dealias_synthetic_scene(dataset_path)
            output_path = str(sub_path / "out")
            pipeline = Pipeline(
                options=PipelineOptions(num_devices=num_devices,
                                        log_file=str(sub_path / "l.log")),
                storage_options=StorageOptions(dataset_path=dataset_path,
                                               output_path=output_path,
                                               overwrite_ok=True),
                static_mesh_options=BackgroundMeshOptions(
                    sdf_voxel_size=0.05, sdf_max_voxels=4_000_000,
                    depth_mask_dilation_iterations=2),
                webxr_options=WebXROptions(webxr_path=str(sub_path / "webxr")),
            )
            pipeline.run(dataset=HiveDataset(dataset_path))
            return output_path

        try:
            single = run(tmp_path / "single", num_devices=1)
            sharded = run(tmp_path / "sharded", num_devices=8)
        finally:
            runtime.set_runtime_mesh(None)

        for name in ("bg.glb", "fg.glb"):
            with open(pjoin(single, "mesh", name), "rb") as f:
                single_bytes = f.read()
            with open(pjoin(sharded, "mesh", name), "rb") as f:
                sharded_bytes = f.read()

            assert single_bytes == sharded_bytes, f"{name} differs"

    def test_tsdf_fusion_uses_sharded_integrator(self, tmp_path):
        """With a runtime mesh, fusion.tsdf_fusion shards the volume (the
        sparse state ends up block-cyclic over 8 devices)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")

        from hive_tpu.fusion import tsdf_fusion
        from hive_tpu.parallel import runtime
        from hive_tpu.parallel.mesh import get_device_mesh

        dataset_path = make_synthetic_hive_dataset(tmp_path / "ds", num_frames=2)
        _dealias_synthetic_scene(dataset_path)
        dataset = HiveDataset(dataset_path)
        options = BackgroundMeshOptions(sdf_voxel_size=0.05,
                                        sdf_max_voxels=4_000_000,
                                        depth_mask_dilation_iterations=2)

        expected = tsdf_fusion(dataset, options, num_frames=2)

        runtime.set_runtime_mesh(get_device_mesh(8))
        try:
            result = tsdf_fusion(dataset, options, num_frames=2)
        finally:
            runtime.set_runtime_mesh(None)

        np.testing.assert_array_equal(result.vertices, expected.vertices)
        np.testing.assert_array_equal(result.faces, expected.faces)
        np.testing.assert_array_equal(result.vertex_colors, expected.vertex_colors)


class TestHostParallelMeshing:
    def test_multi_worker_fg_meshing_matches_serial(self, tmp_path, monkeypatch):
        """Foreground meshing with a 4-thread pool (HIVE_NUM_WORKERS) must
        produce the same scene (node order and geometry) as the serial run,
        and per-frame profiling entries for every frame — frames are
        independent (ref hive/utils.py:77-105, hive/pipeline.py:491)."""
        from hive_tpu.pipeline import Pipeline

        dataset_path = make_synthetic_hive_dataset(tmp_path / "ds", num_frames=4)
        dataset = HiveDataset(dataset_path)

        def build_pipeline():
            return Pipeline(
                options=PipelineOptions(num_frames=4,
                                        log_file=str(tmp_path / "l.log")),
                storage_options=StorageOptions(dataset_path=dataset_path,
                                               output_path=str(tmp_path / "out"),
                                               overwrite_ok=True),
                static_mesh_options=BackgroundMeshOptions(
                    sdf_voxel_size=0.05, sdf_max_voxels=2_000_000),
                webxr_options=WebXROptions(webxr_path=str(tmp_path / "webxr")),
            )

        monkeypatch.setenv("HIVE_NUM_WORKERS", "1")
        serial_pipeline = build_pipeline()
        serial = serial_pipeline._create_scene(dataset, num_frames=4)

        monkeypatch.setenv("HIVE_NUM_WORKERS", "4")
        parallel_pipeline = build_pipeline()
        result = parallel_pipeline._create_scene(dataset, num_frames=4)

        assert result.node_names == serial.node_names
        for name in serial.geometry:
            np.testing.assert_array_equal(result.geometry[name].vertices,
                                          serial.geometry[name].vertices)
            np.testing.assert_array_equal(result.geometry[name].faces,
                                          serial.geometry[name].faces)

        # Per-frame profiling aggregation is complete under concurrency: the
        # mask-creation step records one node per (frame, object).
        timing = parallel_pipeline.profiling["timing"]["foreground_reconstruction"]
        assert sorted(timing["binary_mask_creation"]) == [0, 1, 2, 3]
