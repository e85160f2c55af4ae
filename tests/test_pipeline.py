"""End-to-end pipeline test over a synthetic dataset: runs the full
background + foreground reconstruction and checks the exported artifacts."""

import json
import os
from os.path import join as pjoin

import numpy as np
import pytest

from hive_tpu.io import HiveDataset
from hive_tpu.meshing.gltf import load_glb
from hive_tpu.options import (BackgroundMeshOptions, PipelineOptions, StorageOptions,
                              WebXROptions)
from hive_tpu.pipeline import Pipeline
from tests.helpers import make_synthetic_hive_dataset


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    dataset_path = make_synthetic_hive_dataset(root / "dataset", num_frames=3)
    output_path = str(root / "output")
    webxr_path = str(root / "webxr")

    pipeline = Pipeline(
        options=PipelineOptions(num_frames=-1, log_file=str(root / "logs.log")),
        storage_options=StorageOptions(dataset_path=dataset_path, output_path=output_path,
                                       overwrite_ok=True),
        static_mesh_options=BackgroundMeshOptions(sdf_voxel_size=0.04,
                                                  sdf_max_voxels=8_000_000,
                                                  depth_mask_dilation_iterations=2),
        webxr_options=WebXROptions(webxr_path=webxr_path),
    )

    dataset = HiveDataset(dataset_path)
    pipeline.run(dataset=dataset)

    return dict(pipeline=pipeline, dataset_path=dataset_path, output_path=output_path,
                webxr_path=webxr_path)


class TestPipelineEndToEnd:
    def test_meshes_written(self, pipeline_run):
        mesh_dir = pjoin(pipeline_run["output_path"], "mesh")
        assert os.path.isfile(pjoin(mesh_dir, "fg.glb"))
        assert os.path.isfile(pjoin(mesh_dir, "bg.glb"))
        assert os.path.isfile(pjoin(mesh_dir, "metadata.json"))

    def test_background_mesh_geometry(self, pipeline_run):
        scene = load_glb(pjoin(pipeline_run["output_path"], "mesh", "bg.glb"))
        assert len(scene.geometry) == 1

        mesh = scene.geometry["000000"]
        assert mesh.num_faces > 100
        assert mesh.vertex_colors is not None
        # The wall is 2 m away and ~2.4 m wide at this FOV; after centering the
        # mesh must stay within a few meters of the origin.
        assert np.abs(mesh.vertices).max() < 5.0

    def test_foreground_meshes_per_frame(self, pipeline_run):
        scene = load_glb(pjoin(pipeline_run["output_path"], "mesh", "fg.glb"))
        # One textured mesh per frame (the moving blob covers >1% of the frame).
        assert scene.node_names == ["000000", "000001", "000002"]

        for mesh in scene.geometry.values():
            assert mesh.num_faces > 0
            assert mesh.texture is not None
            assert mesh.uv is not None
            assert (mesh.uv >= -1e-5).all() and (mesh.uv <= 1 + 1e-5).all()

    def test_webxr_export(self, pipeline_run):
        export_dir = pjoin(pipeline_run["webxr_path"], "dataset")
        assert os.path.isfile(pjoin(export_dir, "fg.glb"))
        assert os.path.isfile(pjoin(export_dir, "bg.glb"))

        with open(pjoin(export_dir, "metadata.json")) as f:
            metadata = json.load(f)

        assert metadata["num_frames"] == 3
        assert metadata["fps"] == 30.0
        assert metadata["use_vertex_colour_for_bg"] is True
        assert "fov_y" in metadata

    def test_profiling_json_schema(self, pipeline_run):
        with open(pjoin(pipeline_run["dataset_path"], "profiling.json")) as f:
            profiling = json.load(f)

        # The benchmark contract keys (SURVEY.md §5.1 / BASELINE.md).
        assert "elapsed_time" in profiling
        assert {"total", "per_frame"} <= set(profiling["elapsed_time"])
        assert "timing" in profiling
        assert "background_reconstruction" in profiling["timing"]
        background = profiling["timing"]["background_reconstruction"]
        assert {"key_frame_selection", "voxel_sizing", "integration",
                "mesh_extraction"} <= set(background)
        assert "foreground_reconstruction" in profiling["timing"]
        assert "mesh_tri_count" in profiling
        assert "peak_ram_usage" in profiling
        assert "peak_vram_usage" in profiling
        assert "frame_count" in profiling
        # Session weather context (probe latency / call floor / backend) so
        # cross-day perf numbers carry their own correction context.
        assert "tunnel_health" in profiling
        assert profiling["tunnel_health"].get("backend") == "cpu"

        # Rolled-up stats have count/total/mean.
        rollup = profiling["timing"]["foreground_reconstruction"]["face_filtering"]
        assert {"count", "total", "mean"} <= set(rollup)
        assert rollup["count"] > 0

    def test_mesh_compression_stats(self, pipeline_run):
        """Without draco on PATH, the native KHR_mesh_quantization fallback
        must still compress and record the reference stats schema."""
        with open(pjoin(pipeline_run["dataset_path"], "profiling.json")) as f:
            profiling = json.load(f)

        compression = profiling["mesh_compression"]
        for part in ("foreground", "background"):
            stats = compression[part]
            assert stats["compressed_file_size"] < stats["uncompressed_file_size"]
            assert stats["compression_ratio"] > 1.0
            assert 0.0 < stats["data_saving"] < 1.0
            assert stats["method"] in ("draco", "quantization")
            if stats["method"] == "quantization":
                # Transfer-side gzip sibling: wire ratio beats the on-disk
                # quantization ratio, and the .gz file exists next to the
                # canonical .glb for the viewer server to ship.
                assert stats["gzip_file_size"] < stats["compressed_file_size"]
                assert (stats["gzip_transfer_ratio"]
                        > stats["compression_ratio"])

        if compression["background"]["method"] == "quantization":
            mesh_dir = pjoin(pipeline_run["output_path"], "mesh")
            assert os.path.isfile(pjoin(mesh_dir, "bg.glb.gz"))

    def test_foreground_object_position(self, pipeline_run):
        """The fg blob sits at z=1.5 in front of the z=2 wall; after the
        180° flip + centering, it must be inside the scene bounds and closer
        to the camera side than the wall."""
        fg = load_glb(pjoin(pipeline_run["output_path"], "mesh", "fg.glb"))
        bg = load_glb(pjoin(pipeline_run["output_path"], "mesh", "bg.glb"))

        fg_bounds = fg.geometry["000000"].bounds
        bg_bounds = bg.geometry["000000"].bounds

        assert fg_bounds is not None and bg_bounds is not None
        # The blob must sit in front of the wall (smaller z after centering),
        # with the ~0.5 m wall-to-blob gap preserved.
        assert fg_bounds[1][2] <= bg_bounds[1][2] + 0.1
        gap = bg_bounds[1][2] - fg_bounds[1][2]
        assert 0.2 < gap < 0.8


class TestSceneBounds:
    """_get_scene_bounds must survive EITHER scene being empty (bounds
    None) — an empty background after hours of reconstruction must not
    crash centering (round-5 review finding)."""

    @staticmethod
    def _scene_with_tri():
        from hive_tpu.meshing.mesh import Scene, TriangleMesh

        scene = Scene()
        scene.add_geometry(TriangleMesh(
            vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
            faces=np.array([[0, 1, 2]], np.int64)), node_name="m")
        return scene

    def test_empty_background(self):
        from hive_tpu.meshing.mesh import Scene
        from hive_tpu.pipeline import Pipeline

        bounds = Pipeline._get_scene_bounds(self._scene_with_tri(), Scene())
        assert bounds is not None and bounds.shape == (2, 3)

    def test_empty_foreground(self):
        from hive_tpu.meshing.mesh import Scene
        from hive_tpu.pipeline import Pipeline

        bounds = Pipeline._get_scene_bounds(Scene(), self._scene_with_tri())
        assert bounds is not None and bounds.shape == (2, 3)

    def test_both_empty(self):
        from hive_tpu.meshing.mesh import Scene
        from hive_tpu.pipeline import Pipeline

        assert Pipeline._get_scene_bounds(Scene(), Scene()) is None


class TestBackgroundOnly:
    def test_background_only_flag(self, tmp_path):
        dataset_path = make_synthetic_hive_dataset(tmp_path / "ds", num_frames=2)
        output_path = str(tmp_path / "out")

        pipeline = Pipeline(
            options=PipelineOptions(background_only=True, log_file=str(tmp_path / "l.log")),
            storage_options=StorageOptions(dataset_path=dataset_path,
                                           output_path=output_path, overwrite_ok=True),
            static_mesh_options=BackgroundMeshOptions(sdf_voxel_size=0.05,
                                                      sdf_max_voxels=4_000_000,
                                                      depth_mask_dilation_iterations=2),
            webxr_options=WebXROptions(webxr_path=str(tmp_path / "webxr")),
        )

        pipeline.run(dataset=HiveDataset(dataset_path))

        fg = load_glb(pjoin(output_path, "mesh", "fg.glb"))
        assert len(fg.geometry) == 0

        bg = load_glb(pjoin(output_path, "mesh", "bg.glb"))
        assert len(bg.geometry) == 1


class TestDracoViewerCopy:
    """When the external draco_transcoder runs, the in-tree viewer (which
    cannot decode KHR_draco) must still get a playable mesh: a quantized
    ``.viewer.glb`` sibling that the WebXR export prefers."""

    @staticmethod
    def _write_scene(path):
        from hive_tpu.meshing.gltf import export_scene
        from hive_tpu.meshing.mesh import Scene, TriangleMesh
        from tests.test_meshing import make_icosphere

        verts, faces = make_icosphere(2)
        colors = np.random.default_rng(0).integers(
            0, 255, size=(len(verts), 3), dtype=np.uint8)
        mesh = TriangleMesh(vertices=verts.astype(np.float32), faces=faces,
                            vertex_colors=colors)
        scene = Scene(camera_resolution=(640, 480), camera_focal=(580.0, 580.0))
        scene.add_geometry(mesh, node_name="000000")
        export_scene(scene, path)

    @pytest.fixture
    def fake_draco(self, tmp_path, monkeypatch):
        bin_dir = tmp_path / "bin"
        bin_dir.mkdir()
        fake = bin_dir / "draco_transcoder"
        # Stands in for the real transcoder: consumes -i/-o and writes an
        # output the in-tree viewer could NOT play if it were real draco.
        fake.write_text("#!/bin/sh\ncp \"$2\" \"$4\"\n")
        fake.chmod(0o755)
        monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    def test_viewer_sibling_written_and_preferred(self, tmp_path, fake_draco):
        import types

        from hive_tpu.pipeline import Pipeline

        mesh_dir = tmp_path / "mesh"
        mesh_dir.mkdir()
        for name in ("fg", "bg"):
            self._write_scene(str(mesh_dir / f"{name}.glb"))

        fake_pipeline = types.SimpleNamespace(profiling={})
        Pipeline._compress_with_draco(fake_pipeline, str(mesh_dir / "fg.glb"))

        stats = fake_pipeline.profiling["mesh_compression"]["foreground"]
        assert stats["method"] == "draco"
        viewer_copy = mesh_dir / "fg.viewer.glb"
        assert viewer_copy.is_file()
        # The viewer-facing artifact gets its pre-gzipped sibling too.
        assert (mesh_dir / "fg.viewer.glb.gz").is_file()
        # The sibling must actually be the quantized (viewer-playable) form.
        assert b"KHR_mesh_quantization" in viewer_copy.read_bytes()
        loaded = load_glb(str(viewer_copy))
        assert loaded.geometry["000000"].num_vertices > 0

        webxr_root = tmp_path / "webxr"
        fake_exporter = types.SimpleNamespace(
            webxr_options=WebXROptions(webxr_path=str(webxr_root)))
        Pipeline._export_video_webxr(fake_exporter, str(mesh_dir),
                                     fg_scene_name="fg", bg_scene_name="bg",
                                     metadata={"num_frames": 1},
                                     export_name="ds")
        exported = webxr_root / "ds" / "fg.glb"
        assert exported.read_bytes() == viewer_copy.read_bytes()
        # ...and the export ships the gz sibling for the viewer server.
        assert (webxr_root / "ds" / "fg.glb.gz").is_file()
        # bg had no draco pass, so its plain file ships unchanged.
        assert (webxr_root / "ds" / "bg.glb").read_bytes() == \
            (mesh_dir / "bg.glb").read_bytes()

    def test_rewrite_clears_stale_viewer_sibling(self, tmp_path):
        """A fresh mesh write must drop a .viewer.glb left by a PREVIOUS
        run into the same folder — otherwise the WebXR export would prefer
        last run's mesh over the one just reconstructed."""
        from hive_tpu.meshing.gltf import load_glb as _load
        from hive_tpu.pipeline import Pipeline
        from hive_tpu.meshing.mesh import Scene

        mesh_dir = tmp_path / "mesh"
        mesh_dir.mkdir()
        stale = mesh_dir / "fg.viewer.glb"
        stale.write_bytes(b"stale bytes from an earlier reconstruction")

        scene = Scene(camera_resolution=(640, 480),
                      camera_focal=(580.0, 580.0))
        Pipeline._write_mesh_to_disk(str(mesh_dir), "fg", scene)

        assert not stale.exists()


class TestHostParallelMeshing:
    """VERDICT r1 #9: the per-frame foreground meshing fan-out must be
    frame-independent — a multi-worker thread pool (reference
    hive/utils.py:77-105, hive/pipeline.py:491) yields byte-identical
    geometry in the same node order and complete per-frame profiling."""

    @pytest.fixture(scope="class")
    def parallel_scenes(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("host_parallel")
        dataset_path = make_synthetic_hive_dataset(root / "dataset", num_frames=4)
        dataset = HiveDataset(dataset_path)

        def build(workers: int):
            pipeline = Pipeline(
                options=PipelineOptions(num_frames=-1, log_file=str(root / f"w{workers}.log")),
                storage_options=StorageOptions(dataset_path=dataset_path,
                                               output_path=str(root / f"out{workers}"),
                                               overwrite_ok=True))
            os.environ["HIVE_NUM_WORKERS"] = str(workers)
            try:
                scene = pipeline._create_scene(dataset, num_frames=-1)
            finally:
                os.environ.pop("HIVE_NUM_WORKERS", None)
            return scene, pipeline.profiling

        scene_1, prof_1 = build(1)
        scene_4, prof_4 = build(4)
        return dict(scene_1=scene_1, prof_1=prof_1, scene_4=scene_4, prof_4=prof_4)

    def test_node_order_is_deterministic(self, parallel_scenes):
        names_1 = parallel_scenes["scene_1"].node_names
        names_4 = parallel_scenes["scene_4"].node_names
        assert names_1 == names_4 == [f"{i:06d}" for i in range(4)]

    def test_geometry_identical_across_pool_widths(self, parallel_scenes):
        scene_1, scene_4 = parallel_scenes["scene_1"], parallel_scenes["scene_4"]

        for name in scene_1.node_names:
            mesh_1 = scene_1.geometry[name]
            mesh_4 = scene_4.geometry[name]
            assert np.array_equal(mesh_1.vertices, mesh_4.vertices)
            assert np.array_equal(mesh_1.faces, mesh_4.faces)

    def test_profiling_covers_every_frame(self, parallel_scenes):
        for key in ("prof_1", "prof_4"):
            per_object = parallel_scenes[key]["timing"][
                "foreground_reconstruction"]["per_object_mesh"]["total"]
            assert sorted(per_object.keys()) == [0, 1, 2, 3]
            for index in range(4):
                # Exactly the single moving blob (object id 1) per frame.
                assert list(per_object[index].keys()) == [1]
                assert per_object[index][1] >= 0.0


class TestStageOverlapErrorHandling:
    """A background-stage failure must propagate promptly (not wait for the
    whole foreground stage) and must not swallow a concurrent foreground
    failure (it is logged when the job finishes)."""

    def _make_pipeline(self, tmp_path):
        dataset_path = make_synthetic_hive_dataset(tmp_path / "ds", num_frames=2)
        pipeline = Pipeline(
            options=PipelineOptions(num_frames=-1, log_file=str(tmp_path / "l.log")),
            storage_options=StorageOptions(dataset_path=dataset_path,
                                           output_path=str(tmp_path / "out"),
                                           overwrite_ok=True),
            static_mesh_options=BackgroundMeshOptions(sdf_voxel_size=0.05,
                                                      sdf_max_voxels=4_000_000,
                                                      depth_mask_dilation_iterations=2),
            webxr_options=WebXROptions(webxr_path=str(tmp_path / "webxr")),
        )
        return pipeline, HiveDataset(dataset_path)

    def test_background_error_propagates_and_fg_failure_logged(self, tmp_path):
        import logging as _logging
        import threading
        import time

        pipeline, dataset = self._make_pipeline(tmp_path)

        fg_started = threading.Event()

        def slow_failing_foreground(*args, **kwargs):
            fg_started.set()
            time.sleep(0.5)
            raise ValueError("foreground boom")

        def failing_background(*args, **kwargs):
            fg_started.wait(timeout=10.0)
            raise RuntimeError("background boom")

        pipeline._create_foreground_scene = slow_failing_foreground
        pipeline._create_background_scene = failing_background

        # Own handler on the root logger: setup_logger (run in the Pipeline
        # constructor) rebuilds root handlers, which evicts pytest's caplog.
        records = []

        class _Collect(_logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        collector = _Collect(level=_logging.ERROR)
        _logging.getLogger().addHandler(collector)
        try:
            start = time.time()
            with pytest.raises(RuntimeError, match="background boom"):
                pipeline.run(dataset=dataset)
            elapsed = time.time() - start

            # The raise must not have waited on a foreground stage that keeps
            # running long after the error (bounded well under the fg sleep +
            # run overhead if it had blocked on pool shutdown).
            assert elapsed < 30.0

            # The concurrent foreground failure surfaces in the log once the
            # (uncancellable) job finishes.
            deadline = time.time() + 5.0
            while time.time() < deadline:
                if any("Foreground stage also failed" in m for m in records):
                    break
                time.sleep(0.05)
            assert any("Foreground stage also failed" in m and "foreground boom" in m
                       for m in records)
        finally:
            _logging.getLogger().removeHandler(collector)

    def test_overlap_flag_recorded(self, tmp_path):
        pipeline, dataset = self._make_pipeline(tmp_path)
        pipeline.run(dataset=dataset)
        assert pipeline.profiling["timing"]["stages_overlapped"] is True
