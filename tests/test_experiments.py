"""Experiments harness: Latex helpers, trajectory comparisons, and the
LLFF/HyperNeRF render-vs-photo drivers (smoke-level, with depth estimation
stubbed to a constant plane — DPT itself is covered in test_models)."""

import json
import os
from os.path import join as pjoin

import cv2
import numpy as np
import pytest

from scripts.experiments import (Experiments, Latex,
                                 run_trajectory_comparisons)
from tests.test_data_loaders import make_hypernerf_capture, make_llff_capture


class TestLatex:
    def test_format_number(self):
        assert Latex.format_number(1234.5678) == "1,234.57"
        assert Latex.format_number(float("nan")) == "--"
        assert Latex.format_number(None) == "--"

    def test_table(self):
        table = Latex.table(["name", "value"], [["a", "1"], ["b", "2"]])
        assert r"\begin{tabular}{lr}" in table
        assert "a & 1" in table


class TestTrajectoryComparisons:
    def test_metrics_written(self, tmp_path):
        from hive_tpu.geometric import Trajectory

        rng = np.random.default_rng(0)
        n = 20
        gt = np.zeros((n, 7), dtype=np.float32)
        gt[:, 3] = 1.0  # identity quaternion (qx qy qz qw layout)
        gt[:, 4] = np.linspace(0, 1, n)

        est = gt.copy()
        est[:, 4:] += rng.normal(scale=0.01, size=(n, 3)).astype(np.float32)

        results = run_trajectory_comparisons(
            dataset=None, estimated=Trajectory(est),
            ground_truth=Trajectory(gt), output_folder=str(tmp_path))

        assert results["ate_rmse"] < 0.1
        with open(tmp_path / "trajectory_metrics.json") as fh:
            assert json.load(fh)["ate_rmse"] == results["ate_rmse"]


def _stub_depth_estimator(monkeypatch, depth_mm=2000):
    """Replace DPT depth estimation with a constant plane (uint16 mm)."""
    import hive_tpu.dataset_adaptors as adaptors

    def fake_estimate(image_dataset, output_path, **kwargs):
        os.makedirs(output_path, exist_ok=True)
        for i in range(len(image_dataset)):
            h, w = image_dataset[i].shape[:2]
            depth = np.full((h, w), depth_mm, dtype=np.uint16)
            cv2.imwrite(pjoin(output_path, f"{i:06d}.png"), depth)

    monkeypatch.setattr(adaptors, "estimate_depth_dpt", fake_estimate)


class TestRenderExperimentDrivers:
    def test_llff_driver(self, tmp_path, monkeypatch):
        _stub_depth_estimator(monkeypatch)
        capture = make_llff_capture(tmp_path / "llff_capture")

        experiments = Experiments(data_path=str(tmp_path),
                                  output_path=str(tmp_path / "out"),
                                  dataset_names=[])
        results = experiments.run_llff_experiments(capture,
                                                   sdf_max_voxels=200_000)

        assert set(results["mean"]) == {"ssim", "psnr", "lpips", "mifd"}
        assert os.path.isfile(tmp_path / "out" / "llff" / "reconstruction.ply")
        assert os.path.isfile(tmp_path / "out" / "llff" / "llff_metrics.json")

    def test_hypernerf_driver(self, tmp_path, monkeypatch):
        _stub_depth_estimator(monkeypatch)
        capture = make_hypernerf_capture(tmp_path / "hn_capture")

        experiments = Experiments(data_path=str(tmp_path),
                                  output_path=str(tmp_path / "out"),
                                  dataset_names=[])
        results = experiments.run_hypernerf_experiments(
            capture, sdf_max_voxels=200_000)

        assert set(results["mean"]) == {"ssim", "psnr", "lpips", "mifd"}
        out = tmp_path / "out" / "hypernerf"
        assert os.path.isfile(out / "reconstruction.ply")
        assert os.path.isfile(out / "hypernerf_metrics.json")
        # One render per validation view.
        assert len(os.listdir(out / "renders")) == 1


class TestMeanSummary:
    def test_streaming_mean(self):
        from scripts.experiments import MeanSummary

        summary = MeanSummary()
        assert np.isnan(summary.mean)

        for value in (1.0, 2.0, None, float("nan"), 3.0):
            summary.update(value)

        assert summary.count == 3
        assert summary.mean == pytest.approx(2.0)


class TestTSDFFusionWithColmap:
    def test_reconstructs_from_colmap_depth(self, tmp_path):
        from scripts.experiments import tsdf_fusion_with_colmap

        from hive_tpu.io import HiveDataset
        from hive_tpu.options import BackgroundMeshOptions
        from tests.helpers import make_synthetic_hive_dataset

        dataset_path = make_synthetic_hive_dataset(tmp_path / "ds", num_frames=3,
                                                   with_object=False)

        # COLMAP depth: same codec (u16 mm PNGs), wall moved to 1.8 m so the
        # reconstruction provably uses this source.
        colmap_dir = tmp_path / "ds" / "colmap_depth"
        os.makedirs(colmap_dir)
        for i in range(2):  # deliberately one frame short (COLMAP drop-out)
            depth_mm = np.full((96, 128), 1800, dtype=np.uint16)
            cv2.imwrite(pjoin(str(colmap_dir), f"{i:06d}.png"), depth_mm)

        dataset = HiveDataset(dataset_path)
        options = BackgroundMeshOptions(sdf_voxel_size=0.04,
                                        sdf_max_voxels=2_000_000)

        mesh = tsdf_fusion_with_colmap(dataset, frame_set=[0, 1, 2],
                                       mesh_options=options)

        assert mesh is not None and mesh.num_faces > 50
        # The wall must sit at ~1.8 m (the COLMAP depth), not the dataset's 2 m.
        assert abs(np.median(mesh.vertices[:, 2]) - 1.8) < 0.1
        # The swap is restored afterwards.
        assert np.median(dataset.depth_dataset[0]) == pytest.approx(2.0)

    def test_returns_none_without_colmap_depth(self, tmp_path):
        from scripts.experiments import tsdf_fusion_with_colmap

        from hive_tpu.io import HiveDataset
        from hive_tpu.options import BackgroundMeshOptions
        from tests.helpers import make_synthetic_hive_dataset

        dataset_path = make_synthetic_hive_dataset(tmp_path / "ds", num_frames=2)
        result = tsdf_fusion_with_colmap(HiveDataset(dataset_path), [0, 1],
                                         BackgroundMeshOptions())
        assert result is None


class TestMultiSequenceRollups:
    def _write_cached_metrics(self, root, group, names, filename):
        for i, name in enumerate(names):
            folder = pjoin(root, group, name)
            os.makedirs(folder, exist_ok=True)
            with open(pjoin(folder, filename), "w") as fh:
                json.dump({"mean": {"ssim": 0.5 + 0.1 * i, "psnr": 20.0 + i,
                                    "lpips": 0.2, "mifd": 3.0}}, fh)

    def test_llff_multi_sequence_rollup(self, tmp_path):
        out = str(tmp_path / "out")
        names = ["fern", "trex"]
        self._write_cached_metrics(out, "llff", names, "llff_metrics.json")

        experiments = Experiments(data_path=str(tmp_path), output_path=out,
                                  dataset_names=[])
        results = experiments.run_llff_experiments(str(tmp_path),
                                                   sequence_names=names)

        assert set(results["per_sequence"]) == set(names)
        assert results["mean"]["ssim"] == pytest.approx(0.55)
        assert results["mean"]["psnr"] == pytest.approx(20.5)
        assert os.path.isfile(pjoin(out, "llff_results.tex"))
        with open(pjoin(out, "llff_results.tex")) as fh:
            table = fh.read()
        assert "fern" in table and "mean" in table

    def test_hypernerf_multi_scene_rollup(self, tmp_path):
        out = str(tmp_path / "out")
        names = ["broom", "3dprinter"]
        self._write_cached_metrics(out, "hypernerf", names,
                                   "hypernerf_metrics.json")

        experiments = Experiments(data_path=str(tmp_path), output_path=out,
                                  dataset_names=[])
        results = experiments.run_hypernerf_experiments(str(tmp_path),
                                                        scene_names=names)

        assert set(results["per_scene"]) == set(names)
        assert results["mean"]["psnr"] == pytest.approx(20.5)
        assert os.path.isfile(pjoin(out, "hypernerf_results.tex"))


class TestMeshCompressionExperiment:
    def test_matrix_without_draco(self, tmp_path, monkeypatch):
        """Without draco_transcoder the matrix compresses with the native
        KHR_mesh_quantization encoder and still scores the render loss."""
        import shutil

        from hive_tpu.options import PipelineOptions
        from tests.helpers import make_synthetic_hive_dataset

        monkeypatch.setattr(shutil, "which", lambda name: None)

        out = str(tmp_path / "out")
        converted = pjoin(out, "ds", "gt", "dataset")
        os.makedirs(os.path.dirname(converted), exist_ok=True)
        make_synthetic_hive_dataset(converted, num_frames=2)

        from hive_tpu.options import BackgroundMeshOptions

        experiments = Experiments(data_path=str(tmp_path), output_path=out,
                                  dataset_names=["ds"], num_frames=2)
        results = experiments.run_mesh_compression_experiments(
            configs=["gt"],
            mesh_options=BackgroundMeshOptions(sdf_voxel_size=0.04,
                                               sdf_max_voxels=2_000_000))

        entry = results["ds/gt"]
        assert "bg" in entry
        assert entry["bg"]["uncompressed_file_size"] > 0
        assert entry["bg"]["method"] == "quantization"
        assert entry["bg"]["compression_ratio"] > 1.0
        assert os.path.isfile(pjoin(out, "ds", "compression", "gt",
                                    "mesh_uncompressed", "bg.glb"))
        assert os.path.isfile(pjoin(out, "ds", "compression", "gt",
                                    "mesh_compressed", "bg.glb"))
        # Quantization loss bound: compare the triangles geometrically (the
        # stronger check — z-buffer renders flicker single edge pixels at the
        # tiny test resolution, so SSIM only gets a loose bound).
        from hive_tpu.meshing.gltf import load_glb

        base = pjoin(out, "ds", "compression", "gt")
        mu = next(iter(load_glb(pjoin(base, "mesh_uncompressed",
                                      "bg.glb")).geometry.values()))
        mc = next(iter(load_glb(pjoin(base, "mesh_compressed",
                                      "bg.glb")).geometry.values()))
        extent = (mu.vertices.max(axis=0) - mu.vertices.min(axis=0)).max()
        np.testing.assert_allclose(mc.vertices[mc.faces], mu.vertices[mu.faces],
                                   atol=extent / 65535 * 0.51)
        assert entry["render_comparison"]["ssim"] > 0.8
        assert os.path.isfile(pjoin(out, "mesh_compression_results.json"))
