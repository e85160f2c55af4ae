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
