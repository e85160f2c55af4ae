"""CMU Panoptic (Kinoptic) loader tests over a synthetic capture.

The sync scenario reproduces the real failure mode the sync tables exist
for: the Kinect colour stream dropped a frame, so its stream frame numbers
drift from the HD frame index. get_synced_frame_data must return the frames
the timestamp search selected, not the raw HD index (ref hive/dataset.py:239
fetched by HD index — a faithful port of that would read the wrong frames).
"""

import json
import os
from os.path import join as pjoin

import cv2
import numpy as np
import pytest

from hive_tpu.dataset import CMUPanopticDataset


@pytest.fixture()
def capture(tmp_path):
    name = "synth"
    base = tmp_path / name
    os.makedirs(base)

    # HD stream: 5 frames at ~30 fps.
    hd_times = [100.0, 133.0, 166.0, 200.0, 233.0]
    sync = {"vga": {"index": [0], "univ_time": [100.0]},
            "hd": {"index": list(range(5)), "univ_time": hd_times}}
    with open(base / f"synctables_{name}.json", "w") as fh:
        json.dump(sync, fh)

    # Kinect node 1 dropped its 3rd frame: stream frame numbers [1,2,4,5].
    # Colour timestamps sit +6.25 ms after HD (the hardware offset the
    # loader's argmin compensates); depth +3 ms.
    ksync = {"kinect": {
        "color": {"KINECTNODE1": {"index": [1, 2, 4, 5],
                                  "univ_time": [106.25, 139.25, 206.25, 239.25]}},
        "depth": {"KINECTNODE1": {"index": [1, 2, 4, 5],
                                  "univ_time": [103.0, 136.0, 203.0, 236.0]}},
    }}
    with open(base / f"ksynctables_{name}.json", "w") as fh:
        json.dump(ksync, fh)

    # Minimal calibrations (node 1 only).
    calib = {"calibDataSource": "synthetic", "cameras": [{
        "name": "50_01", "type": "kinect-color", "resolution": [1920, 1080],
        "panel": 50, "node": 1, "K": np.eye(3).tolist(),
        "distCoef": [0, 0, 0, 0, 0], "R": np.eye(3).tolist(),
        "t": [[0.0], [0.0], [0.0]],
    }]}
    with open(base / f"calibration_{name}.json", "w") as fh:
        json.dump(calib, fh)

    kcalib = {"calibDataSource": "synthetic", "panopticCalibDataSource": "synthetic",
              "M_world2vga": np.eye(4).tolist(),
              "sensors": [{
                  "K_depth": np.eye(3).tolist(), "M_depth": np.eye(4).tolist(),
                  "distCoeffs_depth": [0, 0, 0, 0, 0],
                  "depth_width": CMUPanopticDataset.depth_frame_width,
                  "depth_height": CMUPanopticDataset.depth_frame_height,
                  "K_color": np.eye(3).tolist(), "M_color": np.eye(4).tolist(),
                  "distCoeffs_color": [0, 0, 0, 0, 0],
                  "color_width": 1920, "color_height": 1080,
                  "color_time_offset": 0, "depth_time_offset": 0,
                  "M_world2sensor": np.eye(4).tolist(),
                  "domeCenter": [[0.0], [0.0], [0.0]],
              }]}
    with open(base / f"kcalibration_{name}.json", "w") as fh:
        json.dump(kcalib, fh)

    # Colour JPEGs named by the STREAM frame number, each a constant shade.
    image_dir = base / CMUPanopticDataset.image_folder / "50_01"
    os.makedirs(image_dir)
    for frame_number in (1, 2, 4, 5):
        shade = 40 * frame_number
        cv2.imwrite(str(image_dir / f"50_01_{frame_number:08d}.jpg"),
                    np.full((32, 32, 3), shade, np.uint8))

    # depthdata.dat: received frames packed contiguously in STREAM ORDER —
    # row r holds constant (r + 1) * 100 mm.
    depth_dir = base / CMUPanopticDataset.depth_parent_folder / "KINECTNODE1"
    os.makedirs(depth_dir)
    h, w = CMUPanopticDataset.depth_frame_height, CMUPanopticDataset.depth_frame_width
    rows = [np.full((h, w), (r + 1) * 100, np.uint16) for r in range(4)]
    with open(depth_dir / CMUPanopticDataset.depth_filename, "wb") as fh:
        for row in rows:
            fh.write(row.tobytes())

    return str(base)


class TestCMUPanopticSync:
    def test_synced_pair_follows_stream_drift(self, capture):
        dataset = CMUPanopticDataset(capture)

        # HD frame 3 (t=200 ms): the closest colour entry is stream frame 4
        # (t=206.25) and the closest depth entry is stream ROW 2 (t=203).
        image, depth = dataset.get_synced_frame_data(frame_index=3, kinect_node=1)

        assert abs(float(image.mean()) - 160.0) < 3.0  # shade of frame 4
        np.testing.assert_allclose(depth, 0.3)  # row 2 -> 300 mm -> 0.3 m

    def test_depth_seek_reads_requested_row(self, capture):
        dataset = CMUPanopticDataset(capture)
        np.testing.assert_allclose(dataset.get_depth_map(1, 0), 0.1)
        np.testing.assert_allclose(dataset.get_depth_map(1, 3), 0.4)

    def test_gap_violation_raises(self, capture, tmp_path):
        dataset = CMUPanopticDataset(capture)
        # Skew the depth stream so every entry violates the 6.25 ms
        # colour-depth gap for HD frame 0.
        table = dataset.kinect_sync_table.depth["KINECTNODE1"]
        table.universal_time = table.universal_time + 50.0

        with pytest.raises(RuntimeError):
            dataset.get_synced_frame_data(frame_index=0, kinect_node=1)
