"""Shared test helpers: synthetic HIVE-format dataset generation."""

import json
import os
from os.path import join as pjoin

import numpy as np
from PIL import Image

from hive_tpu.options import COLMAPOptions


def make_synthetic_hive_dataset(base_path, num_frames=4, width=128, height=96,
                                with_object=True, fps=30.0):
    """Write a synthetic HIVE-format dataset: a camera sliding sideways in
    front of a wall at z=2 m with an optional moving 'person' blob at z=1.5 m.

    :return: the dataset path (str).
    """
    base_path = str(base_path)
    os.makedirs(pjoin(base_path, "rgb"), exist_ok=True)
    os.makedirs(pjoin(base_path, "depth"), exist_ok=True)
    os.makedirs(pjoin(base_path, "mask"), exist_ok=True)

    fx = fy = 100.0
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0

    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    np.savetxt(pjoin(base_path, "camera_matrix.txt"), K)

    # World-to-camera poses: camera slides along +x.
    poses = np.zeros((num_frames, 7))
    poses[:, 3] = 1.0  # identity quaternion (x, y, z, w)
    poses[:, 4] = -0.02 * np.arange(num_frames)  # t_x = -camera_x
    np.savetxt(pjoin(base_path, "camera_trajectory.txt"), poses)

    us, vs = np.meshgrid(np.arange(width), np.arange(height))

    for i in range(num_frames):
        rgb = np.zeros((height, width, 3), dtype=np.uint8)
        rgb[..., 0] = 60
        rgb[..., 1] = (us * 255 // width).astype(np.uint8)
        rgb[..., 2] = (vs * 255 // height).astype(np.uint8)

        depth_m = np.full((height, width), 2.0, dtype=np.float64)
        mask = np.zeros((height, width), dtype=np.uint8)

        if with_object:
            # A round "person" moving across the view at z = 1.5.
            center_u = width // 4 + i * 6
            center_v = height // 2
            radius = height // 5
            blob = (us - center_u) ** 2 + (vs - center_v) ** 2 < radius ** 2

            depth_m[blob] = 1.5
            mask[blob] = 1
            rgb[blob] = [200, 64, 64]

        Image.fromarray(rgb).save(pjoin(base_path, "rgb", f"{i:06d}.png"))

        depth_mm = (depth_m * 1000).astype(np.uint16)
        Image.fromarray(depth_mm).save(pjoin(base_path, "depth", f"{i:06d}.png"))
        Image.fromarray(mask).save(pjoin(base_path, "mask", f"{i:06d}.png"))

    metadata = dict(
        num_frames=num_frames, fps=fps, frame_step=1, width=width, height=height,
        depth_scale=1.0 / 1000.0, max_depth=10.0, depth_mask_dilation_iterations=10,
        estimate_pose=False, estimate_depth=False,
        colmap_options=COLMAPOptions().to_json(),
    )

    with open(pjoin(base_path, "metadata.json"), "w") as f:
        json.dump(metadata, f)

    return base_path
