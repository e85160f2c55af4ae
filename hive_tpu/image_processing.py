"""Image-domain transforms: mask dilation, depth filtering/binning, resolution math.

Capability parity with reference hive/image_processing.py (dilate_mask:30,
median_filter:48, get_bins:75, bin_depth:94, calculate_target_resolution:113).
These are host-side (cv2/NumPy) ops; model-input resize/normalisation runs on
TPU via :mod:`hive_tpu.ops.resize` instead.
"""

from __future__ import annotations

import logging

import cv2
import numpy as np

from hive_tpu.options import MaskDilationOptions
from hive_tpu.utils import validate_shape


def dilate_mask(mask: np.ndarray, dilation_options: MaskDilationOptions) -> np.ndarray:
    """Grow a binary/instance mask by repeated morphological dilation.

    :param mask: The (H, W) mask to enlarge.
    :param dilation_options: Structuring element + iteration count.
    :return: The dilated boolean mask.
    """
    validate_shape(mask, "mask", expected_shape=(None, None))

    if dilation_options.num_iterations <= 0:
        return mask.astype(bool)

    mask = mask.astype(np.float32)
    mask = cv2.dilate(mask, dilation_options.filter.astype(np.uint8),
                      iterations=dilation_options.num_iterations)

    return mask.astype(bool)


def median_filter(depth_map: np.ndarray, kernel_size: int = 63) -> np.ndarray:
    """Median-filter a depth map (NYU convention: invalid = 0, max = 10.0).

    Kernels larger than 5px require 8-bit input for cv2, so the map is
    normalised to uint8, filtered, and rescaled.
    """
    if kernel_size > 5:
        min_depth = float(depth_map.min())
        max_depth = float(depth_map.max())
        span = max(max_depth - min_depth, 1e-12)

        as_u8 = (255 * (depth_map - min_depth) / span).astype(np.uint8)
        filtered = cv2.medianBlur(as_u8, kernel_size)

        return (filtered.astype(np.float32) / 255.0) * span + min_depth

    return cv2.medianBlur(depth_map, kernel_size)


def get_bins(min_value: float = 0.0, max_value: float = 10.0, num_bins: int = 128) -> np.ndarray:
    """Log-spaced depth bins following "Deep Ordinal Regression Network for
    Monocular Depth Estimation" (https://arxiv.org/abs/1806.02446)."""
    epsilon = 1.0 - min_value
    alpha = min_value + epsilon
    beta = max_value + epsilon

    i = np.arange(num_bins)
    thresholds = np.exp(np.log(alpha) + np.log(beta / alpha) * i / num_bins) - epsilon

    return np.append(thresholds, max_value)


def bin_depth(depth_map: np.ndarray, min_depth: float = 0.0, max_depth: float = 10.0,
              num_bins: int = 128) -> np.ndarray:
    """Quantise depth values into ordered bins of increasing size."""
    bins = get_bins(min_depth, max_depth, num_bins=num_bins)
    # digitize returns len(bins) for values >= bins[-1] (e.g. depths clamped
    # exactly at max_depth — the NYU cap); clamp into the last bin.
    indices = np.minimum(np.digitize(depth_map, bins), len(bins) - 1)
    return bins[indices]


def calculate_target_resolution(source_hw, target_hw):
    """Resolve a target resolution spec into a concrete (height, width).

    ``target_hw`` may be an int (desired length of the longest side, aspect
    preserved) or an explicit (height, width) tuple.
    """
    if isinstance(target_hw, int):
        longest = int(np.argmax(source_hw))
        shortest = 1 - longest

        new_size = [0, 0]
        new_size[longest] = target_hw
        scale = target_hw / source_hw[longest]
        new_size[shortest] = int(source_hw[shortest] * scale)
        target_hw = new_size
    elif isinstance(target_hw, tuple):
        if len(target_hw) != 2:
            raise ValueError(f"The target resolution must be a 2-tuple, "
                             f"but got a {len(target_hw)}-tuple.")

        if not all(isinstance(side, int) for side in target_hw):
            raise ValueError(f"Expected target resolution to be a 2-tuple of integers, but got "
                             f"({type(target_hw[0])}, {type(target_hw[1])}).")

    target_orientation = "portrait" if np.argmax(target_hw) == 0 else "landscape"
    source_orientation = "portrait" if np.argmax(source_hw) == 0 else "landscape"

    if target_orientation != source_orientation:
        logging.warning(
            f"The input images appear to be in {source_orientation} "
            f"({source_hw[1]}x{source_hw[0]}), but they are being resized to what appears to be "
            f"{target_orientation} ({target_hw[1]}x{target_hw[0]})")

    source_aspect = np.round(source_hw[1] / source_hw[0], decimals=2)
    target_aspect = np.round(target_hw[1] / target_hw[0], decimals=2)

    if not np.isclose(source_aspect, target_aspect):
        logging.warning(f"The aspect ratio of the source video is {source_aspect:.2f}, however "
                        f"the aspect ratio of the target resolution is {target_aspect:.2f}. "
                        f"This may lead to stretching in the images.")

    return tuple(target_hw)
