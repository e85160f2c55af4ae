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


def _orientation(hw) -> str:
    """'portrait' when height is the long (or tied) side, else 'landscape'."""
    return "portrait" if hw[0] >= hw[1] else "landscape"


def calculate_target_resolution(source_hw, target_hw):
    """Resolve a resize spec into a concrete (height, width) pair.

    Two spec forms are accepted (capability parity with the reference's
    resize sanity checks, ref hive/image_processing.py:113):

    * an **int** — the desired length of the *longest* side; the short side
      scales proportionally (truncated to int, matching the reference's
      rounding so cached datasets keep identical frame sizes);
    * a **(height, width) tuple of ints** — taken as-is after validation.

    Warnings are logged when the resolved shape flips orientation
    (portrait<->landscape) or noticeably changes aspect ratio relative to
    the source frames, since either usually means swapped height/width
    arguments or future stretching artefacts.
    """
    src_h, src_w = int(source_hw[0]), int(source_hw[1])

    if isinstance(target_hw, int):
        # Height wins ties, like np.argmax over (h, w) in the spec's origin.
        if src_h >= src_w:
            resolved = (target_hw, int(src_w * (target_hw / src_h)))
        else:
            resolved = (int(src_h * (target_hw / src_w)), target_hw)
    else:
        if not isinstance(target_hw, tuple) or len(target_hw) != 2:
            raise ValueError(
                "A target resolution must be an int (longest side) or a "
                f"(height, width) pair; got {target_hw!r}.")
        if not all(isinstance(side, int) for side in target_hw):
            raise ValueError(
                "Both sides of a (height, width) target resolution must be "
                f"ints; got types ({type(target_hw[0]).__name__}, "
                f"{type(target_hw[1]).__name__}).")
        resolved = target_hw

    if _orientation(resolved) != _orientation((src_h, src_w)):
        logging.warning(
            f"Resizing {_orientation((src_h, src_w))} source frames "
            f"(w{src_w} x h{src_h}) to a {_orientation(resolved)} target "
            f"(w{resolved[1]} x h{resolved[0]}) — height/width may be swapped.")

    source_aspect = round(src_w / src_h, 2)
    target_aspect = round(resolved[1] / resolved[0], 2)

    if abs(source_aspect - target_aspect) > 1e-8:
        logging.warning(
            f"Source frames have aspect ratio {source_aspect:.2f} but the "
            f"target resolution has {target_aspect:.2f}; resized images "
            f"will be stretched.")

    return tuple(resolved)
