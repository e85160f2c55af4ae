#!/usr/bin/env python
"""Compare two images with SSIM, PSNR, LPIPS and MIFD.

CLI parity with reference scripts/compare_image_pair.py:105-146 (same metric
set and output), backed by hive_tpu.metrics.
"""

import os
import sys

# Allow running straight from a checkout: scripts/ is on sys.path, the
# package root is not.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import imageio.v3 as iio

from hive_tpu.metrics import lpips, mifd, psnr, ssim


def compare_images(image_a, image_b) -> dict:
    return {
        "ssim": ssim(image_a, image_b),
        "psnr": psnr(image_a, image_b),
        "lpips": lpips(image_a, image_b),
        "mifd": mifd(image_a, image_b),
    }


def ensure_rgb(image):
    """Normalise any loaded image to (H, W, 3): grayscale broadcasts, RGBA
    drops alpha — the metrics (and LPIPS especially) expect 3 channels
    (review finding, r5: a grayscale pair crashed the LPIPS conv stack)."""
    import numpy as np

    image = np.asarray(image)
    if image.ndim == 2:
        return np.repeat(image[..., None], 3, axis=-1)
    return image[..., :3]


def main():
    parser = argparse.ArgumentParser(
        description="Compare two images with SSIM, PSNR, LPIPS and MIFD.")
    parser.add_argument("image_a", type=str, help="Path to the first image.")
    parser.add_argument("image_b", type=str, help="Path to the second image.")
    parser.add_argument("--json", action="store_true", help="Emit JSON instead of text.")
    args = parser.parse_args()

    image_a = ensure_rgb(iio.imread(args.image_a))
    image_b = ensure_rgb(iio.imread(args.image_b))

    if image_a.shape != image_b.shape:
        raise RuntimeError(f"Image shapes differ: {image_a.shape} vs {image_b.shape}")

    results = compare_images(image_a, image_b)

    from hive_tpu.metrics import lpips_available

    if args.json:
        # Unavailable metrics are NaN internally; strict JSON has neither
        # NaN nor Infinity (identical images give PSNR = inf — json.dumps
        # would emit the non-strict 'Infinity' token; review finding, r5).
        import math

        clean = {k: (None if not math.isfinite(v) else v)
                 for k, v in results.items()}
        if not lpips_available():
            clean["skipped"] = {"lpips": "skipped: weights absent"}
        print(json.dumps(clean))
    else:
        for metric, value in results.items():
            if metric == "lpips" and value != value and not lpips_available():
                print(f"{metric.upper():>6}: skipped (weights absent)")
            else:
                print(f"{metric.upper():>6}: {value:.4f}")


if __name__ == "__main__":
    main()
