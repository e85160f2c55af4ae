"""Image-quality metrics: SSIM, PSNR, LPIPS, MIFD.

The reference pulled SSIM/PSNR from skimage and LPIPS from the lpips package
(scripts/compare_image_pair.py:29-134); here SSIM/PSNR are implemented
directly in JAX (jit-compiled, batched — they are plain convolutions and run
on TPU), MIFD uses cv2 SIFT matching, and LPIPS is computed with a
VGG-ish feature distance when weights are available (gated; returns NaN with a
warning otherwise, keeping the metric-table contract intact).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional

import cv2
import numpy as np


# ---------------------------------------------------------------------------
# PSNR / SSIM (JAX).
# ---------------------------------------------------------------------------

def psnr(image_a: np.ndarray, image_b: np.ndarray, data_range: float = 255.0) -> float:
    """Peak signal-to-noise ratio between two images."""
    a = np.asarray(image_a, dtype=np.float64)
    b = np.asarray(image_b, dtype=np.float64)

    mse = np.mean((a - b) ** 2)

    if mse == 0:
        return float("inf")

    return float(10.0 * np.log10(data_range ** 2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    offsets = np.arange(size) - (size - 1) / 2.0
    kernel_1d = np.exp(-(offsets ** 2) / (2 * sigma ** 2))
    kernel_1d /= kernel_1d.sum()
    return np.outer(kernel_1d, kernel_1d)


def ssim(image_a: np.ndarray, image_b: np.ndarray, data_range: float = 255.0) -> float:
    """Structural similarity (Wang et al. 2004), 11x11 Gaussian window.

    Multi-channel images are averaged over channels (the scikit-image
    convention the reference relied on).
    """
    a = np.asarray(image_a, dtype=np.float64)
    b = np.asarray(image_b, dtype=np.float64)

    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]

    kernel = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def filter2d(img):
        return np.stack([cv2.filter2D(img[..., ch], -1, kernel,
                                      borderType=cv2.BORDER_REFLECT)
                         for ch in range(img.shape[-1])], axis=-1)

    mu_a = filter2d(a)
    mu_b = filter2d(b)

    mu_a2 = mu_a ** 2
    mu_b2 = mu_b ** 2
    mu_ab = mu_a * mu_b

    sigma_a2 = filter2d(a * a) - mu_a2
    sigma_b2 = filter2d(b * b) - mu_b2
    sigma_ab = filter2d(a * b) - mu_ab

    ssim_map = ((2 * mu_ab + c1) * (2 * sigma_ab + c2)) \
        / ((mu_a2 + mu_b2 + c1) * (sigma_a2 + sigma_b2 + c2))

    return float(ssim_map.mean())


def _lazy_jit(fn=None, **jit_kwargs):
    """functools-style deferred jax.jit: resolves jax on first call so this
    module keeps its lazy-import discipline, then caches the jitted fn."""
    def wrap(f):
        box = {}

        def call(*args, **kwargs):
            if "jit" not in box:
                import jax

                box["jit"] = jax.jit(f, **jit_kwargs)
            return box["jit"](*args, **kwargs)

        return call

    return wrap(fn) if fn is not None else wrap


@partial(_lazy_jit, static_argnames=("data_range",))
def _batch_ssim_psnr_device(a, b, data_range: float = 255.0):
    import jax
    import jax.numpy as jnp

    kernel = jnp.asarray(_gaussian_kernel(), dtype=jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    pad = kernel.shape[0] // 2

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)

    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    psnr_values = 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))

    # Depthwise Gaussian filtering via conv per channel. Symmetric
    # (edge-inclusive) padding explicitly: 'SAME' pads with ZEROS (which
    # depresses mu/sigma in the outer ring) and mode="reflect" is
    # BORDER_REFLECT_101 — the host path blurs with cv2 BORDER_REFLECT,
    # which is numpy 'symmetric', so only that mode makes device and host
    # SSIM agree in the border ring (review finding, r5).
    k = kernel[:, :, None, None]

    def blur(x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode="symmetric")
        return jax.lax.conv_general_dilated(
            x, jnp.tile(k, (1, 1, 1, c)), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu_a, mu_b = blur(a), blur(b)
    sigma_a2 = blur(a * a) - mu_a ** 2
    sigma_b2 = blur(b * b) - mu_b ** 2
    sigma_ab = blur(a * b) - mu_a * mu_b

    ssim_map = ((2 * mu_a * mu_b + c1) * (2 * sigma_ab + c2)) \
        / ((mu_a ** 2 + mu_b ** 2 + c1) * (sigma_a2 + sigma_b2 + c2))

    return jnp.mean(ssim_map, axis=(1, 2, 3)), psnr_values


def batch_ssim_psnr(frames_a: np.ndarray, frames_b: np.ndarray,
                    data_range: float = 255.0):
    """Batched SSIM + PSNR on device: (N, H, W, C) pairs → (N,), (N,).

    The device path for evaluating whole rendered sequences at once. The
    jitted kernel is module-level so repeat calls at one shape hit the
    in-process jit cache instead of retracing per call (review finding,
    r5).
    """
    import jax.numpy as jnp

    ssim_values, psnr_values = _batch_ssim_psnr_device(
        jnp.asarray(frames_a), jnp.asarray(frames_b), data_range=data_range)
    return np.asarray(ssim_values), np.asarray(psnr_values)


# ---------------------------------------------------------------------------
# MIFD — mean SIFT-match pixel distance (ref compare_image_pair.py:29-103).
# ---------------------------------------------------------------------------

def mifd(image_a: np.ndarray, image_b: np.ndarray,
         ratio_threshold: float = 0.7) -> float:
    """Mean image feature distance: average pixel distance between matched
    SIFT features of the two images (NaN when nothing matches)."""
    gray_a = cv2.cvtColor(image_a, cv2.COLOR_RGB2GRAY) if image_a.ndim == 3 else image_a
    gray_b = cv2.cvtColor(image_b, cv2.COLOR_RGB2GRAY) if image_b.ndim == 3 else image_b

    sift = cv2.SIFT_create()
    kp_a, desc_a = sift.detectAndCompute(gray_a, None)
    kp_b, desc_b = sift.detectAndCompute(gray_b, None)

    if desc_a is None or desc_b is None or len(kp_a) < 2 or len(kp_b) < 2:
        return float("nan")

    matcher = cv2.FlannBasedMatcher(dict(algorithm=1, trees=5), dict(checks=50))
    matches = matcher.knnMatch(desc_a, desc_b, k=2)

    distances = []

    for pair in matches:
        if len(pair) < 2:
            continue

        m, n = pair
        if m.distance > ratio_threshold * n.distance:
            continue

        pt_a = np.asarray(kp_a[m.queryIdx].pt)
        pt_b = np.asarray(kp_b[m.trainIdx].pt)
        distances.append(np.linalg.norm(pt_a - pt_b))

    if not distances:
        return float("nan")

    return float(np.mean(distances))


# ---------------------------------------------------------------------------
# LPIPS (weights-gated).
# ---------------------------------------------------------------------------

_lpips_model = None


def _resolve_lpips():
    """Resolve (once) the LPIPS backend: converted-weights JAX scorer, then
    the torch ``lpips`` package, else False (unavailable)."""
    global _lpips_model

    if _lpips_model is None:
        from hive_tpu.models.lpips import load_scorer

        scorer = load_scorer()
        if scorer is not None:
            _lpips_model = ("jax", scorer)
        else:
            try:
                import lpips as lpips_package
                import torch

                _lpips_model = (lpips_package.LPIPS(net="alex"), torch)
            except Exception as exc:
                logging.warning(f"LPIPS unavailable ({exc}); reporting NaN.")
                _lpips_model = False

    return _lpips_model


def lpips_available() -> bool:
    """True when :func:`lpips` can produce real numbers (weights resolved)."""
    return _resolve_lpips() is not False


def metric_skip_notes(results: dict) -> dict:
    """Self-describing skip labels for metrics whose samples are ALL
    non-finite.

    Results tables must say WHY a column is empty instead of silently
    NaN-dropping it — the reference always ships LPIPS weights
    (ref scripts/compare_image_pair.py:105-134, download_weights.py:22-36),
    so an LPIPS-less table here is a degraded mode worth labelling.

    :param results: metric name -> list of per-sample values.
    :return: metric name -> reason string, only for fully-skipped metrics.
    """
    notes = {}
    for metric, values in results.items():
        values = [v for v in values if isinstance(v, (int, float, np.floating))]
        if values and not any(np.isfinite(values)):
            if metric == "lpips" and not lpips_available():
                notes[metric] = "skipped: weights absent"
            else:
                notes[metric] = "skipped: all values non-finite"
    return notes


def lpips(image_a: np.ndarray, image_b: np.ndarray) -> float:
    """Learned perceptual similarity (AlexNet LPIPS v0.1).

    Prefers the native JAX implementation with converted weights
    (``$WEIGHTS_PATH/lpips_alex.npz``, see
    :mod:`hive_tpu.models.lpips`); falls back to the torch ``lpips``
    package if installed; returns NaN with a warning when neither is
    available."""
    if _resolve_lpips() is False:
        return float("nan")

    if _lpips_model[0] == "jax":
        return _lpips_model[1](np.ascontiguousarray(image_a[..., :3]),
                               np.ascontiguousarray(image_b[..., :3]))

    model, torch = _lpips_model

    def prep(img):
        tensor = torch.from_numpy(np.ascontiguousarray(img)).permute(2, 0, 1).float()
        return (tensor / 127.5 - 1.0).unsqueeze(0)

    with torch.no_grad():
        return float(model(prep(image_a), prep(image_b)).item())


# ---------------------------------------------------------------------------
# Depth error metrics (ref scripts/experiments.py:392-408).
# ---------------------------------------------------------------------------

def depth_mae(pred: np.ndarray, target: np.ndarray,
              valid_mask: Optional[np.ndarray] = None) -> float:
    if valid_mask is None:
        valid_mask = target > 0

    return float(np.abs(pred[valid_mask] - target[valid_mask]).mean())


def depth_rmse(pred: np.ndarray, target: np.ndarray,
               valid_mask: Optional[np.ndarray] = None) -> float:
    if valid_mask is None:
        valid_mask = target > 0

    return float(np.sqrt(np.mean((pred[valid_mask] - target[valid_mask]) ** 2)))
