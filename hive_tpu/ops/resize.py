"""XLA-fused batched image resize + normalisation for model inputs.

The reference resized/normalised frames one at a time on the host with cv2 and
the DPT transform stack (hive/dataset_adaptors.py:1376-1392); here the whole
batch preprocesses inside the consuming model's jit so XLA fuses it with the
first convolution.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_batch(images: jnp.ndarray, size: Tuple[int, int],
                 method: str = "cubic") -> jnp.ndarray:
    """Resize a (B, H, W, C) batch to (B, h, w, C)."""
    b, _, _, c = images.shape
    h, w = size
    return jax.image.resize(images, (b, h, w, c), method=method)


def normalize(images: jnp.ndarray, mean: float = 0.5, std: float = 0.5) -> jnp.ndarray:
    """uint8/float RGB in [0, 255] → normalised float32."""
    images = images.astype(jnp.float32) / 255.0
    return (images - mean) / std


def prepare_model_input(frames_uint8: jnp.ndarray, size: Tuple[int, int],
                        mean: float = 0.5, std: float = 0.5,
                        method: str = "cubic") -> jnp.ndarray:
    """The standard preprocessing pipeline: normalise then resize (matches
    the DPT input transform semantics)."""
    return resize_batch(normalize(frames_uint8, mean, std), size, method=method)


def keep_aspect_multiple_of(source_hw: Tuple[int, int],
                            target_hw: Tuple[int, int] = (480, 640),
                            multiple: int = 32) -> Tuple[int, int]:
    """DPT's Resize(keep_aspect_ratio=True, resize_method='minimal',
    ensure_multiple_of=32) policy: of the two axis scales implied by the
    target, take the one CLOSEST to 1 ("scale as least as possible"),
    apply it to both axes, and round each side to a multiple. One side can
    end up past its target — that is the reference behaviour (a previous
    long-side-to-target rule under-resolved non-4:3 inputs by up to ~45%;
    review finding, r5)."""
    h, w = source_hw
    th, tw = target_hw
    scale_h, scale_w = th / h, tw / w
    scale = scale_w if abs(1.0 - scale_w) < abs(1.0 - scale_h) else scale_h

    def round_multiple(x):
        return max(multiple, int(round(x * scale / multiple)) * multiple)

    return round_multiple(h), round_multiple(w)