"""Person instance segmentation.

The reference used Detectron2's Mask R-CNN (hive/io.py:163-230) to produce
per-frame instance masks with the contract: background = 0, person instances =
1..N. This module provides the same contract through three backends, picked
by available weights:

* **Mask R-CNN (Flax)** — the architecture-parity backend
  (:mod:`hive_tpu.models.maskrcnn`): ResNet-50 FPN + RPN + box/mask heads,
  loading the released torchvision ``maskrcnn_resnet50_fpn`` COCO checkpoint
  converted to ``$WEIGHTS_PATH/maskrcnn_coco.npz``. Per-instance masks with
  scores, ids assigned in score order like Detectron2's output.
* **U-Net person segmenter (Flax)** — a compact encoder-decoder that runs
  batched on TPU (``$WEIGHTS_PATH/person_unet.npz``). Instances are separated
  from the semantic mask with connected components.
* **Motion fallback (cv2)** — MOG2 background subtraction over the frame
  sequence + morphological cleanup + connected components. The functional role
  of the masks in this pipeline is "dynamic objects to exclude from the static
  background / mesh per frame" (SURVEY.md §1), which motion segmentation
  captures directly without any model weights. Used automatically when no
  weights are available, so the pipeline stays functional end-to-end.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import List, Optional

import cv2
import numpy as np


# ---------------------------------------------------------------------------
# Flax U-Net backbone.
# ---------------------------------------------------------------------------

def build_unet():
    """A small U-Net (4 down / 4 up) emitting a 1-channel person logit map."""
    import flax.linen as nn
    import jax.numpy as jnp

    class ConvBlock(nn.Module):
        features: int

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=8)(x)
            x = nn.relu(x)
            x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
            x = nn.GroupNorm(num_groups=8)(x)
            return nn.relu(x)

    class UNet(nn.Module):
        base_features: int = 32

        @nn.compact
        def __call__(self, x):
            f = self.base_features
            skips = []

            for level in range(4):
                x = ConvBlock(f << level)(x)
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

            x = ConvBlock(f << 4)(x)

            for level in reversed(range(4)):
                x = nn.ConvTranspose(f << level, (2, 2), strides=(2, 2))(x)
                x = jnp.concatenate([x, skips[level]], axis=-1)
                x = ConvBlock(f << level)(x)

            return nn.Conv(1, (1, 1))(x)  # person logits

    return UNet()


class _UNetBackend:
    """Batched TPU inference for the U-Net person segmenter."""

    INPUT_MULTIPLE = 16  # four 2x poolings

    def __init__(self, weights_path: str):
        import jax
        import jax.numpy as jnp

        self.model = build_unet()

        data = np.load(weights_path, allow_pickle=True)
        self.params = _unflatten_params({k: data[k] for k in data.files})

        @partial(jax.jit)
        def forward(params, images):
            logits = self.model.apply({"params": params}, images)
            return jax.nn.sigmoid(logits[..., 0])

        self._forward = forward
        self._jnp = jnp

    def person_probabilities(self, batch: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 RGB → (B, H, W) person probability in [0, 1]."""
        b, h, w = batch.shape[:3]
        pad_h = -h % self.INPUT_MULTIPLE
        pad_w = -w % self.INPUT_MULTIPLE

        images = batch.astype(np.float32) / 255.0
        images = np.pad(images, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        probs = np.asarray(self._forward(self.params, self._jnp.asarray(images)))
        return probs[:, :h, :w]


def _unflatten_params(flat: dict) -> dict:
    """'a/b/c' → nested dict (delegates to the shared converter helper)."""
    from hive_tpu.models.convert_utils import unflatten_params

    return unflatten_params(flat)


class _MaskRCNNBackend:
    """Per-frame instance masks from the Flax Mask R-CNN.

    Detectors jit to a fixed input size; one is built lazily per frame shape
    (the pipeline processes a sequence at one resolution, so this compiles
    once).
    """

    def __init__(self, weights_path: str, score_threshold: float = 0.5):
        from hive_tpu.models.maskrcnn import load_params

        self.params = load_params(weights_path)
        self.score_threshold = score_threshold
        self._detectors = {}

    def _detector(self, input_hw):
        det = self._detectors.get(input_hw)
        if det is None:
            from hive_tpu.models.maskrcnn import MaskRCNNDetector

            det = self._detectors[input_hw] = MaskRCNNDetector(
                self.params, input_hw=input_hw,
                score_threshold=self.score_threshold)
        return det

    def segment_instances(self, rgb: np.ndarray) -> np.ndarray:
        return self._detector(rgb.shape[:2]).instance_mask(rgb)


# ---------------------------------------------------------------------------
# Classical fallback: motion segmentation (MOG2 background subtraction).
# ---------------------------------------------------------------------------

class _MotionBackend:
    """Dynamic-object masks from background subtraction (no weights needed).

    Stateful: frames must arrive in video order. The background model warms up
    on the first frames, so the driver runs a priming pass over the first
    batch before emitting masks.
    """

    def __init__(self, min_area_fraction: float = 0.001):
        self.subtractor = cv2.createBackgroundSubtractorMOG2(history=200,
                                                             varThreshold=32,
                                                             detectShadows=True)
        self.min_area_fraction = min_area_fraction
        self._primed = False

    def prime(self, frames: np.ndarray):
        """Warm up the background model (first batch, replayed in reverse so
        frame 0 still gets a usable mask)."""
        for frame in frames[::-1]:
            self.subtractor.apply(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
                                  learningRate=-1)

        self._primed = True

    def segment_instances(self, rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) RGB → (H, W) uint8 instance ids (0 = background)."""
        fg = self.subtractor.apply(cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        fg = (fg >= 200).astype(np.uint8)  # drop MOG2's shadow label (127)

        kernel = np.ones((5, 5), np.uint8)
        fg = cv2.morphologyEx(fg, cv2.MORPH_OPEN, kernel)
        fg = cv2.morphologyEx(fg, cv2.MORPH_CLOSE, kernel, iterations=3)

        num_labels, labels = cv2.connectedComponents(fg, connectivity=8)

        instance_mask = np.zeros(fg.shape, dtype=np.uint8)
        next_id = 1

        for label in range(1, num_labels):
            component = labels == label

            if component.sum() < self.min_area_fraction * fg.size:
                continue

            if next_id > 255:
                # uint8 mask: a 256th component would overflow (numpy>=2
                # raises) — 255 instances already far exceeds any real
                # scene; drop the remainder (review finding, r5).
                break
            instance_mask[component] = next_id
            next_id += 1

        return instance_mask


# ---------------------------------------------------------------------------
# Public API.
# ---------------------------------------------------------------------------

class PersonSegmenter:
    """Produces per-frame instance masks (0 = background, 1..N = people)."""

    def __init__(self, weights_path: Optional[str] = None, probability_threshold: float = 0.5):
        self.probability_threshold = probability_threshold

        weights_dir = os.environ.get("WEIGHTS_PATH", "weights")
        # An explicitly passed weights_path is a request for the U-Net
        # backend: it must not be silently overridden by an ambient Mask
        # R-CNN checkpoint.
        explicit_unet = weights_path is not None
        if weights_path is None:
            weights_path = os.path.join(weights_dir, "person_unet.npz")

        self._maskrcnn: Optional[_MaskRCNNBackend] = None
        self._unet: Optional[_UNetBackend] = None

        maskrcnn_path = os.path.join(weights_dir, "maskrcnn_coco.npz")
        if not explicit_unet and os.path.isfile(maskrcnn_path):
            try:
                self._maskrcnn = _MaskRCNNBackend(maskrcnn_path)
                logging.info(f"Person segmentation: Mask R-CNN backend "
                             f"({maskrcnn_path}).")
            except Exception as exc:  # pragma: no cover - depends on weights
                logging.warning(f"Could not load Mask R-CNN weights ({exc}); "
                                f"trying the U-Net backend.")

        if self._maskrcnn is None and os.path.isfile(weights_path):
            try:
                self._unet = _UNetBackend(weights_path)
                logging.info(f"Person segmentation: U-Net backend ({weights_path}).")
            except Exception as exc:  # pragma: no cover - depends on weight files
                logging.warning(f"Could not load U-Net weights ({exc}); "
                                f"falling back to motion masks.")
        elif explicit_unet and not os.path.isfile(weights_path):
            # An EXPLICIT request for a missing file must be loud — the
            # generic 'no model weights found' info line hid a typo'd path
            # while every downstream mask silently became motion-based
            # (review finding, r5).
            logging.warning(f"Requested U-Net weights not found at "
                            f"{weights_path}; falling back to motion masks.")

        if self._maskrcnn is None and self._unet is None:
            logging.info("Person segmentation: motion (MOG2) fallback backend "
                         "(no model weights found).")

        self._classical = _MotionBackend()

    def predict_batch(self, batch: np.ndarray) -> List[np.ndarray]:
        """(B, H, W, 3) RGB → list of (H, W) uint8 instance-id masks.

        With the motion backend, batches must arrive in video order.
        """
        if self._maskrcnn is not None:
            return [self._maskrcnn.segment_instances(frame) for frame in batch]

        if self._unet is not None:
            probabilities = self._unet.person_probabilities(batch)
            return [self._instances_from_probability(p) for p in probabilities]

        if not self._classical._primed:
            self._classical.prime(batch)

        return [self._classical.segment_instances(frame) for frame in batch]

    def _instances_from_probability(self, probability: np.ndarray) -> np.ndarray:
        """Semantic person probability → instance ids via connected components."""
        binary = (probability > self.probability_threshold).astype(np.uint8)

        num_labels, labels = cv2.connectedComponents(binary, connectivity=8)

        instance_mask = np.zeros_like(binary, dtype=np.uint8)
        next_id = 1

        for label in range(1, num_labels):
            component = labels == label

            # Suppress speckles below 0.1% of the frame.
            if component.sum() < 0.001 * binary.size:
                continue

            if next_id > 255:  # uint8 cap — see _instances_from_components
                break
            instance_mask[component] = next_id
            next_id += 1

        return instance_mask
