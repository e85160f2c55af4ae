"""Mask R-CNN (ResNet-50 FPN) person instance segmentation in Flax.

The reference uses Detectron2's Mask R-CNN for person masks
(hive/io.py:135-230, mask-ID contract: background 0, instances 1..N in score
order). This is a from-scratch JAX/Flax inference implementation of the same
architecture family, loading the released torchvision
``maskrcnn_resnet50_fpn`` COCO checkpoint via :func:`convert_torch_checkpoint`
(layout-validated against a synthetic checkpoint in
``tests/test_maskrcnn.py`` — the real file is not present in this
zero-egress image).

TPU-native design notes (vs the reference's dynamic-shape CUDA path):

* Everything runs under ONE jit with static shapes: fixed top-K proposal
  counts, masked (score = -inf) invalid slots, fixed detection/mask caps.
* RPN NMS is matrix "fast NMS" (upper-triangular IoU suppression, one shot);
  final detections use exact greedy NMS as a `lax.scan` over the fixed
  detection budget. No dynamic box lists anywhere.
* ROIAlign avoids per-sample-point gathers (serialized ~11 ns/element on
  this part — see CLAUDE.md): each ROI dynamic-slices a fixed 32x32 crop
  from its assigned FPN level (the FPN level-assignment rule bounds a box to
  <= ~18 px at its level for VGA-class inputs), then bilinear sampling is
  two SEPARABLE matmuls with closed-form hat-function weight matrices
  ``relu(1 - |p - iota|)`` — MXU work instead of gathers.
* The 2x2/stride-2 mask deconv is computed exactly as an einsum to 2x2
  output blocks (`flax.linen.ConvTranspose` does not match torch's kernel
  convention; the einsum form is unambiguous and MXU-friendly).
* FrozenBatchNorm is folded into per-channel scale/bias at conversion time.

Inputs are resized on device to a fixed 800-min-side canvas (matching the
calibration of the released weights, torchvision GeneralizedRCNNTransform)
and boxes/masks are mapped back to native resolution on the host.
"""

from __future__ import annotations

import logging
import math
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:  # torch only needed for checkpoint conversion
    import torch
except Exception:  # pragma: no cover
    torch = None

import flax.linen as nn
import jax
import jax.numpy as jnp

# COCO class index for "person" in the 91-class torchvision head.
PERSON_CLASS = 1

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

# Fixed pipeline budgets (static shapes).
PRE_NMS_TOP_N = 512      # RPN candidates per level
POST_NMS_TOP_N = 512     # proposals kept for the box head
DETECTIONS_TOP_N = 100   # final detections
MASK_TOP_N = 32          # detections that get masks
CROP = 48                # ROIAlign crop side at the assigned level.
# Sized against the canonical FPN level assignment (sqrt(area)/stride ~ 14):
# a box of aspect ratio r spans ~14*sqrt(r) feature px on its long side, so
# 48 covers up to ~11:1 boxes where the old 32 truncated past ~5:1 — an
# elongated detection (lying person) had its ROI features edge-replicated
# over the truncated extent (review finding, r5). Level clamping to P2..P5
# can still exceed this for extreme boxes; those clamp as before.

BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


# ---------------------------------------------------------------------------
# Backbone: ResNet-50 with folded (frozen) batch norm.
# ---------------------------------------------------------------------------

class FoldedBN(nn.Module):
    """Per-channel scale/bias (FrozenBatchNorm folded at conversion)."""
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class Bottleneck(nn.Module):
    features: int          # bottleneck width; output is 4x
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        out = FoldedBN(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False, name="conv2")(out)
        out = FoldedBN(self.features, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = FoldedBN(self.features * 4, name="bn3")(out)

        if self.downsample:
            x = nn.Conv(self.features * 4, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="downsample_conv")(x)
            x = FoldedBN(self.features * 4, name="downsample_bn")(x)

        return nn.relu(out + x)


class ResNet50(nn.Module):
    """Returns C2..C5 feature maps (strides 4, 8, 16, 32)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = FoldedBN(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        for stage, (blocks, features) in enumerate(
                [(3, 64), (4, 128), (6, 256), (3, 512)]):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                x = Bottleneck(features, stride=stride if i == 0 else 1,
                               downsample=(i == 0),
                               name=f"layer{stage + 1}_{i}")(x)
            feats.append(x)

        return feats  # [C2, C3, C4, C5]


class FPN(nn.Module):
    """Top-down feature pyramid: P2..P5 (+P6 via stride-2 max pool)."""

    @nn.compact
    def __call__(self, feats):
        laterals = [
            nn.Conv(256, (1, 1), name=f"inner{i}")(c)
            for i, c in enumerate(feats)
        ]

        outs = [None] * 4
        prev = laterals[3]
        outs[3] = prev
        for i in (2, 1, 0):
            h, w = laterals[i].shape[1:3]
            up = jax.image.resize(prev, prev.shape[:1] + (h, w, 256),
                                  method="nearest")
            prev = laterals[i] + up
            outs[i] = prev

        ps = [nn.Conv(256, (3, 3), padding=1, name=f"layer{i}")(o)
              for i, o in enumerate(outs)]
        p6 = nn.max_pool(ps[3], (1, 1), strides=(2, 2))
        return ps + [p6]  # [P2, P3, P4, P5, P6]


class RPNHead(nn.Module):
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(256, (3, 3), padding=1, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), name="cls_logits")
        bbox = nn.Conv(self.num_anchors * 4, (1, 1), name="bbox_pred")

        logits, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            deltas.append(bbox(t))
        return logits, deltas


class BoxHead(nn.Module):
    @nn.compact
    def __call__(self, x):  # (N, 7, 7, 256)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, name="fc6")(x))
        x = nn.relu(nn.Dense(1024, name="fc7")(x))
        scores = nn.Dense(91, name="cls_score")(x)
        deltas = nn.Dense(91 * 4, name="bbox_pred")(x)
        return scores, deltas


class BlockDeconv2x(nn.Module):
    """Exact torch ConvTranspose2d(k=2, s=2): einsum to 2x2 output blocks."""
    features: int

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (c_in, 2, 2, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("nhwc,cdeo->nhdweo", x, kernel)
        n, h, _, w, _, o = y.shape
        return y.reshape(n, h * 2, w * 2, o) + bias


class MaskHead(nn.Module):
    @nn.compact
    def __call__(self, x):  # (N, 14, 14, 256)
        for i in range(4):
            x = nn.relu(nn.Conv(256, (3, 3), padding=1,
                                name=f"mask_fcn{i + 1}")(x))
        x = nn.relu(BlockDeconv2x(256, name="conv5_mask")(x))
        return nn.Conv(91, (1, 1), name="mask_fcn_logits")(x)  # (N,28,28,91)


# ---------------------------------------------------------------------------
# Box utilities (all fixed-shape).
# ---------------------------------------------------------------------------

def decode_boxes(anchors, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    """Standard R-CNN box decoding. anchors/deltas: (..., 4) xyxy / txtytwth."""
    wx, wy, ww, wh = weights
    ax0, ay0, ax1, ay1 = [anchors[..., i] for i in range(4)]
    aw = ax1 - ax0
    ah = ay1 - ay0
    acx = ax0 + 0.5 * aw
    acy = ay0 + 0.5 * ah

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

    cx = dx * aw + acx
    cy = dy * ah + acy
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah

    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h],
                     axis=-1)


def box_iou_matrix(boxes_a, boxes_b):
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    area_a = jnp.maximum(boxes_a[:, 2] - boxes_a[:, 0], 0) * \
        jnp.maximum(boxes_a[:, 3] - boxes_a[:, 1], 0)
    area_b = jnp.maximum(boxes_b[:, 2] - boxes_b[:, 0], 0) * \
        jnp.maximum(boxes_b[:, 3] - boxes_b[:, 1], 0)

    x0 = jnp.maximum(boxes_a[:, None, 0], boxes_b[None, :, 0])
    y0 = jnp.maximum(boxes_a[:, None, 1], boxes_b[None, :, 1])
    x1 = jnp.minimum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    y1 = jnp.minimum(boxes_a[:, None, 3], boxes_b[None, :, 3])

    inter = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-9)


def fast_nms(boxes, scores, iou_threshold):
    """One-shot matrix NMS (YOLACT-style): a box is kept unless a
    higher-scoring box overlaps it above the threshold. Slightly more
    aggressive than greedy NMS (a suppressed box can still suppress others);
    used for RPN proposals where that is harmless."""
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    iou = box_iou_matrix(boxes_sorted, boxes_sorted)
    iou = jnp.triu(iou, k=1)  # only higher-scoring (earlier) rows suppress
    keep_sorted = jnp.max(iou, axis=0) <= iou_threshold
    # Map back to input order.
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    return keep


def greedy_nms_topk(boxes, scores, iou_threshold, k):
    """Exact greedy NMS returning the top-k kept (indices, validity)."""
    def step(carry, _):
        scores_left = carry
        i = jnp.argmax(scores_left)
        best = scores_left[i]
        suppress = box_iou_matrix(boxes[i][None], boxes)[0] > iou_threshold
        scores_left = jnp.where(suppress, -jnp.inf, scores_left)
        scores_left = scores_left.at[i].set(-jnp.inf)
        return scores_left, (i, best > -jnp.inf)

    _, (idx, valid) = jax.lax.scan(step, scores, None, length=k)
    return idx, valid


# ---------------------------------------------------------------------------
# ROIAlign via fixed crops + separable bilinear matmuls.
# ---------------------------------------------------------------------------

def _hat_weights(pos, size):
    """(N, S) sample positions -> (N, S, size) bilinear 2-tap weights."""
    iota = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - iota))


def roi_align(feature, boxes_level, out_size, crop=CROP):
    """ROIAlign one FPN level for all ROIs (masked selection happens later).

    :param feature: (H, W, 256) level feature, H/W >= crop.
    :param boxes_level: (N, 4) boxes in LEVEL coordinates (xyxy).
    :param out_size: output bins per side (7 or 14); samples 2x2 per bin.
    :return: (N, out_size, out_size, 256)
    """
    h, w = feature.shape[:2]
    n = boxes_level.shape[0]
    s = out_size * 2  # sampling grid side

    x0, y0, x1, y1 = [boxes_level[:, i] for i in range(4)]
    bw = jnp.maximum(x1 - x0, 1e-3)
    bh = jnp.maximum(y1 - y0, 1e-3)

    # Crop origin (integer), clamped so the crop stays inside the feature.
    cy = jnp.clip(jnp.floor(y0 - 1.0), 0, h - crop).astype(jnp.int32)
    cx = jnp.clip(jnp.floor(x0 - 1.0), 0, w - crop).astype(jnp.int32)

    crops = jax.vmap(
        lambda yy, xx: jax.lax.dynamic_slice(feature, (yy, xx, 0),
                                             (crop, crop, feature.shape[2]))
    )(cy, cx)  # (N, crop, crop, 256)

    # Sample-point positions relative to the crop. aligned=False convention
    # (NO half-pixel shift): torchvision's detection models run
    # MultiScaleRoIAlign with the roi_align default aligned=False, and the
    # released COCO weights are calibrated to it — the previous -0.5
    # (aligned=True) shifted every sample by half a feature pixel, up to 16
    # canvas px at P5 (review finding, r5). Positions clamp to the crop
    # interior — boxes longer than the crop at their level (aspect beyond
    # ~11:1 at CROP=48) replicate edge samples.
    steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    py = y0[:, None] + steps[None, :] * bh[:, None] - cy[:, None].astype(
        jnp.float32)
    px = x0[:, None] + steps[None, :] * bw[:, None] - cx[:, None].astype(
        jnp.float32)
    py = jnp.clip(py, 0.0, crop - 1.0)
    px = jnp.clip(px, 0.0, crop - 1.0)

    wy = _hat_weights(py, crop)  # (N, s, crop)
    wx = _hat_weights(px, crop)

    rows = jnp.einsum("nsr,nrwc->nswc", wy, crops)     # contract crop rows
    samples = jnp.einsum("nxw,nswc->nsxc", wx, rows)   # (N, s_y, s_x, 256)

    # 2x2 average pool -> (N, out, out, 256)
    n_, sy, sx, c = samples.shape
    samples = samples.reshape(n_, out_size, 2, out_size, 2, c)
    return samples.mean(axis=(2, 4))


# ---------------------------------------------------------------------------
# Anchors.
# ---------------------------------------------------------------------------

def make_anchors(level_shapes, strides=(4, 8, 16, 32, 64),
                 sizes=(32, 64, 128, 256, 512), ratios=(0.5, 1.0, 2.0)):
    """Per-level (H*W*A, 4) xyxy anchor arrays (torchvision convention)."""
    all_levels = []
    for (h, w), stride, size in zip(level_shapes, strides, sizes):
        ws = np.asarray([size * math.sqrt(1.0 / r) for r in ratios])
        hs = np.asarray([size * math.sqrt(r) for r in ratios])
        base = np.stack([-ws / 2, -hs / 2, ws / 2, hs / 2], axis=1)  # (A, 4)
        base = np.round(base)

        sx = (np.arange(w) * stride).astype(np.float32)
        sy = (np.arange(h) * stride).astype(np.float32)
        cx, cy = np.meshgrid(sx, sy)
        shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)

        anchors = (shifts + base[None]).reshape(-1, 4).astype(np.float32)
        all_levels.append(anchors)
    return all_levels


# ---------------------------------------------------------------------------
# Full model.
# ---------------------------------------------------------------------------

class MaskRCNN(nn.Module):
    """Inference graph: normalized image -> fixed-size detection arrays."""

    @nn.compact
    def __call__(self, image, image_hw):
        """
        :param image: (H, W, 3) normalized float32 (fixed canvas size).
        :param image_hw: (2,) valid region (scaled image extent in canvas).
        :return: dict with fixed-shape ``boxes`` (D, 4), ``scores`` (D,),
            ``valid`` (D,), ``masks`` (M, 28, 28) sigmoid person masks for
            the top M detections.
        """
        h, w = image.shape[:2]

        feats = ResNet50(name="body")(image[None])
        pyramid = FPN(name="fpn")(feats)
        logits, deltas = RPNHead(name="rpn_head")(pyramid)

        level_shapes = [tuple(p.shape[1:3]) for p in pyramid]
        anchors = [jnp.asarray(a) for a in
                   make_anchors(level_shapes)]

        img_w = image_hw[1].astype(jnp.float32)
        img_h = image_hw[0].astype(jnp.float32)

        # --- RPN proposals (fixed budget per level) ---
        prop_boxes, prop_scores = [], []
        for lvl in range(5):
            s = logits[lvl].reshape(-1)
            d = deltas[lvl].reshape(-1, 4)
            a = anchors[lvl]

            k = min(PRE_NMS_TOP_N, s.shape[0])
            top_s, top_i = jax.lax.top_k(s, k)
            boxes = decode_boxes(a[top_i], d[top_i])
            boxes = jnp.stack([jnp.clip(boxes[:, 0], 0, img_w),
                               jnp.clip(boxes[:, 1], 0, img_h),
                               jnp.clip(boxes[:, 2], 0, img_w),
                               jnp.clip(boxes[:, 3], 0, img_h)], axis=-1)

            wh_ok = ((boxes[:, 2] - boxes[:, 0] >= 1e-2)
                     & (boxes[:, 3] - boxes[:, 1] >= 1e-2))
            top_s = jnp.where(wh_ok, top_s, -jnp.inf)
            keep = fast_nms(boxes, top_s, 0.7)
            prop_boxes.append(boxes)
            prop_scores.append(jnp.where(keep, top_s, -jnp.inf))

        all_boxes = jnp.concatenate(prop_boxes)
        all_scores = jnp.concatenate(prop_scores)
        top_s, top_i = jax.lax.top_k(all_scores, POST_NMS_TOP_N)
        proposals = all_boxes[top_i]  # (P, 4)
        proposals_valid = top_s > -jnp.inf

        # --- Box head ---
        box_feats = self._pyramid_roi_align(pyramid, proposals, 7)
        cls_scores, box_deltas = BoxHead(name="box_head")(box_feats)
        probs = jax.nn.softmax(cls_scores, axis=-1)

        person_scores = probs[:, PERSON_CLASS]
        person_deltas = box_deltas.reshape(-1, 91, 4)[:, PERSON_CLASS]
        person_boxes = decode_boxes(proposals, person_deltas,
                                    weights=(10.0, 10.0, 5.0, 5.0))
        person_boxes = jnp.stack(
            [jnp.clip(person_boxes[:, 0], 0, img_w),
             jnp.clip(person_boxes[:, 1], 0, img_h),
             jnp.clip(person_boxes[:, 2], 0, img_w),
             jnp.clip(person_boxes[:, 3], 0, img_h)], axis=-1)

        person_scores = jnp.where(
            proposals_valid & (person_scores > 0.05)
            & (person_boxes[:, 2] - person_boxes[:, 0] >= 1e-2)
            & (person_boxes[:, 3] - person_boxes[:, 1] >= 1e-2),
            person_scores, -jnp.inf)

        det_idx, det_valid = greedy_nms_topk(person_boxes, person_scores,
                                             0.5, DETECTIONS_TOP_N)
        det_boxes = person_boxes[det_idx]
        det_scores = jnp.where(det_valid, person_scores[det_idx], 0.0)

        # --- Mask head on the top MASK_TOP_N detections ---
        mask_boxes = det_boxes[:MASK_TOP_N]
        mask_feats = self._pyramid_roi_align(pyramid, mask_boxes, 14)
        mask_logits = MaskHead(name="mask_head")(mask_feats)
        masks = jax.nn.sigmoid(mask_logits[..., PERSON_CLASS])  # (M, 28, 28)

        return {"boxes": det_boxes, "scores": det_scores,
                "valid": det_valid, "masks": masks}

    def _pyramid_roi_align(self, pyramid, boxes, out_size):
        """FPN level assignment + per-level ROIAlign, masked-select merge."""
        areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
            jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
        # torchvision LevelMapper: k = floor(4 + log2(sqrt(area)/224))
        lvl = jnp.floor(4.0 + jnp.log2(jnp.sqrt(areas) / 224.0 + 1e-9))
        lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2  # 0..3 over P2..P5

        out = None
        for i in range(4):
            stride = 2.0 ** (i + 2)
            feature = pyramid[i][0]
            # Pad small levels so 32x32 crops always fit.
            ph = max(0, CROP - feature.shape[0])
            pw = max(0, CROP - feature.shape[1])
            if ph or pw:
                feature = jnp.pad(feature, ((0, ph), (0, pw), (0, 0)))
            sampled = roi_align(feature, boxes / stride, out_size)
            out = sampled if out is None else \
                jnp.where((lvl == i)[:, None, None, None], sampled, out)
        return out


# ---------------------------------------------------------------------------
# Inference wrapper (canvas resize + host paste).
# ---------------------------------------------------------------------------

class MaskRCNNDetector:
    """Jitted per-image person detection at a fixed 800-min-side canvas."""

    def __init__(self, params, input_hw: Tuple[int, int] = (480, 640),
                 score_threshold: float = 0.5,
                 canvas_min_side: int = 800, canvas_max_side: int = 1344):
        self.model = MaskRCNN()
        self.params = params
        self.score_threshold = float(score_threshold)

        h, w = input_hw
        scale = min(canvas_min_side / min(h, w), canvas_max_side / max(h, w))
        self.scale = float(scale)
        self.scaled_hw = (int(round(h * scale)), int(round(w * scale)))
        # Pad to multiples of 64 so every FPN level divides cleanly.
        self.canvas_hw = (-(-self.scaled_hw[0] // 64) * 64,
                          -(-self.scaled_hw[1] // 64) * 64)
        self.input_hw = (h, w)

        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        sh, sw = self.scaled_hw
        ch, cw = self.canvas_hw

        @jax.jit
        def forward(params, frame_uint8):
            img = frame_uint8.astype(jnp.float32) / 255.0
            img = jax.image.resize(img, (sh, sw, 3), method="bilinear")
            img = (img - mean) / std
            img = jnp.pad(img, ((0, ch - sh), (0, cw - sw), (0, 0)))
            return self.model.apply({"params": params}, img,
                                    jnp.asarray([sh, sw]))

        self._forward = forward

    def detect(self, frame: np.ndarray) -> Dict[str, np.ndarray]:
        """(H, W, 3) uint8 RGB -> person boxes/scores/masks at input scale.

        Detections come out score-ordered (greedy NMS picks the running
        argmax); masks cover the first MASK_TOP_N detections, exposed as the
        aligned ``mask_boxes``/``masks`` pair.
        """
        out = jax.tree.map(np.asarray, self._forward(self.params,
                                                     jnp.asarray(frame)))
        keep = out["valid"] & (out["scores"] >= self.score_threshold)
        keep_m = keep[:MASK_TOP_N]
        return {"boxes": out["boxes"][keep] / self.scale,
                "scores": out["scores"][keep],
                "mask_boxes": out["boxes"][:MASK_TOP_N][keep_m] / self.scale,
                "masks": out["masks"][keep_m]}

    def instance_mask(self, frame: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (H, W) uint8 ids (0 bg, 1..N by score)."""
        import cv2

        det = self.detect(frame)
        h, w = self.input_hw
        instance = np.zeros((h, w), dtype=np.uint8)

        next_id = 1
        for i in range(len(det["masks"])):  # score-ordered
            x0, y0, x1, y1 = det["mask_boxes"][i]
            x0i, y0i = max(int(np.floor(x0)), 0), max(int(np.floor(y0)), 0)
            x1i, y1i = min(int(np.ceil(x1)), w), min(int(np.ceil(y1)), h)
            if x1i <= x0i or y1i <= y0i:
                continue

            m = cv2.resize(det["masks"][i].astype(np.float32),
                           (x1i - x0i, y1i - y0i),
                           interpolation=cv2.INTER_LINEAR) > 0.5
            region = instance[y0i:y1i, x0i:x1i]
            region[m & (region == 0)] = next_id
            next_id += 1
            if next_id > 255:
                break

        return instance


# ---------------------------------------------------------------------------
# torchvision checkpoint conversion.
# ---------------------------------------------------------------------------

def _fold_bn(sd, prefix, eps=1e-5):
    gamma = sd[f"{prefix}.weight"].numpy()
    beta = sd[f"{prefix}.bias"].numpy()
    mean = sd[f"{prefix}.running_mean"].numpy()
    var = sd[f"{prefix}.running_var"].numpy()
    scale = gamma / np.sqrt(var + eps)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def _first(sd, *names):
    for name in names:
        if name in sd:
            return name
    raise KeyError(f"none of {names} in checkpoint")


def convert_torch_checkpoint(torch_checkpoint_path: str, output_path: str):
    """Convert a torchvision ``maskrcnn_resnet50_fpn`` state dict to the
    flat ``.npz`` layout of :class:`MaskRCNN` (keys ``a/b/c``; conv kernels
    HWIO, dense kernels (in, out), FrozenBatchNorm folded to scale/bias,
    fc6 input columns re-ordered CHW -> HWC, deconv kernel (C, 2, 2, O)).

    Handles both the classic layouts (``rpn.head.conv.weight``,
    ``mask_head.mask_fcn1.weight``) and the Conv2dNormActivation layouts of
    newer torchvision (``rpn.head.conv.0.0.weight``, ``mask_head.0.0.*``).
    """
    if torch is None:  # pragma: no cover
        raise RuntimeError("torch is required for checkpoint conversion")

    from hive_tpu.models.convert_utils import TrackedState, WriteOnceDict

    sd = torch.load(torch_checkpoint_path, map_location="cpu",
                    weights_only=False)
    if not isinstance(sd, dict) or "backbone.body.conv1.weight" not in sd:
        sd = sd.get("model", sd.get("state_dict", sd))

    sd = TrackedState(dict(sd), name="Mask R-CNN checkpoint")
    out: Dict[str, np.ndarray] = WriteOnceDict()

    def conv(src, dst, bias=True):
        w = sd[src].numpy()
        out[f"{dst}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        if bias:
            out[f"{dst}/bias"] = sd[src.replace("weight", "bias")].numpy()

    def bn(src, dst):
        scale, bias = _fold_bn(sd, src)
        out[f"{dst}/scale"] = scale
        out[f"{dst}/bias"] = bias

    def dense(src, dst):
        out[f"{dst}/kernel"] = sd[f"{src}.weight"].numpy().T
        out[f"{dst}/bias"] = sd[f"{src}.bias"].numpy()

    # Backbone.
    conv("backbone.body.conv1.weight", "body/conv1", bias=False)
    bn("backbone.body.bn1", "body/bn1")

    for stage, blocks in enumerate([3, 4, 6, 3]):
        for i in range(blocks):
            src = f"backbone.body.layer{stage + 1}.{i}"
            dst = f"body/layer{stage + 1}_{i}"
            for c in (1, 2, 3):
                conv(f"{src}.conv{c}.weight", f"{dst}/conv{c}", bias=False)
                bn(f"{src}.bn{c}", f"{dst}/bn{c}")
            if i == 0:
                conv(f"{src}.downsample.0.weight", f"{dst}/downsample_conv",
                     bias=False)
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")

    # FPN.
    for i in range(4):
        conv(_first(sd, f"backbone.fpn.inner_blocks.{i}.weight",
                    f"backbone.fpn.inner_blocks.{i}.0.weight"),
             f"fpn/inner{i}")
        conv(_first(sd, f"backbone.fpn.layer_blocks.{i}.weight",
                    f"backbone.fpn.layer_blocks.{i}.0.weight"),
             f"fpn/layer{i}")

    # RPN head.
    conv(_first(sd, "rpn.head.conv.weight", "rpn.head.conv.0.0.weight"),
         "rpn_head/conv")
    conv("rpn.head.cls_logits.weight", "rpn_head/cls_logits")
    conv("rpn.head.bbox_pred.weight", "rpn_head/bbox_pred")

    # Box head: re-order fc6 input columns from torch's (C, 7, 7) flatten to
    # our (7, 7, C) flatten.
    w6 = sd["roi_heads.box_head.fc6.weight"].numpy()  # (1024, 256*7*7)
    w6 = w6.reshape(1024, 256, 7, 7).transpose(2, 3, 1, 0).reshape(-1, 1024)
    out["box_head/fc6/kernel"] = w6
    out["box_head/fc6/bias"] = sd["roi_heads.box_head.fc6.bias"].numpy()
    dense("roi_heads.box_head.fc7", "box_head/fc7")
    dense("roi_heads.box_predictor.cls_score", "box_head/cls_score")
    dense("roi_heads.box_predictor.bbox_pred", "box_head/bbox_pred")

    # Mask head.
    for i in range(4):
        conv(_first(sd, f"roi_heads.mask_head.mask_fcn{i + 1}.weight",
                    f"roi_heads.mask_head.{i}.0.weight"),
             f"mask_head/mask_fcn{i + 1}")
    # Deconv: torch (in, out, kh, kw) -> (in, kh, kw, out).
    w = sd["roi_heads.mask_predictor.conv5_mask.weight"].numpy()
    out["mask_head/conv5_mask/kernel"] = np.transpose(w, (0, 2, 3, 1))
    out["mask_head/conv5_mask/bias"] = \
        sd["roi_heads.mask_predictor.conv5_mask.bias"].numpy()
    conv("roi_heads.mask_predictor.mask_fcn_logits.weight",
         "mask_head/mask_fcn_logits")

    # Every checkpoint tensor consumed exactly once (BN trip counters and
    # the RPN/ROI buffers carry no learned state).
    sd.assert_fully_consumed(ignore=(r"num_batches_tracked$",))

    np.savez(output_path, **dict(out))
    return dict(out)


def load_params(npz_path: str):
    """Load a converted ``.npz`` into the nested Flax params tree."""
    from hive_tpu.models.convert_utils import unflatten_params

    return unflatten_params(np.load(npz_path, allow_pickle=True),
                            leaf=jnp.asarray)
