"""DPT-Hybrid monocular depth estimation in Flax.

TPU-native replacement for the reference's torch DPT
(third_party/dpt, driven per-frame at hive/dataset_adaptors.py:1346-1435).
Architecture: "Vision Transformers for Dense Prediction" (Ranftl et al. 2021),
hybrid variant — a ResNetV2 (R50, weight-standardised convs + GroupNorm) stem
feeding a ViT-B/16 encoder, with reassemble + RefineNet-style fusion decoding.

Design differences from the reference:

* **batched**: whole frame batches run through one jit call (the reference
  looped frame-by-frame, dataset_adaptors.py:1406);
* **bfloat16 activations** on the MXU (params stay fp32);
* preprocessing (resize + normalise) is fused into the jitted forward;
* weights load from ``$WEIGHTS_PATH/dpt_hybrid_nyu.npz``; a converter from the
  released torch checkpoint is provided (:func:`convert_torch_checkpoint`).
  Without weights the model runs randomly initialised (architecture and
  pipeline stay exercisable end-to-end).

Output contract matches the reference NYU head: metric depth in meters via
``depth = 1 / (scale * head_output + shift)`` with scale=0.000305,
shift=0.1378 (dataset_adaptors.py:1366-1374).
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

# NYU head calibration (ref dataset_adaptors.py:1368-1369).
NYU_SCALE = 0.000305
NYU_SHIFT = 0.1378


# ---------------------------------------------------------------------------
# ResNetV2 stem (weight-standardised convs + GroupNorm), R50 layout (3, 4, 9).
# ---------------------------------------------------------------------------

class StdConv(nn.Module):
    """Conv2D with weight standardisation (as in BiT/ResNetV2)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.features), jnp.float32)

        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)
        kernel = (kernel - mean) / jnp.sqrt(var + 1e-8)

        # timm "same" padding (StdConv2dSame): for inputs divisible by the
        # stride the total pad is k - s, split low-first — (2, 3) for the
        # 7x7/2 stem, (0, 1) for 3x3/2 — matching the released checkpoint's
        # spatial alignment. Stride-1 reduces to the symmetric (k-1)//2.
        def same_pad(k, s):
            total = max(k - s, 0) if s > 1 else k - 1
            return (total // 2, total - total // 2)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=[same_pad(k, s) for k, s in zip(self.kernel_size,
                                                    self.strides)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)

        return y


class Bottleneck(nn.Module):
    """POST-activation bottleneck (ResNet V1.5-style with GN + weight
    standardisation) — the block the released ``dpt_hybrid_nyu.pt`` actually
    stores: timm's ``vit_base_resnet50_384`` builds its hybrid backbone with
    ``ResNetV2(..., preact=False)`` ("Non Pre-activation bottleneck ...
    Used for ViT Hybrid", mirrored by HF transformers'
    ``BitBottleneckLayer``). Each conv is followed by its own norm (sized
    to that conv's OUTPUT width), the projection shortcut carries a norm,
    and the residual add is followed by ReLU. The previous pre-activation
    block here could not represent the real checkpoint at all (norm widths
    differ and ``downsample.norm`` had no slot) — review finding, r5.
    """

    features: int  # bottleneck (inner) width; output is 4x
    strides: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_features = self.features * 4
        needs_projection = (x.shape[-1] != out_features or self.strides != (1, 1))

        shortcut = x
        if needs_projection:
            shortcut = StdConv(out_features, (1, 1), strides=self.strides,
                               dtype=self.dtype, name="conv_proj")(x)
            shortcut = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn_proj")(shortcut)

        y = StdConv(self.features, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn1")(y)
        y = nn.relu(y)
        y = StdConv(self.features, (3, 3), strides=self.strides,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn2")(y)
        y = nn.relu(y)
        y = StdConv(out_features, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn3")(y)

        return nn.relu(y + shortcut)


class ResNetV2Stem(nn.Module):
    """The R50 hybrid stem: root + 3 stages; returns (/4, /8, /16) features."""

    block_sizes: Sequence[int] = (3, 4, 9)
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = StdConv(self.width, (7, 7), strides=(2, 2), dtype=self.dtype,
                    name="conv_root")(x)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn_root")(y)
        y = nn.relu(y)
        # timm 'same' maxpool (3x3/2 on an even dim pads (0, 1)) — a
        # symmetric (1, 1) pad shifts every downstream feature by a pixel
        # relative to the released checkpoint's alignment.
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))

        features = []

        for stage, num_blocks in enumerate(self.block_sizes):
            stage_width = self.width * (2 ** stage)

            for block in range(num_blocks):
                strides = (2, 2) if stage > 0 and block == 0 else (1, 1)
                y = Bottleneck(stage_width, strides=strides, dtype=self.dtype,
                               name=f"stage{stage + 1}_block{block + 1}")(y)

            features.append(y)

        return features  # [(B,/4,256), (B,/8,512), (B,/16,1024)]


# ---------------------------------------------------------------------------
# ViT encoder.
# ---------------------------------------------------------------------------

class TransformerBlock(nn.Module):
    dim: int = 768
    num_heads: int = 12
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, dtype=self.dtype,
            name="attn")(y, y)
        x = x + y

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(y)
        # Exact (erf) GELU: torch nn.GELU defaults to erf, flax nn.gelu to
        # the tanh approximation — the gap compounds over 12 blocks with
        # real weights (review finding, r5).
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)

        return x + y


class HybridViT(nn.Module):
    """ResNetV2 stem + ViT-B encoder; exposes the four DPT hook features."""

    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    grid_size: Tuple[int, int] = (24, 24)  # pos-embed grid at 384x384 training res
    hooks: Tuple[int, int] = (8, 11)  # transformer blocks to tap (0-indexed)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        stem_features = ResNetV2Stem(dtype=self.dtype, name="resnet")(x)
        layer1, layer2, stem_out = stem_features

        b, h16, w16, _ = stem_out.shape

        tokens = nn.Conv(self.dim, (1, 1), name="patch_embed")(stem_out)
        tokens = tokens.reshape(b, h16 * w16, self.dim)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim),
                               jnp.float32)
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.grid_size[0] * self.grid_size[1] + 1, self.dim), jnp.float32)

        # Interpolate the grid part of the position embedding to the actual
        # token grid (other input resolutions than the 384x384 training size).
        cls_pos = pos_embed[:, :1]
        grid_pos = pos_embed[:, 1:].reshape(1, *self.grid_size, self.dim)
        grid_pos = jax.image.resize(grid_pos, (1, h16, w16, self.dim), method="bilinear")
        grid_pos = grid_pos.reshape(1, h16 * w16, self.dim)

        tokens = tokens + grid_pos.astype(tokens.dtype)
        cls = jnp.broadcast_to(cls_token + cls_pos, (b, 1, self.dim)).astype(tokens.dtype)
        tokens = jnp.concatenate([cls, tokens], axis=1)

        hook_outputs = []

        for i in range(self.depth):
            tokens = TransformerBlock(self.dim, self.num_heads, dtype=self.dtype,
                                      name=f"block{i}")(tokens)
            if i in self.hooks:
                hook_outputs.append(tokens)

        return layer1, layer2, hook_outputs[0], hook_outputs[1], (h16, w16)


# ---------------------------------------------------------------------------
# DPT decoder: reassemble + fusion.
# ---------------------------------------------------------------------------

def _upsample2x_align_corners(x):
    """Bilinear x2 upsample with align_corners=True — the original DPT's
    (and HF's) fusion/head interpolation convention: output i samples input
    i*(in-1)/(out-1). jax.image.resize's "bilinear" is half-pixel
    (align_corners=False), a systematic decoder divergence from the
    released weights' calibration (round-5 oracle finding). Separable, with
    static per-axis weights.
    """
    def axis_resize(arr, axis):
        in_n = arr.shape[axis]
        out_n = 2 * in_n
        pos = jnp.arange(out_n, dtype=jnp.float32) * (in_n - 1) / (out_n - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_n - 1)
        frac = (pos - lo).astype(arr.dtype)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_n
        frac = frac.reshape(shape)
        return a * (1 - frac) + b * frac

    return axis_resize(axis_resize(x, 1), 2)


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype, name="rcu1")(skip)

        x = ResidualConvUnit(self.features, dtype=self.dtype, name="rcu2")(x)

        x = _upsample2x_align_corners(x)

        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DPTHybrid(nn.Module):
    """The full DPT-Hybrid depth network (NYU metric-depth head)."""

    features: int = 256
    readout_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        layer1, layer2, tokens3, tokens4, (h16, w16) = HybridViT(
            dtype=self.dtype, name="encoder")(x)

        def tokens_to_spatial(tokens, name):
            # Readout: project the cls token into every patch token
            # ("project" readout mode of DPT).
            cls, patches = tokens[:, :1], tokens[:, 1:]
            merged = jnp.concatenate(
                [patches, jnp.broadcast_to(cls, patches.shape)], axis=-1)
            projected = nn.Dense(self.readout_dim, dtype=self.dtype,
                                 name=f"{name}_readout")(merged)
            projected = nn.gelu(projected, approximate=False)  # torch erf GELU
            return projected.reshape(-1, h16, w16, self.readout_dim)

        r3 = tokens_to_spatial(tokens3, "reassemble3")
        r4 = tokens_to_spatial(tokens4, "reassemble4")

        # The learned 1x1 projections the released checkpoint carries at
        # act_postprocess{3,4}.3 (between the readout and the scratch /
        # downsample convs) — previously missing entirely, so the real
        # weights had no slot (review finding, r5).
        r3 = nn.Conv(self.readout_dim, (1, 1), dtype=self.dtype,
                     name="reassemble3_project")(r3)
        r4 = nn.Conv(self.readout_dim, (1, 1), dtype=self.dtype,
                     name="reassemble4_project")(r4)

        # Scale adjustments: layer3 stays /16, layer4 downsamples to /32.
        # Explicit (1, 1) padding: the checkpoint's act_postprocess4.4 is a
        # plain torch Conv2d(stride=2, padding=1), whose sampling grid
        # starts at -1 — XLA "SAME" on an even input pads (0, 1) instead,
        # computing a shifted (different) function.
        r4 = nn.Conv(self.readout_dim, (3, 3), strides=(2, 2),
                     padding=((1, 1), (1, 1)),
                     dtype=self.dtype, name="reassemble4_downsample")(r4)

        # Project every tapped feature map to the fusion width.
        s1 = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                     dtype=self.dtype, name="scratch_rn1")(layer1)
        s2 = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                     dtype=self.dtype, name="scratch_rn2")(layer2)
        s3 = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                     dtype=self.dtype, name="scratch_rn3")(r3)
        s4 = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                     dtype=self.dtype, name="scratch_rn4")(r4)

        # RefineNet-style top-down fusion: /32 → /16 → /8 → /4 → /2.
        path4 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="fusion4")(s4)
        path3 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="fusion3")(path4, s3)
        path2 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="fusion2")(path3, s2)
        path1 = FeatureFusionBlock(self.features, dtype=self.dtype,
                                   name="fusion1")(path2, s1)

        # Monocular depth head.
        y = nn.Conv(self.features // 2, (3, 3), padding="SAME", dtype=self.dtype,
                    name="head_conv1")(path1)
        y = _upsample2x_align_corners(y)
        y = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="head_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(y)
        y = nn.relu(y)  # non-negative inverse-depth logits

        return y[..., 0].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Inference wrapper.
# ---------------------------------------------------------------------------

# ImageNet-style normalisation used by DPT (mean/std 0.5).
_NORM_MEAN = 0.5
_NORM_STD = 0.5


# Sentinel: "use the process-wide runtime mesh" (distinct from an explicit
# mesh=None, which forces single-device inference).
_RUNTIME_MESH = object()


class DPTDepthEstimator:
    """Batched DPT depth inference with fused preprocessing.

    Input frames may be any resolution; they are resized (aspect preserved,
    multiple of 32 — the reference's 'minimal' resize policy,
    dataset_adaptors.py:1380-1388) inside the jitted graph, and predictions
    are resized back to the source resolution with nearest-neighbour
    interpolation (matching ref :1421-1430).
    """

    def __init__(self, weights_filename: str = "dpt_hybrid_nyu.npz",
                 net_size: Tuple[int, int] = (480, 640),
                 scale: float = NYU_SCALE, shift: float = NYU_SHIFT,
                 dtype=jnp.bfloat16, mesh=_RUNTIME_MESH):
        self.net_height, self.net_width = net_size
        self.scale = scale
        self.shift = shift

        self.model = DPTHybrid(dtype=dtype)
        self.params = self._load_or_init_params(weights_filename)

        # Multi-device runtime: shard inference batches over the frame axis
        # (frames are independent; parameters replicate). The DEFAULT picks
        # up the pipeline's --num_devices mesh; pass mesh=None to force
        # single-device inference even when a runtime mesh is configured
        # (None used to mean "use the runtime mesh", so callers could not
        # opt out — review finding, r5).
        if mesh is _RUNTIME_MESH:
            from hive_tpu.parallel.runtime import runtime_mesh

            mesh = runtime_mesh()
        self.mesh = mesh

        if self.mesh is not None:
            from hive_tpu.parallel.mesh import replicate

            self.params = jax.tree.map(
                lambda a: replicate(self.mesh, jnp.asarray(a)), self.params)

        @jax.jit
        def forward(params, frames_uint8):
            from hive_tpu.ops.resize import prepare_model_input

            images = prepare_model_input(frames_uint8,
                                         (self.net_height, self.net_width),
                                         mean=_NORM_MEAN, std=_NORM_STD)

            inverse_depth = self.model.apply({"params": params}, images)

            # Metric depth: 1 / (scale * x + shift), guarded against zero.
            denom = scale * inverse_depth + shift
            return 1.0 / jnp.maximum(denom, 1e-6)

        self._forward = forward

    def _load_or_init_params(self, weights_filename: str):
        weights_dir = os.environ.get("WEIGHTS_PATH", "weights")
        weights_path = os.path.join(weights_dir, weights_filename)

        if os.path.isfile(weights_path):
            logging.info(f"Loading DPT weights from {weights_path}")
            from hive_tpu.models.convert_utils import unflatten_params

            self.weights_loaded = True
            return unflatten_params(
                np.load(weights_path, allow_pickle=True),
                leaf=jnp.asarray)

        logging.warning(f"DPT weights not found at {weights_path}; "
                        f"using random initialisation (depth will be uncalibrated). "
                        f"Convert the released checkpoint with "
                        f"hive_tpu.models.dpt.convert_torch_checkpoint.")

        self.weights_loaded = False
        from hive_tpu.models.initialisation import fast_random_params

        dummy = jnp.zeros((1, self.net_height, self.net_width, 3), dtype=jnp.float32)
        return fast_random_params(self.model, dummy)

    def predict_batch(self, frames: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) uint8 RGB → (B, H, W) float32 metric depth (meters)."""
        source_shape = frames.shape[1:3]

        if self.mesh is not None:
            from hive_tpu.parallel.mesh import pad_to_multiple, shard_batch

            n = int(self.mesh.devices.size)
            batch = frames.shape[0]
            # Edge-pad (repeat the last frame) so padding rows run the same
            # compute without affecting the real outputs.
            padded = pad_to_multiple(np.asarray(frames), n, axis=0)
            if padded.shape[0] > batch:
                padded[batch:] = padded[batch - 1]

            device_frames = shard_batch(self.mesh, jnp.asarray(padded))
            depth = np.asarray(self._forward(self.params, device_frames))[:batch]
        else:
            depth = np.asarray(self._forward(self.params, jnp.asarray(frames)))

        if depth.shape[1:3] != source_shape:
            resized = [
                np.asarray(jax.image.resize(jnp.asarray(d), source_shape, method="nearest"))
                for d in depth
            ]
            depth = np.stack(resized)

        return depth


# ---------------------------------------------------------------------------
# Weight conversion (torch DPT checkpoint → our .npz).
# ---------------------------------------------------------------------------

def convert_torch_checkpoint(torch_checkpoint_path: str, output_path: str,
                             net_size: Tuple[int, int] = (480, 640)):
    """Convert the released `dpt_hybrid_nyu.pt` torch checkpoint to our layout.

    Maps the timm hybrid-ViT + DPT-scratch parameter names onto the Flax module
    tree defined above (conv kernels transpose OIHW→HWIO; linear weights
    transpose). Requires torch (CPU) to deserialise the checkpoint.
    """
    import torch

    from hive_tpu.models.convert_utils import (TrackedState, WriteOnceDict,
                                               iter_flat_numpy)

    state = torch.load(torch_checkpoint_path, map_location="cpu")
    if "state_dict" in state:
        state = state["state_dict"]

    state = TrackedState(iter_flat_numpy(state), name="DPT checkpoint")

    # Flat 'a/b/c' output keys in the shared write-once armour (the other
    # three converters use the same; a hand-rolled duplicate used to live
    # here — review finding, r5).
    params = WriteOnceDict()

    def put(path: str, value: np.ndarray):
        params[path] = value

    def conv(src: str, dst: str, bias: bool = True):
        put(f"{dst}/kernel", state[f"{src}.weight"].transpose(2, 3, 1, 0))
        if bias and f"{src}.bias" in state:
            put(f"{dst}/bias", state[f"{src}.bias"])

    def group_norm(src: str, dst: str):
        put(f"{dst}/scale", state[f"{src}.weight"])
        put(f"{dst}/bias", state[f"{src}.bias"])

    def dense(src: str, dst: str):
        put(f"{dst}/kernel", state[f"{src}.weight"].T)
        if f"{src}.bias" in state:
            put(f"{dst}/bias", state[f"{src}.bias"])

    vit = "pretrained.model"

    # --- ResNet stem ---
    resnet = f"{vit}.patch_embed.backbone"
    conv(f"{resnet}.stem.conv", "encoder/resnet/conv_root", bias=False)
    group_norm(f"{resnet}.stem.norm", "encoder/resnet/gn_root")

    for stage, num_blocks in enumerate((3, 4, 9)):
        for block in range(num_blocks):
            src = f"{resnet}.stages.{stage}.blocks.{block}"
            dst = f"encoder/resnet/stage{stage + 1}_block{block + 1}"

            # Post-activation layout: norm{k} follows conv{k} (sized to its
            # OUTPUT), the projection shortcut carries downsample.norm.
            group_norm(f"{src}.norm1", f"{dst}/gn1")
            group_norm(f"{src}.norm2", f"{dst}/gn2")
            group_norm(f"{src}.norm3", f"{dst}/gn3")
            conv(f"{src}.conv1", f"{dst}/conv1", bias=False)
            conv(f"{src}.conv2", f"{dst}/conv2", bias=False)
            conv(f"{src}.conv3", f"{dst}/conv3", bias=False)

            if f"{src}.downsample.conv.weight" in state:
                conv(f"{src}.downsample.conv", f"{dst}/conv_proj", bias=False)
                group_norm(f"{src}.downsample.norm", f"{dst}/gn_proj")

    # --- patch embed + tokens ---
    conv(f"{vit}.patch_embed.proj", "encoder/patch_embed")
    put("encoder/cls_token", state[f"{vit}.cls_token"])
    put("encoder/pos_embed", state[f"{vit}.pos_embed"])

    # --- transformer blocks ---
    dim = 768
    for i in range(12):
        src = f"{vit}.blocks.{i}"
        dst = f"encoder/block{i}"

        put(f"{dst}/norm1/scale", state[f"{src}.norm1.weight"])
        put(f"{dst}/norm1/bias", state[f"{src}.norm1.bias"])
        put(f"{dst}/norm2/scale", state[f"{src}.norm2.weight"])
        put(f"{dst}/norm2/bias", state[f"{src}.norm2.bias"])

        qkv_w = state[f"{src}.attn.qkv.weight"]  # (3*dim, dim)
        qkv_b = state[f"{src}.attn.qkv.bias"]
        heads = 12
        head_dim = dim // heads

        for j, name in enumerate(("query", "key", "value")):
            w = qkv_w[j * dim:(j + 1) * dim].T.reshape(dim, heads, head_dim)
            b = qkv_b[j * dim:(j + 1) * dim].reshape(heads, head_dim)
            put(f"{dst}/attn/{name}/kernel", w)
            put(f"{dst}/attn/{name}/bias", b)

        out_w = state[f"{src}.attn.proj.weight"].T.reshape(heads, head_dim, dim)
        put(f"{dst}/attn/out/kernel", out_w)
        put(f"{dst}/attn/out/bias", state[f"{src}.attn.proj.bias"])

        dense(f"{src}.mlp.fc1", f"{dst}/mlp_fc1")
        dense(f"{src}.mlp.fc2", f"{dst}/mlp_fc2")

    # --- reassemble (readout projections + resamples) ---
    dense("pretrained.act_postprocess3.0.project.0", "reassemble3_readout")
    dense("pretrained.act_postprocess4.0.project.0", "reassemble4_readout")
    # The learned 1x1 projections at sequential index 3 (review finding,
    # r5 — previously unconsumed, failing assert_fully_consumed on the
    # real checkpoint).
    conv("pretrained.act_postprocess3.3", "reassemble3_project")
    conv("pretrained.act_postprocess4.3", "reassemble4_project")
    conv("pretrained.act_postprocess4.4", "reassemble4_downsample")

    # --- scratch ---
    for i in range(1, 5):
        conv(f"scratch.layer{i}_rn", f"scratch_rn{i}", bias=False)

    fusion_map = {4: "refinenet4", 3: "refinenet3", 2: "refinenet2", 1: "refinenet1"}
    for ours, theirs in fusion_map.items():
        src = f"scratch.{theirs}"
        dst = f"fusion{ours}"

        # The top block (refinenet4) receives no skip connection: its
        # resConfUnit1 exists in the torch checkpoint but is never applied, and
        # our module omits it.
        if ours != 4:
            conv(f"{src}.resConfUnit1.conv1", f"{dst}/rcu1/conv1")
            conv(f"{src}.resConfUnit1.conv2", f"{dst}/rcu1/conv2")

        conv(f"{src}.resConfUnit2.conv1", f"{dst}/rcu2/conv1")
        conv(f"{src}.resConfUnit2.conv2", f"{dst}/rcu2/conv2")
        conv(f"{src}.out_conv", f"{dst}/out_conv")

    # --- head ---
    conv("scratch.output_conv.0", "head_conv1")
    conv("scratch.output_conv.2", "head_conv2")
    conv("scratch.output_conv.4", "head_conv3")

    # Coverage check: every checkpoint tensor must be consumed exactly once.
    # refinenet4.resConfUnit1 exists in the checkpoint but is never applied by
    # the torch model either (no skip input at the top level); the ViT's
    # final norm / classifier head are not part of the DPT decoder.
    state.assert_fully_consumed(ignore=(
        r"^scratch\.refinenet4\.resConfUnit1\.",
        r"^pretrained\.model\.norm\.",
        r"^pretrained\.model\.head\.",
        r"num_batches_tracked$",
    ))

    np.savez(output_path, **params)
    logging.info(f"Converted DPT checkpoint written to {output_path}")
