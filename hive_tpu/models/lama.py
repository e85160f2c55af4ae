"""LaMa image inpainting (Fast Fourier Convolutions) in Flax.

TPU-native replacement for the reference's torch big-lama
(third_party/lama, invoked at hive/dataset_adaptors.py:549-563). LaMa's core
op — the Fast Fourier Convolution (FFC), "Resolution-robust Large Mask
Inpainting with Fourier Convolutions" (Suvorov et al. 2022) — is a natural fit
for XLA: the spectral branch is rfft2 → 1x1 conv on stacked real/imag →
irfft2, all fused by the compiler.

The generator mirrors the released **big-lama** configuration exactly so the
released checkpoint converts 1:1 (``FFCResNetGenerator``: ngf 64, 3
downsamples, 18 FFC residual blocks at a 0.75 global ratio, ``enable_lfu``
off, reflect padding, sigmoid output):

* all convolutions reflect-pad (torch ``padding_mode='reflect'``) and carry
  no bias; every BatchNorm is folded into a per-channel scale/bias at
  conversion time (inference-only, like the Mask R-CNN port);
* the Fourier unit stores its spectral tensor as ``[all-real | all-imag]``
  channel blocks (torch interleaves re/im per channel — the converter
  permutes the 1x1 conv weights and BN stats, see
  :func:`_fourier_conv_from_torch`);
* the decoder's ``ConvTranspose2d(k=3, s=2, p=1, output_padding=1)`` is
  computed as zero-interleaved upsampling + a VALID 3x3 conv with the
  spatially-flipped kernel (exact; validated against torch in
  tests/test_weight_conversion.py).

Weights load from ``$WEIGHTS_PATH/big-lama.npz`` (convert the released
checkpoint with :func:`convert_torch_checkpoint`); without weights,
:func:`lama_inpaint_folder` transparently falls back to cv2 TELEA inpainting
so the pipeline contract (inpainted RGB/depth folders) always holds.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import cv2
import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

try:  # torch only needed for checkpoint conversion
    import torch
except Exception:  # pragma: no cover
    torch = None

from hive_tpu.models.maskrcnn import FoldedBN


# ---------------------------------------------------------------------------
# FFC building blocks (faithful to saic-mdal/lama ffc.py, inference form).
# ---------------------------------------------------------------------------

def _reflect_pad(x, p: int):
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class FourierUnit(nn.Module):
    """rfft2 → 1x1 conv + folded-BN + relu over [re | im] blocks → irfft2."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        freq = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        stacked = jnp.concatenate([freq.real, freq.imag], axis=-1)

        y = nn.Conv(2 * self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(stacked.astype(self.dtype))
        y = FoldedBN(2 * self.features, name="bn")(y)
        y = nn.relu(y).astype(jnp.float32)

        freq = jax.lax.complex(y[..., :self.features], y[..., self.features:])
        out = jnp.fft.irfft2(freq, s=(h, w), axes=(1, 2), norm="ortho")
        return out.astype(x.dtype)


class SpectralTransform(nn.Module):
    """Global-branch transform: 1x1 bottleneck → Fourier unit → 1x1 expand.

    big-lama runs with ``enable_lfu: false`` — no local Fourier unit.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.features // 2

        y = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FoldedBN(half, name="bn1")(y)
        y = nn.relu(y)

        out = FourierUnit(half, dtype=self.dtype, name="fu")(y)

        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv2")(y + out)


class FFCBnAct(nn.Module):
    """torch ``FFC_BN_ACT``: cross-connected local/global convs + BN + ReLU.

    Input/output channel splits are implicit in the (x_local, x_global)
    pair; ``ratio_gout`` sets the output split. Global-to-global runs
    through the spectral transform.
    """

    features: int
    ratio_gout: float
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_local, x_global):
        out_g = int(self.features * self.ratio_gout)
        out_l = self.features - out_g
        p = self.kernel // 2

        def conv(name, feats, x):
            return nn.Conv(feats, (self.kernel,) * 2,
                           strides=(self.stride,) * 2, padding="VALID",
                           use_bias=False, dtype=self.dtype,
                           name=name)(_reflect_pad(x, p))

        y_local = y_global = None

        if out_l > 0:
            y_local = conv("convl2l", out_l, x_local)
            if x_global is not None:
                y_local = y_local + conv("convg2l", out_l, x_global)
            y_local = nn.relu(FoldedBN(out_l, name="bn_l")(y_local))

        if out_g > 0:
            y_global = conv("convl2g", out_g, x_local)
            if x_global is not None:
                y_global = y_global + SpectralTransform(
                    out_g, dtype=self.dtype, name="convg2g")(x_global)
            y_global = nn.relu(FoldedBN(out_g, name="bn_g")(y_global))

        return y_local, y_global


class FFCResNetBlock(nn.Module):
    features: int
    ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_local, x_global):
        y_local, y_global = FFCBnAct(self.features, self.ratio,
                                     dtype=self.dtype, name="conv1")(
            x_local, x_global)
        y_local, y_global = FFCBnAct(self.features, self.ratio,
                                     dtype=self.dtype, name="conv2")(
            y_local, y_global)

        return x_local + y_local, x_global + y_global


class DeconvBN(nn.Module):
    """Exact torch ``ConvTranspose2d(k=3, s=2, p=1, output_padding=1)`` + BN
    + ReLU: zero-interleave upsample, then a VALID 3x3 conv whose kernel the
    converter stores pre-flipped/transposed; the deconv bias folds into the
    BN scale/bias."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape

        zeros = jnp.zeros_like(x)
        up = jnp.stack([x, zeros], axis=2).reshape(b, 2 * h, w, c)
        up = jnp.stack([up, jnp.zeros_like(up)], axis=3).reshape(b, 2 * h,
                                                                 2 * w, c)
        up = up[:, :2 * h - 1, :2 * w - 1]
        up = jnp.pad(up, ((0, 0), (1, 2), (1, 2), (0, 0)))

        y = nn.Conv(self.features, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv")(up)
        return nn.relu(FoldedBN(self.features, name="bn")(y))


class LamaGenerator(nn.Module):
    """big-lama's ``FFCResNetGenerator`` (defaults = the released config).

    Input is RGB + binary mask; output composites the prediction into the
    hole (the reference's predict driver keeps known pixels too).
    """

    base_features: int = 64
    num_downsamples: int = 3
    num_blocks: int = 18
    global_ratio: float = 0.75
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, mask):
        x = jnp.concatenate([image * (1.0 - mask), mask],
                            axis=-1).astype(self.dtype)

        y_local, _ = FFCBnAct(self.base_features, 0.0, kernel=7,
                              dtype=self.dtype, name="stem")(x, None)
        y_global = None

        features = self.base_features
        for i in range(self.num_downsamples):
            features *= 2
            gout = self.global_ratio if i == self.num_downsamples - 1 else 0.0
            y_local, y_global = FFCBnAct(features, gout, stride=2,
                                         dtype=self.dtype,
                                         name=f"down{i}")(y_local, y_global)

        for i in range(self.num_blocks):
            y_local, y_global = FFCResNetBlock(
                features, self.global_ratio, dtype=self.dtype,
                name=f"block{i}")(y_local, y_global)

        y = jnp.concatenate([y_local, y_global], axis=-1)

        for i in range(self.num_downsamples):
            features //= 2
            y = DeconvBN(features, dtype=self.dtype, name=f"up{i}")(y)

        y = _reflect_pad(y, 3)
        y = nn.Conv(3, (7, 7), padding="VALID", dtype=self.dtype,
                    name="head")(y)
        y = jax.nn.sigmoid(y.astype(jnp.float32))

        # Composite: keep known pixels, fill the hole with the prediction.
        return image * (1.0 - mask) + y * mask


# ---------------------------------------------------------------------------
# Inference wrapper + folder driver.
# ---------------------------------------------------------------------------

class LamaInpainter:
    """Batched LaMa inference; pads inputs to a multiple of 8."""

    PAD_MULTIPLE = 8

    def __init__(self, weights_filename: str = "big-lama.npz", dtype=jnp.bfloat16):
        self.model = LamaGenerator(dtype=dtype)
        self.params = self._load_or_init(weights_filename)

        @jax.jit
        def forward(params, image, mask):
            return self.model.apply({"params": params}, image, mask)

        self._forward = forward

    def _load_or_init(self, weights_filename: str):
        weights_dir = os.environ.get("WEIGHTS_PATH", "weights")
        weights_path = os.path.join(weights_dir, weights_filename)

        if os.path.isfile(weights_path):
            logging.info(f"Loading LaMa weights from {weights_path}")
            from hive_tpu.models.convert_utils import unflatten_params

            return unflatten_params(np.load(weights_path, allow_pickle=True),
                                    leaf=jnp.asarray)

        logging.warning(f"LaMa weights not found at {weights_path}; "
                        f"using random initialisation.")

        from hive_tpu.models.initialisation import fast_random_params

        dummy_img = jnp.zeros((1, 64, 64, 3))
        dummy_mask = jnp.zeros((1, 64, 64, 1))
        return fast_random_params(self.model, dummy_img, dummy_mask)

    @classmethod
    def has_weights(cls, weights_filename: str = "big-lama.npz") -> bool:
        weights_dir = os.environ.get("WEIGHTS_PATH", "weights")
        return os.path.isfile(os.path.join(weights_dir, weights_filename))

    def inpaint(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 image + (H, W) uint8 mask (255=hole) → inpainted uint8."""
        h, w = image.shape[:2]
        pad_h = -h % self.PAD_MULTIPLE
        pad_w = -w % self.PAD_MULTIPLE

        img = image.astype(np.float32) / 255.0
        img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        m = (mask > 127).astype(np.float32)
        m = np.pad(m, ((0, pad_h), (0, pad_w)), mode="constant")

        out = np.asarray(self._forward(self.params, jnp.asarray(img[None]),
                                       jnp.asarray(m[None, ..., None])))[0]

        return np.clip(out[:h, :w] * 255.0, 0, 255).astype(np.uint8)


def lama_inpaint_folder(image_dir: str, mask_dir: str, output_dir: str,
                        depth: bool = False):
    """Inpaint every image in a folder using its (same-stem) mask.

    Same folder contract as the reference's `lama_predict`
    (hive/dataset_adaptors.py:549-563). Falls back to cv2 TELEA when no LaMa
    weights are available, so the pipeline never hard-fails on missing models.
    """
    from pathlib import Path

    from hive_tpu.utils import tqdm_imap

    os.makedirs(output_dir, exist_ok=True)

    use_lama = LamaInpainter.has_weights()
    inpainter = LamaInpainter() if use_lama else None

    if not use_lama:
        logging.warning("LaMa weights unavailable; inpainting with cv2 TELEA instead.")

    filenames = sorted(os.listdir(image_dir))

    def process(filename: str):
        mask_filename = f"{Path(filename).stem}.png"
        mask = cv2.imread(os.path.join(mask_dir, mask_filename), cv2.IMREAD_GRAYSCALE)
        image = cv2.imread(os.path.join(image_dir, filename), cv2.IMREAD_UNCHANGED)

        if depth:
            # Depth maps are uint16 single channel; inpaint in float mm space.
            original_dtype = image.dtype
            result = cv2.inpaint(
                (image / 256).astype(np.uint8), mask, 30, cv2.INPAINT_TELEA)
            result = (result.astype(np.float32) * 256).astype(original_dtype)
            # Keep known values untouched.
            result[mask <= 127] = image[mask <= 127]
        elif use_lama:
            rgb = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
            result = cv2.cvtColor(inpainter.inpaint(rgb, mask), cv2.COLOR_RGB2BGR)
        else:
            result = cv2.inpaint(image, mask, 30, cv2.INPAINT_TELEA)

        cv2.imwrite(os.path.join(output_dir, filename), result)

    tqdm_imap(process, filenames)


# ---------------------------------------------------------------------------
# Checkpoint conversion (released big-lama -> our .npz layout).
# ---------------------------------------------------------------------------

def _fold_bn_arrays(gamma, beta, mean, var, conv_bias=None, eps=1e-5):
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    if conv_bias is not None:
        bias = bias + conv_bias * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _deinterleave(n: int) -> np.ndarray:
    """Channel permutation: ours [re_0..re_{n-1} | im_0..im_{n-1}] index j ->
    torch interleaved index (2j for re, 2(j-n)+1 for im)."""
    idx = np.empty(2 * n, np.int64)
    idx[:n] = 2 * np.arange(n)
    idx[n:] = 2 * np.arange(n) + 1
    return idx


def _fourier_conv_from_torch(weight: np.ndarray):
    """torch FourierUnit ``conv_layer`` (2co, 2ci, 1, 1) interleaved-re/im ->
    our HWIO kernel over [re | im] channel blocks."""
    co2, ci2 = weight.shape[:2]
    w = weight[np.ix_(_deinterleave(co2 // 2), _deinterleave(ci2 // 2))]
    return np.transpose(w, (2, 3, 1, 0))


def _fourier_bn_from_torch(arr: np.ndarray):
    """Permute torch FourierUnit BN stats (interleaved) to [re | im] blocks."""
    return arr[_deinterleave(arr.shape[0] // 2)]


def _deconv_kernel_from_torch(weight: np.ndarray):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> the HWIO kernel of
    the equivalent zero-interleave + VALID conv (spatially flipped)."""
    return np.transpose(weight[:, :, ::-1, ::-1], (2, 3, 0, 1))


def convert_torch_checkpoint(torch_checkpoint_path: str, output_path: str,
                             base_features: int = 64,
                             num_downsamples: int = 3, num_blocks: int = 18,
                             global_ratio: float = 0.75):
    """Convert a released big-lama checkpoint (pytorch-lightning ``best.ckpt``
    or a bare generator state dict) into :class:`LamaGenerator`'s flat
    ``.npz`` layout. All BatchNorms fold into scale/bias; the Fourier-unit
    conv/BN channels de-interleave to [re | im] blocks; deconv kernels
    pre-flip for the zero-interleave formulation.

    The generator ``nn.Sequential`` index layout (saic-mdal/lama
    ``FFCResNetGenerator``): pad, stem FFC, ``num_downsamples`` downsampling
    FFCs, ``num_blocks`` residual blocks, concat, 3 x (deconv, bn, relu) per
    upsample, pad, head conv, sigmoid.
    """
    if torch is None:  # pragma: no cover
        raise RuntimeError("torch is required for checkpoint conversion")

    raw = torch.load(torch_checkpoint_path, map_location="cpu",
                     weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]

    from hive_tpu.models.convert_utils import TrackedState, WriteOnceDict

    sd = {}
    for key, value in raw.items():
        if key.startswith("generator."):
            key = key[len("generator."):]
        if key.startswith("model."):
            sd[key] = np.asarray(value.detach().numpy() if hasattr(value, "detach")
                                 else value)

    sd = TrackedState(sd, name="big-lama generator")
    out = WriteOnceDict()

    def put_conv(src, dst):
        out[f"{dst}/kernel"] = np.transpose(sd[src], (2, 3, 1, 0))

    def put_bn(src_prefix, dst, conv_bias=None):
        scale, bias = _fold_bn_arrays(
            sd[f"{src_prefix}.weight"], sd[f"{src_prefix}.bias"],
            sd[f"{src_prefix}.running_mean"], sd[f"{src_prefix}.running_var"],
            conv_bias=conv_bias)
        out[f"{dst}/scale"] = scale
        out[f"{dst}/bias"] = bias

    def put_spectral(src, dst):
        put_conv(f"{src}.conv1.0.weight", f"{dst}/conv1")
        put_bn(f"{src}.conv1.1", f"{dst}/bn1")
        out[f"{dst}/fu/conv/kernel"] = _fourier_conv_from_torch(
            sd[f"{src}.fu.conv_layer.weight"])
        scale, bias = _fold_bn_arrays(
            _fourier_bn_from_torch(sd[f"{src}.fu.bn.weight"]),
            _fourier_bn_from_torch(sd[f"{src}.fu.bn.bias"]),
            _fourier_bn_from_torch(sd[f"{src}.fu.bn.running_mean"]),
            _fourier_bn_from_torch(sd[f"{src}.fu.bn.running_var"]))
        out[f"{dst}/fu/bn/scale"] = scale
        out[f"{dst}/fu/bn/bias"] = bias
        put_conv(f"{src}.conv2.weight", f"{dst}/conv2")

    def put_ffc_bn_act(idx, dst, has_global_in, has_global_out):
        src = f"model.{idx}"
        put_conv(f"{src}.ffc.convl2l.weight", f"{dst}/convl2l")
        if has_global_in:
            put_conv(f"{src}.ffc.convg2l.weight", f"{dst}/convg2l")
        put_bn(f"{src}.bn_l", f"{dst}/bn_l")
        if has_global_out:
            put_conv(f"{src}.ffc.convl2g.weight", f"{dst}/convl2g")
            if has_global_in:
                put_spectral(f"{src}.ffc.convg2g", f"{dst}/convg2g")
            put_bn(f"{src}.bn_g", f"{dst}/bn_g")

    put_ffc_bn_act(1, "stem", False, False)

    idx = 2
    for i in range(num_downsamples):
        last = i == num_downsamples - 1
        put_ffc_bn_act(idx, f"down{i}", False, last)
        idx += 1

    for i in range(num_blocks):
        src = f"model.{idx}"
        for conv_name in ("conv1", "conv2"):
            dst = f"block{i}/{conv_name}"
            put_conv(f"{src}.{conv_name}.ffc.convl2l.weight", f"{dst}/convl2l")
            put_conv(f"{src}.{conv_name}.ffc.convg2l.weight", f"{dst}/convg2l")
            put_conv(f"{src}.{conv_name}.ffc.convl2g.weight", f"{dst}/convl2g")
            put_spectral(f"{src}.{conv_name}.ffc.convg2g", f"{dst}/convg2g")
            put_bn(f"{src}.{conv_name}.bn_l", f"{dst}/bn_l")
            put_bn(f"{src}.{conv_name}.bn_g", f"{dst}/bn_g")
        idx += 1

    idx += 1  # ConcatTupleLayer
    for i in range(num_downsamples):
        out[f"up{i}/conv/kernel"] = _deconv_kernel_from_torch(
            sd[f"model.{idx}.weight"])
        put_bn(f"model.{idx + 1}", f"up{i}/bn",
               conv_bias=sd.get(f"model.{idx}.bias"))
        idx += 3  # deconv, bn, relu

    idx += 1  # ReflectionPad2d
    put_conv(f"model.{idx}.weight", "head")
    out["head/bias"] = sd[f"model.{idx}.bias"]

    # Every generator tensor must be consumed exactly once (BN trip counters
    # carry no learned state).
    sd.assert_fully_consumed(ignore=(r"num_batches_tracked$",))

    np.savez(output_path, **dict(out))
    return dict(out)
