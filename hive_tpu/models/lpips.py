"""LPIPS (AlexNet variant) in JAX.

The reference scores renders with the torch ``lpips`` package
(scripts/compare_image_pair.py:29-134, AlexNet backbone). This is the same
metric natively in JAX so the evaluation harness needs neither the package
nor torch at runtime: five AlexNet feature taps, per-tap channel-unit
normalisation, learned per-channel weights on the squared differences,
spatial mean, summed over taps (Zhang et al. 2018, v0.1 weights).

Weights convert from the two released files with
:func:`convert_torch_checkpoint`: the torchvision AlexNet backbone
(``alexnet-owt-7be5be79.pth``) and the tiny LPIPS linear heads from the
``lpips`` package (``lpips/weights/v0.1/alex.pth``). The conversion is
validated numerically against a torch re-implementation of the metric in
``tests/test_weight_conversion.py``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

try:  # torch only needed for checkpoint conversion
    import torch
except Exception:  # pragma: no cover
    torch = None

# LPIPS ScalingLayer constants (PerceptualSimilarity lpips/lpips.py).
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

# AlexNet feature stack: (features, kernel, stride, padding, pool_before).
_CONVS = [(64, 11, 4, 2, False), (192, 5, 1, 2, True), (384, 3, 1, 1, True),
          (256, 3, 1, 1, False), (256, 3, 1, 1, False)]


class LPIPSAlex(nn.Module):
    """Distance between two [-1, 1] RGB images (NHWC)."""

    @nn.compact
    def __call__(self, image_a, image_b):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        # One conv module per stage, applied to BOTH images (shared weights).
        convs = [nn.Conv(feats, (k, k), strides=(s, s),
                         padding=[(p, p), (p, p)], name=f"conv{i}")
                 for i, (feats, k, s, p, _) in enumerate(_CONVS)]

        def taps(x):
            x = (x - shift) / scale
            outs = []
            for conv, (_, _, _, _, pool) in zip(convs, _CONVS):
                if pool:
                    x = nn.max_pool(x, (3, 3), strides=(2, 2))
                x = nn.relu(conv(x))
                outs.append(x)
            return outs

        total = 0.0
        for i, (ta, tb) in enumerate(zip(taps(image_a), taps(image_b))):
            def unit(t):
                norm = jnp.sqrt(jnp.sum(t ** 2, axis=-1, keepdims=True))
                return t / (norm + 1e-10)

            diff = (unit(ta) - unit(tb)) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (diff.shape[-1],))
            total = total + jnp.mean(jnp.sum(diff * w, axis=-1),
                                     axis=(1, 2))

        return total  # (N,)


class LPIPSScorer:
    """Jitted LPIPS distance on uint8 RGB images (any equal size)."""

    def __init__(self, params):
        self.model = LPIPSAlex()
        self.params = params

        @jax.jit
        def forward(params, a, b):
            a = a.astype(jnp.float32) / 127.5 - 1.0
            b = b.astype(jnp.float32) / 127.5 - 1.0
            return self.model.apply({"params": params}, a[None], b[None])[0]

        self._forward = forward

    def __call__(self, image_a: np.ndarray, image_b: np.ndarray) -> float:
        return float(self._forward(self.params, jnp.asarray(image_a),
                                   jnp.asarray(image_b)))


def load_params(npz_path: str):
    from hive_tpu.models.convert_utils import unflatten_params

    return unflatten_params(np.load(npz_path, allow_pickle=True),
                            leaf=jnp.asarray)


def load_scorer(weights_filename: str = "lpips_alex.npz") -> Optional[LPIPSScorer]:
    weights_dir = os.environ.get("WEIGHTS_PATH", "weights")
    path = os.path.join(weights_dir, weights_filename)
    if not os.path.isfile(path):
        return None
    try:
        return LPIPSScorer(load_params(path))
    except Exception as exc:  # pragma: no cover - depends on weight files
        logging.warning(f"Could not load LPIPS weights ({exc}).")
        return None


def convert_torch_checkpoint(alexnet_path: str, lpips_lin_path: str,
                             output_path: str):
    """Convert torchvision AlexNet + lpips v0.1 linear heads to our layout.

    :param alexnet_path: torchvision ``alexnet-owt-*.pth`` state dict
        (``features.{0,3,6,8,10}.weight/bias``).
    :param lpips_lin_path: the lpips package's ``weights/v0.1/alex.pth``
        (``lin{i}.model.1.weight`` 1x1 convs).
    """
    if torch is None:  # pragma: no cover
        raise RuntimeError("torch is required for checkpoint conversion")

    from hive_tpu.models.convert_utils import (TrackedState, WriteOnceDict,
                                               iter_flat_numpy)

    alexnet = TrackedState(
        iter_flat_numpy(torch.load(alexnet_path, map_location="cpu",
                                   weights_only=False)),
        name="torchvision AlexNet")
    lins = TrackedState(
        iter_flat_numpy(torch.load(lpips_lin_path, map_location="cpu",
                                   weights_only=False)),
        name="lpips v0.1 linear heads")

    out = WriteOnceDict()
    for i, src in enumerate([0, 3, 6, 8, 10]):
        w = alexnet[f"features.{src}.weight"]
        out[f"conv{i}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv{i}/bias"] = alexnet[f"features.{src}.bias"]

    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lins:  # some releases omit the dropout module index
            key = f"lin{i}.model.0.weight"
        out[f"lin{i}"] = lins[key].reshape(-1)

    # LPIPS only taps the 5 feature convs; the classifier head is unused.
    alexnet.assert_fully_consumed(ignore=(r"^classifier\.",))
    lins.assert_fully_consumed()

    np.savez(output_path, **dict(out))
    return dict(out)
