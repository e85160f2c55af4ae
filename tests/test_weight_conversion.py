"""DPT torch-checkpoint conversion test against a synthetic state dict.

Builds a minimal torch checkpoint with the timm hybrid-ViT + DPT-scratch
parameter names/shapes, converts it, loads the result into the Flax model and
runs a forward pass — validating the converter end to end without the real
(non-downloadable) weights.
"""

import numpy as np
import pytest


def make_fake_dpt_state_dict():
    """The timm vitb_rn50_384 + DPT scratch layout at full size."""
    import torch

    rng = np.random.default_rng(0)

    def tensor(*shape):
        return torch.from_numpy(rng.normal(scale=0.02, size=shape).astype(np.float32))

    state = {}
    vit = "pretrained.model"
    resnet = f"{vit}.patch_embed.backbone"

    # ResNetV2 stem.
    state[f"{resnet}.stem.conv.weight"] = tensor(64, 3, 7, 7)
    state[f"{resnet}.stem.norm.weight"] = tensor(64)
    state[f"{resnet}.stem.norm.bias"] = tensor(64)

    for stage, (blocks, width) in enumerate([(3, 64), (4, 128), (9, 256)]):
        in_ch = 64 * 4 * (2 ** (stage - 1)) if stage > 0 else 64

        for block in range(blocks):
            src = f"{resnet}.stages.{stage}.blocks.{block}"
            prev = in_ch if block == 0 else width * 4

            state[f"{src}.norm1.weight"] = tensor(prev)
            state[f"{src}.norm1.bias"] = tensor(prev)
            state[f"{src}.conv1.weight"] = tensor(width, prev, 1, 1)
            state[f"{src}.norm2.weight"] = tensor(width)
            state[f"{src}.norm2.bias"] = tensor(width)
            state[f"{src}.conv2.weight"] = tensor(width, width, 3, 3)
            state[f"{src}.norm3.weight"] = tensor(width)
            state[f"{src}.norm3.bias"] = tensor(width)
            state[f"{src}.conv3.weight"] = tensor(width * 4, width, 1, 1)

            if block == 0:
                state[f"{src}.downsample.conv.weight"] = tensor(width * 4, prev, 1, 1)

    # Patch embed + tokens.
    state[f"{vit}.patch_embed.proj.weight"] = tensor(768, 1024, 1, 1)
    state[f"{vit}.patch_embed.proj.bias"] = tensor(768)
    state[f"{vit}.cls_token"] = tensor(1, 1, 768)
    state[f"{vit}.pos_embed"] = tensor(1, 577, 768)

    # Transformer blocks.
    for i in range(12):
        src = f"{vit}.blocks.{i}"
        state[f"{src}.norm1.weight"] = tensor(768)
        state[f"{src}.norm1.bias"] = tensor(768)
        state[f"{src}.norm2.weight"] = tensor(768)
        state[f"{src}.norm2.bias"] = tensor(768)
        state[f"{src}.attn.qkv.weight"] = tensor(2304, 768)
        state[f"{src}.attn.qkv.bias"] = tensor(2304)
        state[f"{src}.attn.proj.weight"] = tensor(768, 768)
        state[f"{src}.attn.proj.bias"] = tensor(768)
        state[f"{src}.mlp.fc1.weight"] = tensor(3072, 768)
        state[f"{src}.mlp.fc1.bias"] = tensor(3072)
        state[f"{src}.mlp.fc2.weight"] = tensor(768, 3072)
        state[f"{src}.mlp.fc2.bias"] = tensor(768)

    # Reassemble.
    state["pretrained.act_postprocess3.0.project.0.weight"] = tensor(768, 1536)
    state["pretrained.act_postprocess3.0.project.0.bias"] = tensor(768)
    state["pretrained.act_postprocess4.0.project.0.weight"] = tensor(768, 1536)
    state["pretrained.act_postprocess4.0.project.0.bias"] = tensor(768)
    state["pretrained.act_postprocess4.4.weight"] = tensor(768, 768, 3, 3)
    state["pretrained.act_postprocess4.4.bias"] = tensor(768)

    # Scratch.
    for i, ch in enumerate([256, 512, 768, 768], start=1):
        state[f"scratch.layer{i}_rn.weight"] = tensor(256, ch, 3, 3)

    for name in ("refinenet1", "refinenet2", "refinenet3", "refinenet4"):
        src = f"scratch.{name}"
        for unit in ("resConfUnit1", "resConfUnit2"):
            state[f"{src}.{unit}.conv1.weight"] = tensor(256, 256, 3, 3)
            state[f"{src}.{unit}.conv1.bias"] = tensor(256)
            state[f"{src}.{unit}.conv2.weight"] = tensor(256, 256, 3, 3)
            state[f"{src}.{unit}.conv2.bias"] = tensor(256)
        state[f"{src}.out_conv.weight"] = tensor(256, 256, 1, 1)
        state[f"{src}.out_conv.bias"] = tensor(256)

    # Head.
    state["scratch.output_conv.0.weight"] = tensor(128, 256, 3, 3)
    state["scratch.output_conv.0.bias"] = tensor(128)
    state["scratch.output_conv.2.weight"] = tensor(32, 128, 3, 3)
    state["scratch.output_conv.2.bias"] = tensor(32)
    state["scratch.output_conv.4.weight"] = tensor(1, 32, 1, 1)
    state["scratch.output_conv.4.bias"] = tensor(1)

    return state


class TestDPTConversion:
    def test_convert_load_forward(self, tmp_path, monkeypatch):
        import torch

        from hive_tpu.models.dpt import DPTDepthEstimator, convert_torch_checkpoint

        checkpoint_path = str(tmp_path / "dpt_hybrid_nyu.pt")
        torch.save(make_fake_dpt_state_dict(), checkpoint_path)

        weights_dir = tmp_path / "weights"
        weights_dir.mkdir()
        output_path = str(weights_dir / "dpt_hybrid_nyu.npz")

        convert_torch_checkpoint(checkpoint_path, output_path)

        # Point the estimator at the converted weights and run a forward pass
        # at a reduced network size (the weights are resolution-agnostic).
        monkeypatch.setenv("WEIGHTS_PATH", str(weights_dir))
        estimator = DPTDepthEstimator(net_size=(96, 128))

        frames = np.random.default_rng(1).integers(
            0, 255, size=(1, 96, 128, 3), dtype=np.uint8)
        depth = estimator.predict_batch(frames)

        assert depth.shape == (1, 96, 128)
        assert np.isfinite(depth).all()
        assert (depth > 0).all()

    def test_converted_param_structure_matches_model(self, tmp_path):
        """Every converted parameter path/shape must exist in the Flax model."""
        import jax
        import jax.numpy as jnp
        import torch

        from hive_tpu.models.dpt import (DPTHybrid, _flatten_params,
                                         convert_torch_checkpoint)

        checkpoint_path = str(tmp_path / "ckpt.pt")
        torch.save(make_fake_dpt_state_dict(), checkpoint_path)
        output_path = str(tmp_path / "out.npz")
        convert_torch_checkpoint(checkpoint_path, output_path)

        data = np.load(output_path)
        converted = dict(data)

        model = DPTHybrid()
        reference_params = model.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 96, 128, 3)))["params"]
        reference_flat = _flatten_params(
            jax.tree.map(np.asarray, reference_params))

        missing = set(converted) - set(reference_flat)
        assert not missing, f"converted params with no model slot: {sorted(missing)[:8]}"

        shape_mismatches = [
            key for key in converted
            if converted[key].shape != reference_flat[key].shape
        ]
        assert not shape_mismatches, \
            f"shape mismatches: {[(k, converted[k].shape, reference_flat[k].shape) for k in shape_mismatches[:5]]}"

        not_converted = set(reference_flat) - set(converted)
        assert not not_converted, \
            f"model params the converter missed: {sorted(not_converted)[:8]}"
