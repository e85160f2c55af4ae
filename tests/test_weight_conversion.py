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


@pytest.fixture(scope="module")
def dpt_converted(tmp_path_factory):
    """Save + convert the synthetic DPT checkpoint ONCE for the module."""
    import torch

    from hive_tpu.models.dpt import convert_torch_checkpoint

    tmp = tmp_path_factory.mktemp("dpt_weights")
    checkpoint_path = str(tmp / "dpt_hybrid_nyu.pt")
    torch.save(make_fake_dpt_state_dict(), checkpoint_path)

    output_path = str(tmp / "dpt_hybrid_nyu.npz")
    convert_torch_checkpoint(checkpoint_path, output_path)
    return tmp


class TestDPTConversion:
    def test_convert_load_forward(self, dpt_converted, monkeypatch):
        from hive_tpu.models.dpt import DPTDepthEstimator

        # Point the estimator at the converted weights and run a forward pass
        # at a reduced network size (the weights are resolution-agnostic).
        monkeypatch.setenv("WEIGHTS_PATH", str(dpt_converted))
        estimator = DPTDepthEstimator(net_size=(96, 128))

        frames = np.random.default_rng(1).integers(
            0, 255, size=(1, 96, 128, 3), dtype=np.uint8)
        depth = estimator.predict_batch(frames)

        assert depth.shape == (1, 96, 128)
        assert np.isfinite(depth).all()
        assert (depth > 0).all()

    def test_converted_param_structure_matches_model(self, dpt_converted):
        """Every converted parameter path/shape must exist in the Flax model."""
        import jax
        import jax.numpy as jnp

        from hive_tpu.models.dpt import DPTHybrid

        data = np.load(str(dpt_converted / "dpt_hybrid_nyu.npz"))
        converted = dict(data)

        model = DPTHybrid()
        # Shapes only — eval_shape avoids compiling the initialiser.
        reference_params = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 96, 128, 3)))["params"]

        def flatten_shapes(tree, prefix=""):
            flat = {}
            for key, value in tree.items():
                path = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    flat.update(flatten_shapes(value, path))
                else:
                    flat[path] = value
            return flat

        reference_flat = flatten_shapes(dict(reference_params))

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


# ---------------------------------------------------------------------------
# LaMa (big-lama FFCResNetGenerator) conversion.
# ---------------------------------------------------------------------------

def make_fake_biglama_state_dict(ngf=8, num_downsamples=2, num_blocks=2,
                                 ratio=0.75):
    """Random tensors with the exact saic-mdal/lama FFCResNetGenerator
    sequential layout (scaled-down config), wrapped like the released
    pytorch-lightning checkpoint (``state_dict`` with a ``generator.``
    prefix)."""
    import torch

    rng = np.random.default_rng(7)
    sd = {}

    def t(name, *shape, positive=False):
        arr = rng.normal(scale=0.1, size=shape).astype(np.float32)
        if positive:
            arr = np.abs(arr) + 0.5
        sd[f"generator.model.{name}"] = torch.from_numpy(arr)

    def bn(idx_prefix, c):
        t(f"{idx_prefix}.weight", c)
        t(f"{idx_prefix}.bias", c)
        t(f"{idx_prefix}.running_mean", c)
        t(f"{idx_prefix}.running_var", c, positive=True)

    def spectral(prefix, cin, cout):
        half = cout // 2
        t(f"{prefix}.conv1.0.weight", half, cin, 1, 1)
        bn(f"{prefix}.conv1.1", half)
        t(f"{prefix}.fu.conv_layer.weight", 2 * half, 2 * half, 1, 1)
        bn(f"{prefix}.fu.bn", 2 * half)
        t(f"{prefix}.conv2.weight", cout, half, 1, 1)

    # stem (model.1): 4 -> ngf, kernel 7, no global branch.
    t("1.ffc.convl2l.weight", ngf, 4, 7, 7)
    bn("1.bn_l", ngf)

    idx = 2
    feats = ngf
    for i in range(num_downsamples):
        last = i == num_downsamples - 1
        out = feats * 2
        out_g = int(out * ratio) if last else 0
        out_l = out - out_g
        t(f"{idx}.ffc.convl2l.weight", out_l, feats, 3, 3)
        bn(f"{idx}.bn_l", out_l)
        if last:
            t(f"{idx}.ffc.convl2g.weight", out_g, feats, 3, 3)
            bn(f"{idx}.bn_g", out_g)
        feats = out
        idx += 1

    cg = int(feats * ratio)
    cl = feats - cg
    for _ in range(num_blocks):
        for conv in ("conv1", "conv2"):
            p = f"{idx}.{conv}"
            t(f"{p}.ffc.convl2l.weight", cl, cl, 3, 3)
            t(f"{p}.ffc.convg2l.weight", cl, cg, 3, 3)
            t(f"{p}.ffc.convl2g.weight", cg, cl, 3, 3)
            spectral(f"{p}.ffc.convg2g", cg, cg)
            bn(f"{p}.bn_l", cl)
            bn(f"{p}.bn_g", cg)
        idx += 1

    idx += 1  # ConcatTupleLayer
    for _ in range(num_downsamples):
        t(f"{idx}.weight", feats, feats // 2, 3, 3)  # ConvTranspose2d (in,out)
        t(f"{idx}.bias", feats // 2)
        bn(f"{idx + 1}", feats // 2)
        feats //= 2
        idx += 3

    idx += 1  # ReflectionPad2d
    t(f"{idx}.weight", 3, feats, 7, 7)
    t(f"{idx}.bias", 3)

    return {"state_dict": sd, "epoch": 40}


class TestLamaConversion:
    @pytest.fixture(scope="class")
    def converted(self, tmp_path_factory):
        import torch

        from hive_tpu.models.lama import convert_torch_checkpoint

        tmp = tmp_path_factory.mktemp("lama")
        torch.save(make_fake_biglama_state_dict(), tmp / "best.ckpt")
        convert_torch_checkpoint(str(tmp / "best.ckpt"),
                                 str(tmp / "big-lama.npz"), base_features=8,
                                 num_downsamples=2, num_blocks=2)
        from hive_tpu.models.segmentation import _unflatten_params

        data = np.load(tmp / "big-lama.npz", allow_pickle=True)
        return _unflatten_params({k: data[k] for k in data.files})

    def test_structure_matches_model_init(self, converted):
        import flax
        import jax
        import jax.numpy as jnp

        from hive_tpu.models.lama import LamaGenerator

        def flatten(tree, prefix=""):
            flat = {}
            for key, value in tree.items():
                path = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    flat.update(flatten(value, path))
                else:
                    flat[path] = tuple(value.shape)
            return flat

        model = LamaGenerator(base_features=8, num_downsamples=2, num_blocks=2)
        # Shapes only — eval_shape avoids compiling the initialiser.
        ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)),
                             jnp.zeros((1, 32, 32, 1)))
        assert flatten(dict(flax.core.unfreeze(ref["params"]))) == \
            flatten(converted)

    def test_forward_runs_and_composites(self, converted):
        import jax.numpy as jnp

        from hive_tpu.models.lama import LamaGenerator

        model = LamaGenerator(base_features=8, num_downsamples=2, num_blocks=2)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        mask = jnp.zeros((1, 32, 32, 1)).at[:, 8:16, 8:16].set(1.0)

        out = np.asarray(model.apply({"params": converted}, img, mask))
        assert np.isfinite(out).all()
        known = np.asarray(mask)[..., 0] == 0
        np.testing.assert_allclose(out[known], np.asarray(img)[known],
                                   atol=1e-6)


class TestLamaTorchOracles:
    """Numerical parity of the subtle conversion pieces against torch."""

    def test_deconv_matches_torch_convtranspose(self):
        import torch

        import jax.numpy as jnp
        from hive_tpu.models.lama import (DeconvBN, _deconv_kernel_from_torch,
                                          _fold_bn_arrays)

        rng = np.random.default_rng(1)
        cin, cout = 6, 4
        x = rng.normal(size=(1, 5, 7, cin)).astype(np.float32)

        tconv = torch.nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
                                         output_padding=1)
        tbn = torch.nn.BatchNorm2d(cout).eval()
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(
                rng.normal(size=cout).astype(np.float32)))
            tbn.bias.copy_(torch.from_numpy(
                rng.normal(size=cout).astype(np.float32)))
            tbn.running_mean.copy_(torch.from_numpy(
                rng.normal(size=cout).astype(np.float32)))
            tbn.running_var.copy_(torch.from_numpy(
                (np.abs(rng.normal(size=cout)) + 0.5).astype(np.float32)))

            expected = torch.relu(tbn(tconv(
                torch.from_numpy(x.transpose(0, 3, 1, 2))))).numpy()

        scale, bias = _fold_bn_arrays(
            tbn.weight.detach().numpy(), tbn.bias.detach().numpy(),
            tbn.running_mean.numpy(), tbn.running_var.numpy(),
            conv_bias=tconv.bias.detach().numpy())
        params = {"conv": {"kernel": jnp.asarray(_deconv_kernel_from_torch(
            tconv.weight.detach().numpy()))},
            "bn": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}

        got = np.asarray(DeconvBN(cout).apply({"params": params},
                                              jnp.asarray(x)))
        np.testing.assert_allclose(got, expected.transpose(0, 2, 3, 1),
                                   atol=1e-4)

    def test_fourier_unit_matches_torch(self):
        import torch

        import jax.numpy as jnp
        from hive_tpu.models.lama import (FourierUnit,
                                          _fold_bn_arrays,
                                          _fourier_bn_from_torch,
                                          _fourier_conv_from_torch)

        rng = np.random.default_rng(2)
        c = 6
        x = rng.normal(size=(1, 8, 10, c)).astype(np.float32)

        w = rng.normal(scale=0.2, size=(2 * c, 2 * c, 1, 1)).astype(np.float32)
        gamma = rng.normal(size=2 * c).astype(np.float32)
        beta = rng.normal(size=2 * c).astype(np.float32)
        mean = rng.normal(size=2 * c).astype(np.float32)
        var = (np.abs(rng.normal(size=2 * c)) + 0.5).astype(np.float32)

        # torch FourierUnit forward (saic-mdal/lama ffc.py, groups=1).
        with torch.no_grad():
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            ffted = torch.fft.rfftn(xt, dim=(-2, -1), norm="ortho")
            ffted = torch.stack((ffted.real, ffted.imag), dim=-1)
            b, ch, h, w2, _ = ffted.shape
            ffted = ffted.permute(0, 1, 4, 2, 3).reshape(b, 2 * ch, h, w2)

            conv = torch.nn.functional.conv2d(ffted, torch.from_numpy(w))
            bn = (conv - torch.from_numpy(mean)[None, :, None, None]) \
                / torch.sqrt(torch.from_numpy(var)[None, :, None, None] + 1e-5)
            bn = bn * torch.from_numpy(gamma)[None, :, None, None] \
                + torch.from_numpy(beta)[None, :, None, None]
            act = torch.relu(bn)

            act = act.reshape(b, ch, 2, h, w2).permute(0, 1, 3, 4, 2)
            freq = torch.complex(act[..., 0], act[..., 1])
            expected = torch.fft.irfftn(freq, s=xt.shape[-2:], dim=(-2, -1),
                                        norm="ortho").numpy()

        scale, bias = _fold_bn_arrays(
            _fourier_bn_from_torch(gamma), _fourier_bn_from_torch(beta),
            _fourier_bn_from_torch(mean), _fourier_bn_from_torch(var))
        params = {"conv": {"kernel": jnp.asarray(_fourier_conv_from_torch(w))},
                  "bn": {"scale": jnp.asarray(scale),
                         "bias": jnp.asarray(bias)}}

        got = np.asarray(FourierUnit(c).apply({"params": params},
                                              jnp.asarray(x)))
        np.testing.assert_allclose(got, expected.transpose(0, 2, 3, 1),
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# LPIPS (AlexNet) conversion.
# ---------------------------------------------------------------------------

class TestLPIPSConversion:
    def test_matches_torch_oracle(self, tmp_path):
        """Convert synthetic AlexNet + lin weights and compare the JAX metric
        against a torch re-implementation of LPIPS v0.1 on random images."""
        import torch
        import torch.nn.functional as F

        from hive_tpu.models import lpips as L

        rng = np.random.default_rng(0)

        alexnet = {}
        shapes = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
                  (256, 256, 3)]
        for src, (co, ci, k) in zip([0, 3, 6, 8, 10], shapes):
            alexnet[f"features.{src}.weight"] = torch.from_numpy(
                (rng.normal(size=(co, ci, k, k)) * 0.05).astype(np.float32))
            alexnet[f"features.{src}.bias"] = torch.from_numpy(
                (rng.normal(size=co) * 0.05).astype(np.float32))

        lins = {}
        for i, c in enumerate([64, 192, 384, 256, 256]):
            lins[f"lin{i}.model.1.weight"] = torch.from_numpy(
                np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32))

        torch.save(alexnet, tmp_path / "alexnet.pth")
        torch.save(lins, tmp_path / "alex.pth")
        L.convert_torch_checkpoint(str(tmp_path / "alexnet.pth"),
                                   str(tmp_path / "alex.pth"),
                                   str(tmp_path / "lpips_alex.npz"))
        scorer = L.LPIPSScorer(L.load_params(str(tmp_path / "lpips_alex.npz")))

        img_a = rng.integers(0, 255, (64, 80, 3)).astype(np.uint8)
        img_b = rng.integers(0, 255, (64, 80, 3)).astype(np.uint8)

        # torch oracle (PerceptualSimilarity lpips v0.1 semantics).
        def oracle(a, b):
            shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
            scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

            def taps(img):
                x = torch.from_numpy(img.transpose(2, 0, 1)[None]
                                     .astype(np.float32)) / 127.5 - 1.0
                x = (x - shift) / scale
                outs = []
                for j, (src, (_, _, k)) in enumerate(
                        zip([0, 3, 6, 8, 10], shapes)):
                    if j in (1, 2):
                        x = F.max_pool2d(x, 3, stride=2)
                    stride = 4 if j == 0 else 1
                    pad = {0: 2, 1: 2}.get(j, 1)
                    x = F.relu(F.conv2d(x, alexnet[f"features.{src}.weight"],
                                        alexnet[f"features.{src}.bias"],
                                        stride=stride, padding=pad))
                    outs.append(x)
                return outs

            total = 0.0
            for j, (ta, tb) in enumerate(zip(taps(a), taps(b))):
                na = ta / (ta.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
                nb = tb / (tb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
                diff = (na - nb) ** 2
                w = lins[f"lin{j}.model.1.weight"]
                total = total + F.conv2d(diff, w).mean()
            return float(total)

        got = scorer(img_a, img_b)
        want = oracle(img_a, img_b)
        assert abs(got - want) < 1e-3 * max(abs(want), 1.0)

        # Identical images score ~0.
        assert scorer(img_a, img_a) < 1e-6

    def test_metrics_lpips_uses_jax_backend(self, tmp_path, monkeypatch):
        import torch

        from hive_tpu import metrics
        from hive_tpu.models import lpips as L

        rng = np.random.default_rng(1)
        alexnet = {}
        for src, (co, ci, k) in zip([0, 3, 6, 8, 10],
                                    [(64, 3, 11), (192, 64, 5), (384, 192, 3),
                                     (256, 384, 3), (256, 256, 3)]):
            alexnet[f"features.{src}.weight"] = torch.from_numpy(
                (rng.normal(size=(co, ci, k, k)) * 0.05).astype(np.float32))
            alexnet[f"features.{src}.bias"] = torch.from_numpy(
                np.zeros(co, np.float32))
        lins = {f"lin{i}.model.1.weight": torch.from_numpy(
            np.ones((1, c, 1, 1), np.float32))
            for i, c in enumerate([64, 192, 384, 256, 256])}

        weights_dir = tmp_path / "weights"
        weights_dir.mkdir()
        torch.save(alexnet, tmp_path / "alexnet.pth")
        torch.save(lins, tmp_path / "alex.pth")
        L.convert_torch_checkpoint(str(tmp_path / "alexnet.pth"),
                                   str(tmp_path / "alex.pth"),
                                   str(weights_dir / "lpips_alex.npz"))

        monkeypatch.setenv("WEIGHTS_PATH", str(weights_dir))
        monkeypatch.setattr(metrics, "_lpips_model", None)

        a = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        value = metrics.lpips(a, 255 - a)
        assert np.isfinite(value) and value > 0

        monkeypatch.setattr(metrics, "_lpips_model", None)


# ---------------------------------------------------------------------------
# Converter armour: unconsumed / renamed checkpoint tensors fail loudly.
# ---------------------------------------------------------------------------

class TestConverterCoverage:
    def test_dpt_extra_tensor_fails_loudly(self, tmp_path):
        import torch

        from hive_tpu.models.dpt import convert_torch_checkpoint

        state = make_fake_dpt_state_dict()
        state["pretrained.model.blocks.0.attn.new_gate.weight"] = \
            torch.zeros(768)
        path = str(tmp_path / "ckpt.pt")
        torch.save(state, path)

        with pytest.raises(ValueError, match="new_gate"):
            convert_torch_checkpoint(path, str(tmp_path / "out.npz"))

    def test_dpt_renamed_tensor_fails_with_hint(self, tmp_path):
        import torch

        from hive_tpu.models.dpt import convert_torch_checkpoint

        state = make_fake_dpt_state_dict()
        state["scratch.output_conv2.0.weight"] = \
            state.pop("scratch.output_conv.0.weight")

        path = str(tmp_path / "ckpt.pt")
        torch.save(state, path)

        with pytest.raises(KeyError, match="[Cc]lose matches"):
            convert_torch_checkpoint(path, str(tmp_path / "out.npz"))

    def test_lama_extra_tensor_fails_loudly(self, tmp_path):
        import torch

        from hive_tpu.models.lama import convert_torch_checkpoint

        state = make_fake_biglama_state_dict()
        state["state_dict"]["generator.model.1.ffc.mystery.weight"] = \
            torch.zeros(4)
        path = str(tmp_path / "lama.ckpt")
        torch.save(state, path)

        with pytest.raises(ValueError, match="mystery"):
            convert_torch_checkpoint(path, str(tmp_path / "out.npz"),
                                     base_features=8, num_downsamples=2,
                                     num_blocks=2)

    def test_lama_bn_counters_are_tolerated(self, tmp_path):
        import torch

        from hive_tpu.models.lama import convert_torch_checkpoint

        state = make_fake_biglama_state_dict()
        state["state_dict"]["generator.model.1.bn_l.num_batches_tracked"] = \
            torch.tensor(100)
        path = str(tmp_path / "lama.ckpt")
        torch.save(state, path)

        convert_torch_checkpoint(path, str(tmp_path / "out.npz"),
                                 base_features=8, num_downsamples=2,
                                 num_blocks=2)


# ---------------------------------------------------------------------------
# Turnkey conversion CLI (hive_tpu.models.convert).
# ---------------------------------------------------------------------------

class TestConvertCLI:
    def test_all_converts_found_checkpoints_and_skips_missing(
            self, tmp_path, capsys):
        """--all <dir> dry run with synthetic DPT + big-lama + LPIPS
        checkpoints under their expected release file names; Mask R-CNN is
        deliberately absent and must be reported as skipped."""
        import torch

        from hive_tpu.models import convert as C

        ckpts = tmp_path / "ckpts"
        ckpts.mkdir()
        torch.save(make_fake_dpt_state_dict(), ckpts / "dpt_hybrid_nyu.pt")
        torch.save(make_fake_biglama_state_dict(), ckpts / "big-lama.ckpt")

        rng = np.random.default_rng(0)
        alexnet = {}
        shapes = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
                  (256, 256, 3)]
        for src, (co, ci, k) in zip([0, 3, 6, 8, 10], shapes):
            alexnet[f"features.{src}.weight"] = torch.from_numpy(
                (rng.normal(size=(co, ci, k, k)) * 0.05).astype(np.float32))
            alexnet[f"features.{src}.bias"] = torch.from_numpy(
                (rng.normal(size=co) * 0.05).astype(np.float32))
        # Hash-free alias name: the hub-style `alexnet-owt-<sha8>.pth` form
        # would (correctly) fail the embedded-SHA256 check on synthetic data.
        torch.save(alexnet, ckpts / "alexnet.pth")
        lins = {}
        for i, c in enumerate([64, 192, 384, 256, 256]):
            lins[f"lin{i}.model.1.weight"] = torch.from_numpy(
                np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32))
        torch.save(lins, ckpts / "lpips_alex.pth")

        out = tmp_path / "weights"
        rc = C.main(["--all", str(ckpts), "--output", str(out),
                     "--lama_base_features", "8",
                     "--lama_num_downsamples", "2",
                     "--lama_num_blocks", "2"])
        captured = capsys.readouterr()

        assert rc == 0, captured.err
        for name in ("dpt_hybrid_nyu.npz", "big-lama.npz", "lpips_alex.npz"):
            assert (out / name).is_file(), name
        assert not (out / "maskrcnn_coco.npz").exists()
        assert "[skipped] no checkpoint found for: maskrcnn" in captured.out

    def test_empty_folder_fails_with_expected_names(self, tmp_path, capsys):
        from hive_tpu.models import convert as C

        empty = tmp_path / "none"
        empty.mkdir()
        rc = C.main(["--all", str(empty), "--output", str(tmp_path / "w")])

        assert rc == 1
        err = capsys.readouterr().err
        assert "dpt_hybrid_nyu.pt" in err and "big-lama.ckpt" in err

    def test_hub_hash_verification(self, tmp_path):
        import hashlib

        from hive_tpu.models import convert as C

        payload = b"synthetic-checkpoint-bytes"
        good_prefix = hashlib.sha256(payload).hexdigest()[:8]

        good = tmp_path / f"dpt_hybrid_nyu-{good_prefix}.pt"
        good.write_bytes(payload)
        bad = tmp_path / "dpt_hybrid_nyu-2ce69ec7.pt"
        bad.write_bytes(payload)
        unhashed = tmp_path / "dpt_hybrid_nyu.pt"
        unhashed.write_bytes(payload)

        assert C.verify_hub_hash(str(good)) is True
        assert C.verify_hub_hash(str(bad)) is False
        assert C.verify_hub_hash(str(unhashed)) is None

    def test_corrupt_hub_download_fails_loudly(self, tmp_path, capsys):
        from hive_tpu.models import convert as C

        ckpts = tmp_path / "ckpts"
        ckpts.mkdir()
        # Real released name, wrong bytes -> must fail BEFORE conversion.
        (ckpts / "dpt_hybrid_nyu-2ce69ec7.pt").write_bytes(b"junk")

        rc = C.main(["--all", str(ckpts), "--output", str(tmp_path / "w")])
        assert rc == 1
        assert "SHA256" in capsys.readouterr().err
