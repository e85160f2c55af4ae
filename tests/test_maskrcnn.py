"""Mask R-CNN: box utilities, ROIAlign vs numpy oracle, converter layout,
and the end-to-end fixed-shape inference graph on a synthetic checkpoint.

The real torchvision COCO checkpoint is absent (zero-egress image), so the
converter is validated the same way as DPT's (tests/test_weight_conversion.py):
a synthetic state dict with the exact torchvision layout/shapes must convert
into the model's param tree and drive a finite forward pass.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hive_tpu.models import maskrcnn as M


class TestBoxUtils:
    def test_decode_roundtrip_identity(self):
        anchors = jnp.asarray([[10.0, 20.0, 50.0, 60.0]])
        deltas = jnp.zeros((1, 4))
        np.testing.assert_allclose(np.asarray(M.decode_boxes(anchors, deltas)),
                                   np.asarray(anchors), atol=1e-5)

    def test_decode_shift_and_scale(self):
        anchors = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        # dx=0.1 shifts centre by 1px; dw=log(2) doubles width.
        deltas = jnp.asarray([[0.1, 0.0, np.log(2.0), 0.0]])
        box = np.asarray(M.decode_boxes(anchors, deltas))[0]
        np.testing.assert_allclose(box, [-4.0, 0.0, 16.0, 10.0], atol=1e-4)

    def test_iou_matrix(self):
        a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
        b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 0.0, 15.0, 10.0],
                         [20.0, 20.0, 30.0, 30.0]])
        iou = np.asarray(M.box_iou_matrix(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 1.0 / 3.0, 0.0], atol=1e-5)

    def test_greedy_nms_keeps_best_and_disjoint(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 0, 11, 10],
                             [20, 20, 30, 30]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        idx, valid = M.greedy_nms_topk(boxes, scores, 0.5, k=3)
        idx, valid = np.asarray(idx), np.asarray(valid)
        assert list(idx[valid]) == [0, 2]

    def test_fast_nms_suppresses_overlap(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 0, 11, 10],
                             [20, 20, 30, 30]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep = np.asarray(M.fast_nms(boxes, scores, 0.5))
        assert keep.tolist() == [True, False, True]


class TestROIAlign:
    def test_matches_numpy_bilinear(self):
        rng = np.random.default_rng(0)
        feat = rng.normal(size=(48, 48, 4)).astype(np.float32)
        boxes = jnp.asarray([[5.25, 7.5, 19.25, 30.0]])

        out = np.asarray(M.roi_align(jnp.asarray(feat), boxes, out_size=7))
        assert out.shape == (1, 7, 7, 4)

        # Oracle: dense bilinear sample at the same aligned=True grid.
        x0, y0, x1, y1 = 5.25, 7.5, 19.25, 30.0
        s = 14
        ys = y0 + (np.arange(s) + 0.5) / s * (y1 - y0) - 0.5
        xs = x0 + (np.arange(s) + 0.5) / s * (x1 - x0) - 0.5

        def sample(y, x):
            yf, xf = int(np.floor(y)), int(np.floor(x))
            wy, wx = y - yf, x - xf
            v = 0.0
            for dy, wy_ in ((0, 1 - wy), (1, wy)):
                for dx, wx_ in ((0, 1 - wx), (1, wx)):
                    yy = np.clip(yf + dy, 0, 47)
                    xx = np.clip(xf + dx, 0, 47)
                    v = v + wy_ * wx_ * feat[yy, xx]
            return v

        dense = np.stack([np.stack([sample(y, x) for x in xs]) for y in ys])
        oracle = dense.reshape(7, 2, 7, 2, 4).mean(axis=(1, 3))
        np.testing.assert_allclose(out[0], oracle, atol=1e-4)

    def test_small_level_boxes_select_levels(self):
        # Level assignment: tiny boxes -> level 0 (P2), huge -> level 3 (P5).
        areas = jnp.asarray([32.0 ** 2, 600.0 ** 2])
        lvl = np.floor(4.0 + np.log2(np.sqrt(np.asarray(areas)) / 224.0))
        assert np.clip(lvl, 2, 5).tolist() == [2.0, 5.0]


def make_fake_torchvision_state_dict():
    """Random tensors with the exact torchvision maskrcnn_resnet50_fpn
    layout (classic naming variant)."""
    import torch

    rng = np.random.default_rng(42)
    sd = {}

    def t(*shape, scale=0.05):
        sd[name] = torch.from_numpy(
            (rng.normal(size=shape) * scale).astype(np.float32))

    def conv(prefix, cout, cin, k):
        nonlocal name
        name = f"{prefix}.weight"; t(cout, cin, k, k)

    def conv_b(prefix, cout, cin, k):
        nonlocal name
        conv(prefix, cout, cin, k)
        name = f"{prefix}.bias"; t(cout)

    def bn(prefix, c):
        nonlocal name
        name = f"{prefix}.weight"; t(c)
        name = f"{prefix}.bias"; t(c)
        name = f"{prefix}.running_mean"; t(c)
        sd[f"{prefix}.running_var"] = torch.from_numpy(
            np.abs(rng.normal(size=c)).astype(np.float32) + 0.5)

    def fc(prefix, cout, cin):
        nonlocal name
        name = f"{prefix}.weight"; t(cout, cin)
        name = f"{prefix}.bias"; t(cout)

    name = ""
    conv("backbone.body.conv1", 64, 3, 7)
    bn("backbone.body.bn1", 64)

    cin = 64
    for stage, (blocks, width) in enumerate([(3, 64), (4, 128), (6, 256),
                                             (3, 512)]):
        for i in range(blocks):
            p = f"backbone.body.layer{stage + 1}.{i}"
            conv(f"{p}.conv1", width, cin if i == 0 else width * 4, 1)
            bn(f"{p}.bn1", width)
            conv(f"{p}.conv2", width, width, 3)
            bn(f"{p}.bn2", width)
            conv(f"{p}.conv3", width * 4, width, 1)
            bn(f"{p}.bn3", width * 4)
            if i == 0:
                conv(f"{p}.downsample.0", width * 4, cin, 1)
                bn(f"{p}.downsample.1", width * 4)
        cin = width * 4

    for i, c in enumerate([256, 512, 1024, 2048]):
        conv_b(f"backbone.fpn.inner_blocks.{i}", 256, c, 1)
        conv_b(f"backbone.fpn.layer_blocks.{i}", 256, 256, 3)

    conv_b("rpn.head.conv", 256, 256, 3)
    conv_b("rpn.head.cls_logits", 3, 256, 1)
    conv_b("rpn.head.bbox_pred", 12, 256, 1)

    fc("roi_heads.box_head.fc6", 1024, 256 * 7 * 7)
    fc("roi_heads.box_head.fc7", 1024, 1024)
    fc("roi_heads.box_predictor.cls_score", 91, 1024)
    fc("roi_heads.box_predictor.bbox_pred", 91 * 4, 1024)

    for i in range(4):
        conv_b(f"roi_heads.mask_head.mask_fcn{i + 1}", 256, 256, 3)
    name = "roi_heads.mask_predictor.conv5_mask.weight"
    t(256, 256, 2, 2)  # torch ConvTranspose2d: (in, out, kh, kw)
    name = "roi_heads.mask_predictor.conv5_mask.bias"
    t(256)
    conv_b("roi_heads.mask_predictor.mask_fcn_logits", 91, 256, 1)

    return sd


@pytest.fixture(scope="module")
def converted_params(tmp_path_factory):
    import torch

    tmp = tmp_path_factory.mktemp("mrcnn")
    sd = make_fake_torchvision_state_dict()
    torch.save(sd, tmp / "maskrcnn.pth")
    M.convert_torch_checkpoint(str(tmp / "maskrcnn.pth"),
                               str(tmp / "maskrcnn_coco.npz"))
    return M.load_params(str(tmp / "maskrcnn_coco.npz"))


class TestConversion:
    def test_param_structure_matches_model_init(self, converted_params):
        import flax

        def flatten(tree, prefix=""):
            flat = {}
            for key, value in tree.items():
                path = f"{prefix}/{key}" if prefix else key
                if isinstance(value, dict):
                    flat.update(flatten(value, path))
                else:
                    flat[path] = tuple(value.shape)
            return flat

        model = M.MaskRCNN()
        # eval_shape: the structure assertion needs shapes only — tracing is
        # abstract, so the (expensive) initialiser never compiles.
        ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                             jnp.zeros((128, 128, 3)), jnp.asarray([128, 128]))
        ref_flat = flatten(dict(flax.core.unfreeze(ref["params"])))
        got_flat = flatten(converted_params)
        assert ref_flat == got_flat

    @pytest.fixture(scope="class")
    def detector(self, converted_params):
        # One compiled forward shared by the behavioural tests below
        # (score_threshold is a host-side attribute, not baked into the jit).
        return M.MaskRCNNDetector(converted_params, input_hw=(120, 160),
                                  canvas_min_side=160, canvas_max_side=224)

    def test_forward_runs_and_is_finite(self, detector):
        frame = (np.random.default_rng(0)
                 .integers(0, 255, (120, 160, 3)).astype(np.uint8))
        out = detector.detect(frame)

        assert out["boxes"].shape[1] == 4
        assert np.isfinite(out["boxes"]).all()
        assert len(out["mask_boxes"]) == len(out["masks"])
        assert out["masks"].shape[1:] == (28, 28)
        assert ((out["masks"] >= 0) & (out["masks"] <= 1)).all()

    def test_instance_mask_contract(self, detector):
        det = detector
        det.score_threshold = 0.0
        frame = (np.random.default_rng(1)
                 .integers(0, 255, (120, 160, 3)).astype(np.uint8))
        mask = det.instance_mask(frame)

        assert mask.shape == (120, 160)
        assert mask.dtype == np.uint8
        ids = np.unique(mask)
        # Contiguous ids starting at 0 (background).
        assert ids[0] == 0
        assert list(ids) == list(range(len(ids)))
