"""Mask R-CNN: box utilities, ROIAlign vs numpy oracle, converter layout,
and the end-to-end fixed-shape inference graph on a synthetic checkpoint.

The real torchvision COCO checkpoint is absent (zero-egress image), so the
converter is validated the same way as DPT's (tests/test_weight_conversion.py):
a synthetic state dict with the exact torchvision layout/shapes must convert
into the model's param tree and drive a finite forward pass.
"""

import numpy as np

from hive_tpu.models.selftest import make_fake_torchvision_state_dict
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

        # Oracle: dense bilinear sample at the aligned=False grid (no
        # half-pixel shift — torchvision's detection roi_align default,
        # which the released COCO weights are calibrated to).
        x0, y0, x1, y1 = 5.25, 7.5, 19.25, 30.0
        s = 14
        ys = y0 + (np.arange(s) + 0.5) / s * (y1 - y0)
        xs = x0 + (np.arange(s) + 0.5) / s * (x1 - x0)

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
