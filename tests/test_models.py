"""Model architecture tests (shapes, contracts, jit-compilability).

Weights are not available in CI, so these tests validate the architectures and
inference plumbing with random initialisation and the classical fallbacks.
"""

import numpy as np
import pytest


class TestDPT:
    @pytest.fixture(scope="class")
    def estimator(self):
        from hive_tpu.models.dpt import DPTDepthEstimator

        # Small network size keeps CPU CI fast; ViT grid = (96/16, 128/16).
        return DPTDepthEstimator(weights_filename="nonexistent.npz", net_size=(96, 128))

    def test_predict_batch_shapes(self, estimator, rng):
        frames = rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
        depth = estimator.predict_batch(frames)

        assert depth.shape == (2, 96, 128)
        assert depth.dtype == np.float32
        assert np.isfinite(depth).all()
        assert (depth > 0).all()  # metric depth is positive by construction

    def test_resizes_arbitrary_input(self, estimator, rng):
        frames = rng.integers(0, 255, size=(1, 60, 80, 3), dtype=np.uint8)
        depth = estimator.predict_batch(frames)
        assert depth.shape == (1, 60, 80)

    def test_depth_calibration_formula(self):
        from hive_tpu.models.dpt import NYU_SCALE, NYU_SHIFT

        # The inverse-depth → depth mapping at zero response gives the far limit.
        assert 1.0 / NYU_SHIFT == pytest.approx(7.26, abs=0.01)
        assert NYU_SCALE == pytest.approx(0.000305)


class TestHybridViTInternals:
    def test_resnet_stem_feature_pyramid(self):
        import jax
        import jax.numpy as jnp

        from hive_tpu.models.dpt import ResNetV2Stem

        stem = ResNetV2Stem()
        x = jnp.zeros((1, 64, 96, 3))
        # Shape-contract test: abstract eval only, no initialiser compile
        # (full DPT forwards are covered by TestDPT).
        params = jax.eval_shape(stem.init, jax.random.PRNGKey(0), x)
        f4, f8, f16 = jax.eval_shape(stem.apply, params, x)

        assert f4.shape == (1, 16, 24, 256)
        assert f8.shape == (1, 8, 12, 512)
        assert f16.shape == (1, 4, 6, 1024)

    def test_transformer_block_preserves_shape(self):
        import jax
        import jax.numpy as jnp

        from hive_tpu.models.dpt import TransformerBlock

        block = TransformerBlock(dim=64, num_heads=4)
        x = jnp.zeros((2, 10, 64))
        params = block.init(jax.random.PRNGKey(0), x)
        y = block.apply(params, x)
        assert y.shape == x.shape


class TestSegmentation:
    def test_fallback_backend_runs(self, rng):
        from hive_tpu.models.segmentation import PersonSegmenter

        segmenter = PersonSegmenter(weights_path="/nonexistent/weights.npz")
        frames = rng.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
        masks = segmenter.predict_batch(frames)

        assert len(masks) == 2
        for mask in masks:
            assert mask.shape == (96, 128)
            assert mask.dtype == np.uint8

    def test_instances_from_probability(self):
        from hive_tpu.models.segmentation import PersonSegmenter

        segmenter = PersonSegmenter(weights_path="/nonexistent/weights.npz")

        prob = np.zeros((64, 64), dtype=np.float32)
        prob[10:30, 10:30] = 0.9   # blob 1
        prob[40:60, 40:60] = 0.9   # blob 2

        mask = segmenter._instances_from_probability(prob)
        assert set(np.unique(mask)) == {0, 1, 2}
        # Each blob is one coherent instance.
        assert len(np.unique(mask[10:30, 10:30])) == 1
        assert len(np.unique(mask[40:60, 40:60])) == 1

    def test_unet_architecture(self):
        import jax
        import jax.numpy as jnp

        from hive_tpu.models.segmentation import build_unet

        model = build_unet()
        x = jnp.zeros((1, 32, 32, 3))
        # Shape contract via abstract eval (the U-Net fallback's runtime
        # behaviour is covered by test_fallback_backend_runs).
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        logits = jax.eval_shape(model.apply, params, x)
        assert logits.shape == (1, 32, 32, 1)


class TestLama:
    @pytest.fixture(scope="class")
    def lama(self):
        """One tiny generator + params shared by the class (one compile)."""
        import jax
        import jax.numpy as jnp

        from hive_tpu.models.lama import LamaGenerator

        from hive_tpu.models.initialisation import fast_random_params

        model = LamaGenerator(base_features=16, num_blocks=1, num_downsamples=2)
        image = jnp.zeros((1, 32, 32, 3))
        mask = jnp.zeros((1, 32, 32, 1))
        params = {"params": fast_random_params(model, image, mask)}
        return model, params

    def test_generator_shapes(self, lama):
        import jax.numpy as jnp

        model, params = lama
        out = model.apply(params, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 1)))
        assert out.shape == (1, 32, 32, 3)

    def test_known_pixels_preserved(self, lama):
        import jax.numpy as jnp

        model, params = lama
        rng = np.random.default_rng(0)
        image = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        mask = np.zeros((1, 32, 32, 1), dtype=np.float32)
        mask[:, 8:16, 8:16] = 1.0
        mask = jnp.asarray(mask)

        out = np.asarray(model.apply(params, image, mask))

        known = np.asarray(mask)[0, ..., 0] == 0
        np.testing.assert_allclose(out[0][known], np.asarray(image)[0][known], atol=1e-5)

    def test_folder_fallback_inpaints(self, tmp_path, rng):
        import cv2

        from hive_tpu.models.lama import lama_inpaint_folder

        image_dir = tmp_path / "rgb"
        mask_dir = tmp_path / "mask"
        out_dir = tmp_path / "out"
        image_dir.mkdir()
        mask_dir.mkdir()

        image = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        mask = np.zeros((32, 32), dtype=np.uint8)
        mask[8:16, 8:16] = 255

        cv2.imwrite(str(image_dir / "000000.jpg"), image)
        cv2.imwrite(str(mask_dir / "000000.png"), mask)

        lama_inpaint_folder(str(image_dir), str(mask_dir), str(out_dir))

        result = cv2.imread(str(out_dir / "000000.jpg"))
        assert result is not None
        assert result.shape == (32, 32, 3)
