import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mingraph_unet_tpu.ops import filters, image


def rng(seed=0):
    return np.random.default_rng(seed)


class TestResizeNormalize:
    def test_normalize_roundtrip(self):
        img = jnp.asarray(rng().random((8, 8, 3)), jnp.float32)
        n = image.normalize(img, image.IMAGENET_MEAN, image.IMAGENET_STD)
        d = image.denormalize(n, image.IMAGENET_MEAN, image.IMAGENET_STD)
        np.testing.assert_allclose(np.asarray(d), np.asarray(img), atol=1e-6)

    def test_resize_nearest_matches_cv2(self):
        mask = rng().integers(0, 4, size=(37, 53)).astype(np.uint8)
        ours = np.asarray(image.resize_nearest(jnp.asarray(mask.astype(np.int32)), (16, 24)))
        ref = cv2.resize(mask, (24, 16), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(ours, ref.astype(np.int32))

    def test_resize_nearest_batched(self):
        masks = rng().integers(0, 4, size=(2, 32, 32)).astype(np.int32)
        out = image.resize_nearest(jnp.asarray(masks), (16, 16))
        assert out.shape == (2, 16, 16)

    def test_preprocess_mask_clips(self):
        mask = jnp.asarray(np.full((10, 10), 7, np.int32))
        out = image.preprocess_mask(mask, (10, 10), num_classes=2)
        assert int(out.max()) == 1

    def test_resize_bilinear_shape_and_range(self):
        img = jnp.asarray(rng().random((64, 48, 3)), jnp.float32)
        out = image.resize_bilinear(img, (32, 24))
        assert out.shape == (32, 24, 3)
        assert float(out.min()) >= -1e-6 and float(out.max()) <= 1 + 1e-6


class TestAugment:
    def test_flip_synced(self):
        img = jnp.asarray(rng().random((8, 8, 3)), jnp.float32)
        mask = jnp.asarray(rng().integers(0, 2, (8, 8)), jnp.int32)
        # Key chosen so that flips definitely happen with prob=1.
        i2, m2 = image.random_horizontal_flip(jax.random.key(0), img, mask, prob=1.0)
        np.testing.assert_allclose(np.asarray(i2), np.asarray(img[:, ::-1, :]))
        np.testing.assert_array_equal(np.asarray(m2), np.asarray(mask[:, ::-1]))

    def test_rotation_zero_angle_identity(self):
        img = jnp.asarray(rng().random((16, 16, 3)), jnp.float32)
        mask = jnp.asarray(rng().integers(0, 2, (16, 16)), jnp.int32)
        i2, m2 = image.random_rotation(jax.random.key(0), img, mask, degrees=0.0)
        np.testing.assert_allclose(np.asarray(i2), np.asarray(img), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(m2), np.asarray(mask))

    def test_rotation_keeps_mask_labels(self):
        img = jnp.zeros((32, 32, 3), jnp.float32)
        mask = jnp.asarray(rng().integers(0, 3, (32, 32)), jnp.int32)
        _, m2 = image.random_rotation(jax.random.key(3), img, mask, degrees=15.0)
        assert set(np.unique(np.asarray(m2))).issubset({0, 1, 2})

    def test_random_resized_crop_identity_when_off(self):
        img = jnp.asarray(rng(11).random((16, 16, 3)), jnp.float32)
        mask = jnp.asarray(rng(11).integers(0, 2, (16, 16)), jnp.int32)
        i2, m2 = image.random_resized_crop(jax.random.key(0), img, mask, prob=0.0)
        np.testing.assert_allclose(np.asarray(i2), np.asarray(img), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(m2), np.asarray(mask))

    def test_random_resized_crop_synced_and_valid(self):
        img = jnp.asarray(rng(12).random((32, 32, 3)), jnp.float32)
        mask = (img[..., 0] > 0.5).astype(jnp.int32)
        i2, m2 = image.random_resized_crop(jax.random.key(5), img, mask, prob=1.0)
        assert i2.shape == img.shape and m2.shape == mask.shape
        # Mask stays binary and roughly tracks the image threshold (synced).
        assert set(np.unique(np.asarray(m2))).issubset({0, 1})
        agree = ((np.asarray(i2)[..., 0] > 0.5) == np.asarray(m2)).mean()
        assert agree > 0.8

    def test_augment_pair_jits(self):
        f = jax.jit(lambda k, i, m: image.augment_pair(k, i, m))
        img = jnp.asarray(rng().random((16, 16, 3)), jnp.float32)
        mask = jnp.asarray(rng().integers(0, 2, (16, 16)), jnp.int32)
        i2, m2 = f(jax.random.key(1), img, mask)
        assert i2.shape == img.shape and m2.shape == mask.shape


class TestSobel:
    def test_matches_cv2(self):
        img = rng(1).integers(0, 256, (40, 52, 3)).astype(np.uint8)
        ours = np.asarray(filters.sobel_magnitude(jnp.asarray(img), ksize=3))
        # Reference computation (edge_detection.py:14-44).
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        gx = cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3)
        gy = cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)
        mag = np.sqrt(gx**2 + gy**2)
        ref = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
        # Interior must agree almost exactly; cv2's gray conversion rounds to
        # uint8 first, ours keeps float -- tolerance covers that.
        diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert diff.mean() < 1.5
        assert np.median(diff) < 1.0

    def test_batched(self):
        imgs = rng(2).integers(0, 256, (3, 16, 16, 3)).astype(np.uint8)
        out = filters.sobel_magnitude(jnp.asarray(imgs))
        assert out.shape == (3, 16, 16)

    def test_patch_mean_flat_lowering_matches_reference_chain(self):
        """sobel_patch_mean (full-lane flat-view production path) equals
        patch_reduce_mean(sobel_magnitude(...)/255) to fp32 rounding."""
        from mingraph_unet_tpu.ops.patches import patch_reduce_mean

        imgs = jnp.asarray(rng(7).uniform(0, 255, (2, 64, 96, 3)), jnp.float32)
        ref = patch_reduce_mean(filters.sobel_magnitude(imgs)[..., None] / 255.0, 16)
        new = filters.sobel_patch_mean(imgs, 16)
        np.testing.assert_allclose(np.asarray(new), np.asarray(ref), atol=2e-6)

    def test_patch_mean_flat_nondivisible_ksize_falls_back(self):
        from mingraph_unet_tpu.ops.patches import patch_reduce_mean

        imgs = jnp.asarray(rng(8).uniform(0, 255, (1, 32, 32, 3)), jnp.float32)
        ref = patch_reduce_mean(
            filters.sobel_magnitude(imgs, ksize=5)[..., None] / 255.0, 8
        )
        new = filters.sobel_patch_mean(imgs, 8, ksize=5)
        np.testing.assert_allclose(np.asarray(new), np.asarray(ref), atol=2e-6)


class TestHistEq:
    def test_gray_matches_cv2(self):
        img = rng(3).integers(0, 200, (64, 64)).astype(np.uint8)
        ours = np.asarray(filters.equalize_histogram_gray(jnp.asarray(img)))
        ref = cv2.equalizeHist(img)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_rgb_close_to_cv2(self):
        img = rng(4).integers(0, 256, (32, 32, 3)).astype(np.uint8)
        ours = np.asarray(filters.equalize_histogram_rgb(jnp.asarray(img))).astype(int)
        yuv = cv2.cvtColor(img, cv2.COLOR_RGB2YUV)
        yuv[..., 0] = cv2.equalizeHist(yuv[..., 0])
        ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB).astype(int)
        # cv2 uses fixed-point integer YUV; allow small per-pixel differences.
        assert np.abs(ours - ref).mean() < 3.0


class TestGaussian:
    def test_matches_cv2(self):
        img = rng(5).integers(0, 256, (33, 47, 3)).astype(np.uint8)
        ours = np.asarray(filters.gaussian_blur(jnp.asarray(img), (5, 5), 1.0)).astype(int)
        ref = cv2.GaussianBlur(img, (5, 5), 1.0).astype(int)
        assert np.abs(ours - ref).max() <= 1

    def test_float_passthrough_dtype(self):
        img = jnp.asarray(rng(6).random((16, 16, 3)), jnp.float32)
        out = filters.gaussian_blur(img, (3, 3), 0.8)
        assert out.dtype == jnp.float32
