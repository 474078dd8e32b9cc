import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mingraph_unet_tpu.models import losses
from mingraph_unet_tpu.models.detection import DetectionHead
from mingraph_unet_tpu.models.fusion import fuse_features

from conftest import requires_reference


def rng(seed=0):
    return np.random.default_rng(seed)


@pytest.fixture(autouse=True)
def _highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


class TestFusion:
    """Mirrors feature_fusion.py:165-231 self-tests (NHWC here)."""

    def test_per_pixel_fg(self):
        B, H, W = 2, 16, 16
        f_u1 = jnp.asarray(rng().random((B, H, W, 8)), jnp.float32)
        f_u2 = jnp.asarray(rng().random((B, H // 2, W // 2, 12)), jnp.float32)
        f_g = jnp.asarray(rng().random((B, H, W, 6)), jnp.float32)
        fused = fuse_features([f_u1, f_u2], f_g, target_spatial_size=(H, W))
        assert fused.shape == (B, H, W, 8 + 12 + 6)

    def test_per_region_fg_with_background(self):
        B, H, W, D = 2, 8, 8, 4
        f_u = jnp.asarray(rng(1).random((B, H, W, 5)), jnp.float32)
        f_g = jnp.asarray(rng(1).random((5, D)), jnp.float32)
        rmap = np.zeros((B, H, W), np.int32)
        rmap[0, :4, :4] = 0
        rmap[0, 4:, :4] = 1
        rmap[0, :, 4:] = 2
        rmap[1, :, :3] = 3
        rmap[1, :, 3:] = 4
        rmap[0, 0, 0] = -1  # background probe (feature_fusion.py:227-230)
        fused = fuse_features([f_u], f_g, (H, W), region_to_pixel_map=jnp.asarray(rmap))
        assert fused.shape == (B, H, W, 5 + D)
        # Background pixel gets zero graph features.
        np.testing.assert_allclose(np.asarray(fused[0, 0, 0, 5:]), 0.0)
        # A mapped pixel carries its region's embedding.
        np.testing.assert_allclose(
            np.asarray(fused[0, 5, 1, 5:]), np.asarray(f_g[1]), atol=1e-6
        )

    def test_add_fusion_requires_matching_dims(self):
        f_u = jnp.zeros((1, 4, 4, 3))
        f_g = jnp.zeros((1, 4, 4, 5))
        with pytest.raises(ValueError):
            fuse_features([f_u], f_g, fusion_method="add")
        out = fuse_features([f_u], jnp.zeros((1, 4, 4, 3)), fusion_method="add")
        assert out.shape == (1, 4, 4, 3)

    @requires_reference
    def test_bilinear_resize_matches_torch(self, reference_path):
        import torch
        import torch.nn.functional as F

        x = rng(2).random((1, 3, 5, 7)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x), size=(10, 14), mode="bilinear", align_corners=False
        ).numpy()
        ours = fuse_features(
            [jnp.asarray(x.transpose(0, 2, 3, 1))],
            jnp.zeros((1, 10, 14, 0), jnp.float32),
            target_spatial_size=(10, 14),
        )
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-5, rtol=1e-5
        )


class TestDetectionHead:
    """Mirrors detection_head.py:117-161 self-tests."""

    def test_map_input(self):
        head = DetectionHead(num_classes=1, fc_hidden_dim=64)
        x = jnp.asarray(rng(3).random((4, 8, 8, 32)), jnp.float32)
        v = head.init(jax.random.key(0), x)
        b, c = head.apply(v, x)
        assert b.shape == (4, 4) and c.shape == (4, 1)
        assert float(b.min()) >= 0 and float(b.max()) <= 1
        assert float(c.min()) >= 0 and float(c.max()) <= 1

    def test_flat_input(self):
        head = DetectionHead(num_classes=1, fc_hidden_dim=64, input_is_flat=True)
        x = jnp.asarray(rng(4).random((4, 128)), jnp.float32)
        v = head.init(jax.random.key(0), x)
        b, c = head.apply(v, x)
        assert b.shape == (4, 4) and c.shape == (4, 1)

    def test_multiclass(self):
        head = DetectionHead(num_classes=3, fc_hidden_dim=64)
        x = jnp.asarray(rng(5).random((2, 8, 8, 16)), jnp.float32)
        v = head.init(jax.random.key(0), x)
        b, c, cls = head.apply(v, x)
        assert cls.shape == (2, 3)

    def test_pre_pool_same_params_and_shapes(self):
        """The fast pre-pooled path keeps the identical parameter tree (only
        the conv-stack input resolution changes) and output contracts."""
        x = jnp.asarray(rng(7).random((2, 32, 32, 16)), jnp.float32)
        exact = DetectionHead(num_classes=1, fc_hidden_dim=64)
        fast = DetectionHead(num_classes=1, fc_hidden_dim=64, pre_pool_size=8)
        v_exact = exact.init(jax.random.key(0), x)
        v_fast = fast.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(v_exact) == jax.tree_util.tree_structure(v_fast)
        chex.assert_trees_all_equal_shapes(v_exact, v_fast)
        b, c = fast.apply(v_fast, x)
        assert b.shape == (2, 4) and c.shape == (2, 1)
        # No-op when the input is already at/below the pool size.
        small = jnp.asarray(rng(8).random((2, 8, 8, 16)), jnp.float32)
        b_fast, c_fast = fast.apply(v_fast, small)
        b_exact, c_exact = exact.apply(v_fast, small)
        np.testing.assert_allclose(np.asarray(b_fast), np.asarray(b_exact), rtol=1e-6)

    def test_dropout_active_in_train(self):
        head = DetectionHead(num_classes=1, fc_hidden_dim=64)
        x = jnp.asarray(rng(6).random((2, 8, 8, 16)), jnp.float32)
        v = head.init(jax.random.key(0), x)
        b1, _ = head.apply(
            v, x, train=True, rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"]
        )[0]
        b2, _ = head.apply(
            v, x, train=True, rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"]
        )[0]
        assert not np.allclose(np.asarray(b1), np.asarray(b2))


class TestFeatureConsistencyLoss:
    """Behavioral tests from feature_loss.py:149-163."""

    def test_positive_close_small(self):
        f_u = jnp.asarray(rng(7).random((2, 10, 16)), jnp.float32)
        f_g = f_u + 0.01
        y = jnp.ones((2, 10))
        loss = losses.feature_consistency_loss(f_u, f_g, y)
        assert float(loss) < 0.1

    def test_negative_far_hinge_inactive(self):
        f_u = jnp.asarray(rng(8).random((2, 10, 16)), jnp.float32)
        f_g = f_u + 5.0
        y = jnp.zeros((2, 10))
        loss = losses.feature_consistency_loss(f_u, f_g, y, margin=1.0)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_negative_close_hinge_active(self):
        f_u = jnp.asarray(rng(9).random((2, 10, 16)), jnp.float32)
        f_g = f_u + 0.01
        y = jnp.zeros((2, 10))
        loss = losses.feature_consistency_loss(f_u, f_g, y, margin=1.0)
        assert float(loss) > 0.5  # ~N * (margin - small)^2

    @requires_reference
    def test_matches_reference(self, reference_path):
        import torch
        from model.unet.feature_loss import FeatureConsistencyLoss

        B, N, D = 2, 10, 8
        f_u = rng(10).standard_normal((B, N, D)).astype(np.float32)
        f_g = rng(11).standard_normal((B, N, D)).astype(np.float32)
        y = rng(12).integers(0, 2, (B, N))
        ref = FeatureConsistencyLoss(margin=1.0)(
            torch.from_numpy(f_u), torch.from_numpy(f_g), torch.from_numpy(y)
        )
        ours = losses.feature_consistency_loss(
            jnp.asarray(f_u), jnp.asarray(f_g), jnp.asarray(y), margin=1.0
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


class TestTVLoss:
    @requires_reference
    def test_matches_reference(self, reference_path):
        import sys
        import torch

        sys.path.insert(0, "/root/reference/MinGraph-UNet/scripts")
        # TVLoss lives inside the training script; reimplement its 6-line
        # formula here to avoid importing the whole script module.
        x = rng(13).standard_normal((2, 1, 6, 7)).astype(np.float32)
        tx = torch.from_numpy(x)
        count_h = (6 - 1) * 7
        count_w = 6 * (7 - 1)
        h_tv = torch.pow(tx[:, :, 1:, :] - tx[:, :, :-1, :], 2).sum()
        w_tv = torch.pow(tx[:, :, :, 1:] - tx[:, :, :, :-1], 2).sum()
        ref = (h_tv / count_h + w_tv / count_w) / 2
        ours = losses.total_variation_loss(jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_constant_map_zero(self):
        x = jnp.full((2, 8, 8, 1), 3.0)
        np.testing.assert_allclose(float(losses.total_variation_loss(x)), 0.0, atol=1e-7)


class TestShapeLoss:
    """Behavioral tests from shape_loss.py:186-207."""

    def _ellipse_mask(self, h=64, w=64, ry=16, rx=21):
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        eq = ((yy - h // 2) / ry) ** 2 + ((xx - w // 2) / rx) ** 2
        return (eq <= 1).astype(np.float32)

    def test_ellipse_near_zero_square_larger(self):
        ellipse = self._ellipse_mask()
        square = np.zeros((64, 64), np.float32)
        square[16:48, 16:48] = 1
        l_e = losses.elliptical_shape_loss(jnp.asarray(ellipse)[None, None])
        l_s = losses.elliptical_shape_loss(jnp.asarray(square)[None, None])
        assert float(l_e) < float(l_s)

    def test_tiny_object_skipped(self):
        m = np.zeros((16, 16), np.float32)
        m[3, 3] = 1
        m[3, 4] = 1  # 2 px < min 10
        loss = losses.elliptical_shape_loss(jnp.asarray(m)[None, None])
        np.testing.assert_allclose(float(loss), 0.0)

    def test_empty_returns_zero(self):
        loss = losses.elliptical_shape_loss(jnp.zeros((1, 2, 16, 16)))
        np.testing.assert_allclose(float(loss), 0.0)

    @requires_reference
    def test_matches_reference(self, reference_path):
        import torch
        from model.unet.shape_loss import EllipticalShapeLoss

        ellipse = self._ellipse_mask()
        blob = np.zeros((64, 64), np.float32)
        blob[10:30, 20:55] = 1
        ref_fn = EllipticalShapeLoss()
        dummy_probs = torch.zeros(1, 2, 64, 64)
        for mask in (ellipse, blob):
            ref = ref_fn(dummy_probs, [[torch.from_numpy(mask.astype(bool))]])
            ours = losses.elliptical_shape_loss(jnp.asarray(mask)[None, None])
            np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4, atol=1e-6)

    def test_from_probs_semantic_path(self):
        probs = np.zeros((1, 32, 32, 2), np.float32)
        probs[..., 0] = 0.7
        probs[..., 1] = 0.3
        mask = self._ellipse_mask(32, 32, 8, 10).astype(bool)
        probs[0, mask, 1] = 0.8
        probs[0, mask, 0] = 0.2
        loss = losses.elliptical_shape_loss_from_probs(jnp.asarray(probs))
        assert float(loss) >= 0


class TestSoftShapeLoss:
    """elliptical_shape_loss_soft: gradient flows (round-1 weak #4) and
    matches the hard-mask loss when probabilities saturate."""

    def _square_logits(self, h=32, w=32, lo=-4.0, hi=4.0):
        logits = np.zeros((1, h, w, 2), np.float32)
        logits[..., 1] = lo
        logits[0, 8:24, 8:24, 1] = hi
        return jnp.asarray(logits)

    def test_gradient_nonzero_vs_hard_zero(self):
        logits = self._square_logits()

        def soft(lg):
            return losses.elliptical_shape_loss_soft(jax.nn.softmax(lg, axis=-1))

        def hard(lg):
            return losses.elliptical_shape_loss_from_probs(jax.nn.softmax(lg, axis=-1))

        g_soft = jax.grad(soft)(logits)
        g_hard = jax.grad(hard)(logits)
        assert float(jnp.abs(g_soft).sum()) > 0
        np.testing.assert_allclose(np.asarray(g_hard), 0.0)

    def test_matches_hard_when_saturated(self):
        logits = self._square_logits(lo=-50.0, hi=50.0)
        probs = jax.nn.softmax(logits, axis=-1)
        soft = losses.elliptical_shape_loss_soft(probs)
        hard = losses.elliptical_shape_loss_from_probs(probs)
        np.testing.assert_allclose(float(soft), float(hard), rtol=1e-4)

    def test_training_decreases_loss(self):
        """Gradient descent on the logits with λ1>0 reduces L_shape from a
        square blob toward an ellipse."""
        logits = self._square_logits()

        def loss_fn(lg):
            return losses.elliptical_shape_loss_soft(jax.nn.softmax(lg, axis=-1))

        step = jax.jit(lambda lg: lg - 50.0 * jax.grad(loss_fn)(lg))
        l0 = float(loss_fn(logits))
        for _ in range(20):
            logits = step(logits)
        l1 = float(loss_fn(logits))
        assert l1 < l0 * 0.9, (l0, l1)


class TestSoftInstanceShapeLoss:
    """elliptical_shape_loss_soft_instances (r4): the ellipse prior applies
    per predicted blob — two clean ellipses score near zero where the
    union-form soft loss (one ellipse fit to both) scores high — and the
    gradient still flows through the softmax."""

    def _two_ellipse_probs(self, sharp=True):
        import cv2

        m = np.zeros((64, 64), np.uint8)
        cv2.ellipse(m, (16, 20), (9, 6), 20, 0, 360, 1, -1)
        cv2.ellipse(m, (46, 44), (8, 5), 120, 0, 360, 1, -1)
        p1 = m.astype(np.float32) * (0.98 if sharp else 0.7) + 0.01
        probs = np.stack([1 - p1, p1], axis=-1)
        return jnp.asarray(probs)[None]

    def test_per_blob_shape_discrimination(self):
        """Each blob is judged on its OWN shape: two clean ellipses score
        like one clean ellipse (the loss's floor for a filled ellipse is
        ~2.3, not 0 — it is shape-discriminative, not absolute), and two
        squares score like one square (higher). The union form instead fits
        one covariance to the joint mass, so its gradient couples the blobs."""
        import cv2

        from mingraph_unet_tpu.models import losses

        probs_e = self._two_ellipse_probs()
        two_sq = np.zeros((64, 64), np.float32)
        two_sq[10:26, 10:26] = 1
        two_sq[40:60, 38:58] = 1
        probs_s = jnp.asarray(np.stack([1 - two_sq, two_sq], -1))[None]
        one = np.zeros((64, 64), np.uint8)
        cv2.ellipse(one, (32, 32), (12, 8), 0, 0, 360, 1, -1)
        single_e = float(
            losses.elliptical_shape_loss(jnp.asarray(one, jnp.float32)[None, None])
        )
        per_inst_e = float(losses.elliptical_shape_loss_soft_instances(probs_e))
        per_inst_s = float(losses.elliptical_shape_loss_soft_instances(probs_s))
        assert abs(per_inst_e - single_e) < 0.15 * single_e, (per_inst_e, single_e)
        assert per_inst_s > per_inst_e + 0.15, (per_inst_s, per_inst_e)

    def test_gradient_flows(self):
        from mingraph_unet_tpu.models import losses

        probs = self._two_ellipse_probs(sharp=False)
        logits = jnp.log(jnp.clip(probs, 1e-4, 1.0))

        def f(lg):
            return losses.elliptical_shape_loss_soft_instances(
                jax.nn.softmax(lg, axis=-1)
            )

        g = jax.grad(f)(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0.0

    def test_single_blob_matches_union_form(self):
        import cv2

        from mingraph_unet_tpu.models import losses

        m = np.zeros((48, 48), np.uint8)
        cv2.ellipse(m, (24, 24), (12, 8), 0, 0, 360, 1, -1)
        p1 = m.astype(np.float32) * 0.95 + 0.02
        probs = jnp.asarray(np.stack([1 - p1, p1], -1))[None]
        a = float(losses.elliptical_shape_loss_soft_instances(probs))
        b = float(losses.elliptical_shape_loss_soft(probs))
        # One component: per-instance decomposition ~= union form (the tiny
        # difference is the off-component probability mass the union form
        # includes and the decomposition masks away).
        assert abs(a - b) < 0.25 * max(b, 1e-3), (a, b)
