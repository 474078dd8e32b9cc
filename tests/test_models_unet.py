import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mingraph_unet_tpu.models.unet import UNet, UNetEncoder
from mingraph_unet_tpu.models import losses

from conftest import requires_reference


class TestMaxPool2x2:
    def test_matches_reduce_window_even_and_odd(self):
        import flax.linen as nn

        from mingraph_unet_tpu.models.unet import _max_pool_2x2

        r = np.random.default_rng(0)
        for shape in [(2, 8, 8, 5), (1, 9, 7, 3)]:
            x = jnp.asarray(r.standard_normal(shape), jnp.float32)
            ref = nn.max_pool(x, (2, 2), strides=(2, 2))
            np.testing.assert_array_equal(np.asarray(_max_pool_2x2(x)), np.asarray(ref))


class TestShapes:
    """Shape-schedule tests from unet_encoder.py:88-93 / unet_decoder.py:171-175
    (NCHW there → NHWC here)."""

    def test_encoder_schedule_default(self):
        # Channel/stride schedule from unet_encoder.py:88-93; evaluated at 32²
        # with eval_shape (no compile) — the schedule is input-size relative.
        enc = UNetEncoder(init_features=32, depth=4)
        x = jnp.zeros((2, 32, 32, 3))
        variables = jax.eval_shape(lambda: enc.init(jax.random.key(0), x))
        skips, bottleneck, _ = jax.eval_shape(
            lambda v: enc.apply(v, x), variables
        )
        expected = [(2, 32, 32, 32), (2, 16, 16, 64), (2, 8, 8, 128), (2, 4, 4, 256)]
        assert [s.shape for s in skips] == expected
        assert bottleneck.shape == (2, 2, 2, 512)

    def test_encoder_schedule_depth2(self):
        enc = UNetEncoder(init_features=64, depth=2)
        x = jnp.zeros((2, 32, 32, 3))
        variables = jax.eval_shape(lambda: enc.init(jax.random.key(0), x))
        skips, bottleneck, _ = jax.eval_shape(lambda v: enc.apply(v, x), variables)
        assert [s.shape for s in skips] == [(2, 32, 32, 64), (2, 16, 16, 128)]
        assert bottleneck.shape == (2, 8, 8, 256)

    def test_unet_full(self):
        # F_u schedule from unet_decoder.py:171-175 (shallow→deep).
        model = UNet(num_classes=5, init_features=32, depth=4)
        x = jnp.zeros((2, 32, 32, 3))
        variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
        logits, skips, f_u = jax.eval_shape(lambda v: model.apply(v, x), variables)
        assert logits.shape == (2, 32, 32, 5)
        assert [f.shape for f in f_u] == [
            (2, 32, 32, 32),
            (2, 16, 16, 64),
            (2, 8, 8, 128),
            (2, 4, 4, 256),
        ]

    def test_odd_input_size(self):
        # 36x36 at depth 3 → 36→18→9→(pool)4, upsample 8 vs skip 9: decoder
        # must pad the odd mismatch (unet_decoder.py:44-50 semantics).
        model = UNet(num_classes=2, init_features=4, depth=3)
        x = jnp.zeros((1, 36, 36, 3))
        variables = model.init(jax.random.key(0), x)
        logits, _, _ = model.apply(variables, x)
        assert logits.shape == (1, 36, 36, 2)

    def test_train_mode_updates_batch_stats(self):
        model = UNet(num_classes=2, init_features=8, depth=2)
        x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
        variables = model.init(jax.random.key(0), x)
        _, new_state = model.apply(variables, x, train=True, mutable=["batch_stats"])
        before = variables["batch_stats"]["encoder"]["block0"]["bn1"]["mean"]
        after = new_state["batch_stats"]["encoder"]["block0"]["bn1"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_bf16_compute(self):
        model = UNet(num_classes=2, init_features=8, depth=2, dtype=jnp.bfloat16)
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.key(0), x)
        logits, _, f_u = model.apply(variables, x)
        assert logits.dtype == jnp.float32  # logits promoted back
        # params stay fp32
        k = variables["params"]["encoder"]["block0"]["conv1"]["kernel"]
        assert k.dtype == jnp.float32


@requires_reference
class TestTorchParity:
    def test_forward_parity_eval(self, reference_path):
        import torch
        from model.unet.unet_model import UNet as TorchUNet

        from torch_bridge import copy_unet

        depth, feats, ncls = 3, 8, 2
        model = UNet(num_classes=ncls, init_features=feats, depth=depth)
        x_np = np.random.default_rng(0).standard_normal((1, 3, 32, 32)).astype(np.float32)
        x_nhwc = jnp.asarray(x_np.transpose(0, 2, 3, 1))
        variables = model.init(jax.random.key(0), x_nhwc)

        t_model = TorchUNet(in_channels=3, num_classes=ncls, init_features=feats, depth=depth)
        copy_unet(t_model, variables, depth=depth)
        t_model.eval()
        with torch.no_grad():
            t_logits, t_skips, t_fu = t_model(torch.from_numpy(x_np))

        # Exact-precision convs for the fp32 parity check (the CPU backend's
        # default fast path downcasts accumulation).
        with jax.default_matmul_precision("highest"):
            logits, skips, f_u = model.apply(variables, x_nhwc, train=False)
        np.testing.assert_allclose(
            np.asarray(logits).transpose(0, 3, 1, 2), t_logits.numpy(), atol=2e-4, rtol=1e-4
        )
        for ours, theirs in zip(skips, t_skips):
            np.testing.assert_allclose(
                np.asarray(ours).transpose(0, 3, 1, 2), theirs.numpy(), atol=2e-4, rtol=1e-4
            )
        for ours, theirs in zip(f_u, t_fu):
            np.testing.assert_allclose(
                np.asarray(ours).transpose(0, 3, 1, 2), theirs.numpy(), atol=2e-4, rtol=1e-4
            )

    def test_miou_parity_with_reference(self, reference_path):
        """The BASELINE headline claim: same weights → identical predicted
        label maps → identical mIoU between this framework's U-Net and the
        PyTorch reference."""
        import torch
        from model.unet.unet_model import UNet as TorchUNet

        from torch_bridge import copy_unet
        from mingraph_unet_tpu.experiments.metrics import segmentation_metrics

        depth, feats = 2, 8
        model = UNet(num_classes=2, init_features=feats, depth=depth)
        rng = np.random.default_rng(42)
        x_np = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
        gt = rng.integers(0, 2, (4, 32, 32))
        variables = model.init(jax.random.key(1), jnp.asarray(x_np.transpose(0, 2, 3, 1)))

        t_model = TorchUNet(in_channels=3, num_classes=2, init_features=feats, depth=depth)
        copy_unet(t_model, variables, depth=depth)
        t_model.eval()
        with torch.no_grad():
            t_logits, _, _ = t_model(torch.from_numpy(x_np))
        t_pred = t_logits.argmax(1).numpy()

        with jax.default_matmul_precision("highest"):
            logits, _, _ = model.apply(variables, jnp.asarray(x_np.transpose(0, 2, 3, 1)))
        our_pred = np.asarray(logits.argmax(-1))

        np.testing.assert_array_equal(our_pred, t_pred)
        ours = segmentation_metrics(gt.ravel(), our_pred.ravel(), 2)
        theirs = segmentation_metrics(gt.ravel(), t_pred.ravel(), 2)
        assert ours["mean_iou"] == theirs["mean_iou"]

    def test_dice_loss_parity(self, reference_path):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        logits = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)  # B,C,H,W
        labels = rng.integers(0, 3, (2, 8, 8))

        # Reference formula (train_segmentation.py:29-40), with its missing-F
        # import fixed.
        pred = torch.softmax(torch.from_numpy(logits), dim=1)
        onehot = F.one_hot(torch.from_numpy(labels), num_classes=3).permute(0, 3, 1, 2).float()
        inter = (pred * onehot).sum(dim=(2, 3))
        union = pred.sum(dim=(2, 3)) + onehot.sum(dim=(2, 3))
        ref = 1.0 - ((2 * inter + 1.0) / (union + 1.0)).mean()

        ours = losses.dice_loss(
            jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(labels)
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_cross_entropy_parity(self, reference_path):
        import torch

        rng = np.random.default_rng(2)
        logits = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
        labels = rng.integers(0, 4, (2, 8, 8))
        ref = torch.nn.functional.cross_entropy(
            torch.from_numpy(logits), torch.from_numpy(labels)
        )
        ours = losses.cross_entropy_loss(
            jnp.asarray(logits.transpose(0, 2, 3, 1)), jnp.asarray(labels)
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
