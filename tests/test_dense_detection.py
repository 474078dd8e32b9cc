"""Multi-box dense detection head: boxes ops, NMS, decode, loss, overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mingraph_unet_tpu.models.detection import (
    DenseDetectionHead,
    decode_dense_detections,
    dense_detection_loss,
)
from mingraph_unet_tpu.ops.boxes import box_iou_matrix, cxcywh_to_xyxy, nms, xyxy_to_cxcywh


class TestBoxOps:
    def test_roundtrip(self):
        b = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
        np.testing.assert_allclose(np.asarray(cxcywh_to_xyxy(xyxy_to_cxcywh(b))), np.asarray(b))

    def test_iou_matrix(self):
        a = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
        m = np.asarray(box_iou_matrix(a, a))
        np.testing.assert_allclose(m, np.eye(2), atol=1e-6)

    def test_nms_suppresses_overlaps(self):
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
        )
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep, _ = nms(boxes, scores, iou_threshold=0.5)
        np.testing.assert_array_equal(np.asarray(keep), [True, False, True])

    def test_nms_keeps_all_disjoint(self):
        boxes = jnp.asarray([[0, 0, 5, 5], [10, 10, 15, 15], [20, 20, 25, 25]], jnp.float32)
        keep, _ = nms(boxes, jnp.asarray([0.1, 0.9, 0.5]), iou_threshold=0.5)
        assert bool(keep.all())


class TestDenseHead:
    def test_shapes_and_decode(self):
        head = DenseDetectionHead(cell_size=16, hidden=16)
        x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 12)), jnp.float32)
        v = jax.jit(head.init)(jax.random.key(0), x)
        out = head.apply(v, x)
        assert out["objectness_logits"].shape == (2, 4, 4)
        assert out["boxes"].shape == (2, 4, 4, 4)
        boxes, scores, valid = decode_dense_detections(
            out["objectness_logits"], out["boxes"], (64, 64), 16, top_k=8,
            score_threshold=0.0,
        )
        assert boxes.shape == (2, 8, 4) and scores.shape == (2, 8) and valid.shape == (2, 8)

    def test_loss_targets(self):
        # One instance centered in cell (1, 2) of a 4x4 grid (cell 16).
        masks = np.zeros((1, 2, 64, 64), np.float32)
        masks[0, 0, 20:28, 36:44] = 1.0  # center ~ (24, 40) -> cell y=1, x=2
        outputs = {
            "objectness_logits": jnp.full((1, 4, 4), -5.0),
            "boxes": jnp.full((1, 4, 4, 4), 0.5),
        }
        obj_bce, box_l1 = dense_detection_loss(outputs, jnp.asarray(masks), 16)
        assert float(obj_bce) > 0 and float(box_l1) > 0
        # Perfect logits at the target cell reduce the BCE.
        good_logits = jnp.full((1, 4, 4), -10.0).at[0, 1, 2].set(10.0)
        obj_bce2, _ = dense_detection_loss(
            {**outputs, "objectness_logits": good_logits}, jnp.asarray(masks), 16
        )
        assert float(obj_bce2) < float(obj_bce)

    def test_overfit_single_example(self):
        # The head must be able to learn one fixed instance layout.
        import optax

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 64, 64, 8)), jnp.float32)
        masks = np.zeros((1, 3, 64, 64), np.float32)
        masks[0, 0, 4:14, 4:14] = 1
        masks[0, 1, 40:52, 44:60] = 1
        gt = jnp.asarray(masks)
        head = DenseDetectionHead(cell_size=16, hidden=16)
        v = jax.jit(head.init)(jax.random.key(0), x)
        tx = optax.adam(1e-2)
        opt = tx.init(v["params"])

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                out = head.apply({"params": p}, x)
                a, b = dense_detection_loss(out, gt, 16)
                return a + b
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        params = v["params"]
        for _ in range(300):
            params, opt, loss = step(params, opt)
        out = head.apply({"params": params}, x)
        boxes, scores, valid = decode_dense_detections(
            out["objectness_logits"], out["boxes"], (64, 64), 16, top_k=8,
            score_threshold=0.5,
        )
        n_det = int(np.asarray(valid[0]).sum())
        assert n_det == 2, f"expected 2 detections, got {n_det}"
        # Detected boxes overlap the GT instances.
        from mingraph_unet_tpu.ops.cc import instance_boxes

        gt_boxes = np.asarray(instance_boxes(gt[0]))[:2]
        det = np.asarray(boxes[0])[np.asarray(valid[0])]
        ious = np.asarray(box_iou_matrix(jnp.asarray(det), jnp.asarray(gt_boxes)))
        assert (ious.max(axis=1) > 0.4).all()
