"""Box utilities: IoU matrices and jit-compatible NMS.

Shape-static building blocks for multi-instance detection (the capability
the reference's single-box head explicitly lacks, ``detection_head.py``
docstring lines 82-89). Boxes are xyxy unless noted.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["box_iou_matrix", "nms", "cxcywh_to_xyxy", "xyxy_to_cxcywh"]


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: a (..., N, 4) × b (..., M, 4) → (..., N, M), xyxy."""
    a = a[..., :, None, :]
    b = b[..., None, :, :]
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


@partial(jax.jit, static_argnames=("iou_threshold",))
def nms(
    boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy non-maximum suppression over a fixed-size candidate set.

    Args:
        boxes: (K, 4) xyxy; scores: (K,).
    Returns:
        ``keep`` (K,) bool mask of survivors and ``order`` (K,) the
        score-descending candidate order. Fully shape-static: iterate the
        sorted list, suppressing later boxes overlapping a kept earlier box.
    """
    k = boxes.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    iou = box_iou_matrix(sorted_boxes, sorted_boxes)  # (K, K)

    def body(i, keep):
        # Suppress j > i only if box i is itself kept.
        suppress = (iou[i] >= iou_threshold) & (jnp.arange(k) > i) & keep[i]
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
    # Map back to original indexing.
    keep = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    return keep, order
