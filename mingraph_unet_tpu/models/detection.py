"""Detection head: fused features → bbox + confidence (+ class scores).

Re-design of ``model/fusion_detection/detection_head.py:4-114``. Architecture
preserved — Conv(C→C/2) → ReLU → BN → Conv(C/2→C/4) → ReLU → BN → global
average pool, then FC(fc_hidden) → ReLU → Dropout(0.5) → FC(fc_hidden/2) →
ReLU → Dropout(0.5), with sigmoid bbox (B, 4), sigmoid confidence (B, 1) and
optional class scores (B, num_classes) when ``num_classes > 1``. Note the
reference's (unusual) Conv→ReLU→BN ordering is kept for parity. Single box
per image by design (an explicit simplification there, docstring lines
82-89); multi-instance detection in this framework is provided separately via
connected-component instancing (:mod:`mingraph_unet_tpu.ops.cc`).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["DetectionHead"]


class DetectionHead(nn.Module):
    num_classes: int = 1
    fc_hidden_dim: int = 256
    input_is_flat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f_fused: jnp.ndarray, train: bool = False):
        x = f_fused.astype(self.dtype)
        if not self.input_is_flat:
            c = x.shape[-1]
            x = nn.Conv(c // 2, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn1"
            )(x)
            x = nn.Conv(c // 4, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn2"
            )(x)
            x = x.mean(axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) + flatten
        # FC trunk
        x = nn.Dense(self.fc_hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, name="drop1")(x, deterministic=not train)
        x = nn.Dense(self.fc_hidden_dim // 2, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, name="drop2")(x, deterministic=not train)

        bboxes = nn.sigmoid(nn.Dense(4, dtype=self.dtype, name="fc_bbox")(x).astype(jnp.float32))
        confidence = nn.sigmoid(
            nn.Dense(1, dtype=self.dtype, name="fc_confidence")(x).astype(jnp.float32)
        )
        if self.num_classes > 1:
            class_scores = nn.Dense(
                self.num_classes, dtype=self.dtype, name="fc_class_scores"
            )(x).astype(jnp.float32)
            return bboxes, confidence, class_scores
        return bboxes, confidence
