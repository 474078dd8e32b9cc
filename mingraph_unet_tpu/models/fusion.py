"""Feature fusion: multi-scale U-Net features ⊕ graph embeddings.

TPU-native re-design of ``model/fusion_detection/feature_fusion.py:5-162``:

- Multi-scale ``F_u`` maps are bilinear-resized (half-pixel centers ==
  ``align_corners=False``, line 70) to a common size and channel-concatenated.
- Per-region ``F_g (R, D)`` plus an integer ``region_to_pixel_map (B, H, W)``
  broadcasts region embeddings to pixels. The reference does this with a
  per-batch Python loop + masked gather/scatter (lines 81-140); here it is a
  single one-hot matmul (MXU) with invalid/-1 indices yielding zeros.
- Per-pixel ``F_g (B, H, W, D)`` is just resized.
- Fusion method: "concat" (default) or "add" (dims must match; lines 151-160).

Stateless (no parameters) — kept as a Module for API symmetry.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mingraph_unet_tpu.ops.image import resize_bilinear
from mingraph_unet_tpu.ops.segment import gather_rows

__all__ = ["FeatureFusion", "fuse_features"]


def _resize_feature_map(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear, no antialias — semantics of ``F.interpolate(...,
    mode='bilinear', align_corners=False)``."""
    if (x.shape[1], x.shape[2]) == tuple(size):
        return x
    return jax.image.resize(
        x, (x.shape[0], size[0], size[1], x.shape[-1]), method="linear", antialias=False
    )


def fuse_features(
    f_u_list: Sequence[jnp.ndarray],
    f_g: jnp.ndarray,
    target_spatial_size: Optional[Tuple[int, int]] = None,
    region_to_pixel_map: Optional[jnp.ndarray] = None,
    fusion_method: str = "concat",
) -> jnp.ndarray:
    """Fuse U-Net scales with graph embeddings. All NHWC.

    Args:
        f_u_list: list of (B, H_i, W_i, C_i) U-Net feature maps.
        f_g: (R, D) per-region table (requires ``region_to_pixel_map``) or
            (B, H, W, D) per-pixel map.
        target_spatial_size: output (H, W); defaults to the first F_u's.
        region_to_pixel_map: (B, H, W) int region indices into ``f_g``;
            entries outside [0, R) produce zero features.
        fusion_method: "concat" or "add".
    """
    if target_spatial_size is None:
        target_spatial_size = (f_u_list[0].shape[1], f_u_list[0].shape[2])
    h, w = target_spatial_size
    f_u_combined = jnp.concatenate(
        [_resize_feature_map(f, (h, w)) for f in f_u_list], axis=-1
    )

    if f_g.ndim == 2:
        if region_to_pixel_map is None:
            raise ValueError("per-region f_g requires region_to_pixel_map")
        rmap = region_to_pixel_map.astype(jnp.int32)
        b = rmap.shape[0]
        num_regions = f_g.shape[0]
        flat = rmap.reshape(b, -1)
        # Out-of-range (incl. -1 background) → all-zero one-hot row → zeros.
        flat = jnp.where((flat >= 0) & (flat < num_regions), flat, -1)
        gathered = gather_rows(f_g, flat)  # (B, H*W, D)
        f_g_aligned = gathered.reshape(b, rmap.shape[1], rmap.shape[2], f_g.shape[-1])
        if (rmap.shape[1], rmap.shape[2]) != (h, w):
            f_g_aligned = _resize_feature_map(f_g_aligned, (h, w))
    elif f_g.ndim == 4:
        f_g_aligned = _resize_feature_map(f_g, (h, w))
    else:
        raise ValueError(
            f"f_g has unsupported shape {f_g.shape}; expected (R, D) with a "
            "region map or (B, H, W, D)."
        )

    method = fusion_method.lower()
    if method == "concat":
        return jnp.concatenate([f_u_combined, f_g_aligned], axis=-1)
    if method == "add":
        if f_u_combined.shape[-1] != f_g_aligned.shape[-1]:
            raise ValueError("Channel dimensions must match for 'add' fusion")
        return f_u_combined + f_g_aligned
    raise NotImplementedError(f"Fusion method {fusion_method!r} not implemented.")


class FeatureFusion(nn.Module):
    """Module wrapper over :func:`fuse_features` (API parity with the
    reference class; it holds no parameters either)."""

    fusion_method: str = "concat"

    def __call__(
        self,
        f_u_list: Sequence[jnp.ndarray],
        f_g: jnp.ndarray,
        target_spatial_size: Optional[Tuple[int, int]] = None,
        region_to_pixel_map: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return fuse_features(
            f_u_list, f_g, target_spatial_size, region_to_pixel_map, self.fusion_method
        )
