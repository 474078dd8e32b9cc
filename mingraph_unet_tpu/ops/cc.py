"""Connected components on binary masks, shape-static and jit-compatible.

The reference needs instance masks for the elliptical shape loss and yield
counting but defers to ``skimage.measure.label`` in comments and falls back to
a single foreground blob (``model/unet/shape_loss.py:95-112``). TPU-native
version: iterative min-label propagation over the 4-neighborhood accelerated
with pointer jumping (``label ← label[label]``), which converges in
O(log(diameter)) sweeps — all static shapes, usable under ``jit``/``vmap``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "label_components",
    "component_count",
    "top_instances",
    "instance_boxes",
]


def label_components(mask: jnp.ndarray, num_iters: int = 16) -> jnp.ndarray:
    """Label 4-connected components of a binary HW mask.

    Returns int32 HW labels: background = -1; each component carries the
    minimum linear index of its pixels (its "root"). ``num_iters`` sweeps of
    (neighbor-min + two pointer jumps) are run; 16 handles any component on
    grids up to ~64k diameter chains in practice (each sweep at least halves
    root distance thanks to the jumps).
    """
    h, w = mask.shape
    n = h * w
    fg = mask.astype(bool)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(n)  # sentinel larger than any label
    labels = jnp.where(fg, idx, big)

    def neighbor_min(lab):
        padded = jnp.pad(lab, 1, constant_values=big)
        up = padded[:-2, 1:-1]
        down = padded[2:, 1:-1]
        left = padded[1:-1, :-2]
        right = padded[1:-1, 2:]
        m = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        m = jnp.minimum(m, lab)
        return jnp.where(fg, m, big)

    def body(_, lab):
        # 1) Gather the 4-neighborhood minimum (incl. self).
        m = neighbor_min(lab)
        flat = lab.reshape(-1)
        mflat = m.reshape(-1)
        # 2) Hook: each pixel's current root adopts the pixel's neighborhood
        #    minimum (scatter-min into a bucket per root; bucket `n` collects
        #    background and is dropped).
        root = jnp.where(flat < n, flat, n)
        hook = jnp.full((n + 1,), big, jnp.int32).at[root].min(mflat)
        flat = jnp.minimum(mflat, hook[root])
        # 3) Pointer jumping: follow label chains (roots map to themselves),
        #    halving chain length each jump.
        for _ in range(2):
            ext = jnp.concatenate([flat, jnp.array([big], jnp.int32)])
            flat = jnp.minimum(flat, ext[jnp.where(flat < n, flat, n)])
        return flat.reshape(h, w)

    labels = jax.lax.fori_loop(0, num_iters, body, labels)
    return jnp.where(fg, labels, -1).astype(jnp.int32)


def component_count(labels: jnp.ndarray) -> jnp.ndarray:
    """Number of components: count of root pixels (label == own linear index)."""
    h, w = labels.shape
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    return jnp.sum((labels == idx) & (labels >= 0)).astype(jnp.int32)


def top_instances(
    labels: jnp.ndarray, max_objects: int, min_area: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract up to ``max_objects`` largest components as stacked masks.

    Returns:
        ``masks``: (max_objects, H, W) float32 binary instance masks (all-zero
        rows pad out unused slots).
        ``areas``: (max_objects,) float32 pixel counts (0 for unused slots).
    """
    h, w = labels.shape
    n = h * w
    flat = labels.reshape(-1)
    ids = jnp.where(flat >= 0, flat, n)
    areas_all = jnp.zeros((n + 1,), jnp.float32).at[ids].add(1.0)
    areas_all = areas_all.at[n].set(0.0)  # background bin
    top_areas, top_ids = jax.lax.top_k(areas_all, max_objects)
    keep = top_areas >= min_area
    masks = (labels[None, :, :] == top_ids[:, None, None]) & keep[:, None, None]
    return masks.astype(jnp.float32), jnp.where(keep, top_areas, 0.0)


def instance_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding boxes [x_min, y_min, x_max, y_max] for stacked instance masks.

    ``masks``: (O, H, W) binary. Empty masks yield all-zero boxes. Max bounds
    are exclusive-style pixel maxima (x_max = last column containing the
    object), matching the xyxy convention of ``experiments/metrics.py:142-157``.
    """
    o, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(bool)
    big = jnp.float32(1e9)
    y_min = jnp.min(jnp.where(m, ys, big), axis=(1, 2))
    x_min = jnp.min(jnp.where(m, xs, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m, ys, -1.0), axis=(1, 2))
    x_max = jnp.max(jnp.where(m, xs, -1.0), axis=(1, 2))
    any_px = m.any(axis=(1, 2))
    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_px[:, None], boxes, 0.0)
