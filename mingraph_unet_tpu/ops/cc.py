"""Connected components on binary masks, shape-static and jit-compatible.

The reference needs instance masks for the elliptical shape loss and yield
counting but defers to ``skimage.measure.label`` in comments and falls back to
a single foreground blob (``model/unet/shape_loss.py:95-112``). TPU-native
version: iterative min-label propagation over the 4-neighborhood accelerated
with pointer jumping (``label ← label[label]``), which converges in
O(log(diameter)) sweeps — all static shapes, usable under ``jit``/``vmap``.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "label_components",
    "label_components_stencil",
    "component_count",
    "top_instances",
    "top_instances_dense",
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


def label_components_stencil(mask: jnp.ndarray, num_iters: int = 128) -> jnp.ndarray:
    """Bounded-diameter CC labeling with NO scatter/gather — the in-step form.

    Same output convention as :func:`label_components` (background −1, each
    component labeled by its minimum linear index), and bit-identical to it
    whenever every component's geodesic diameter is ≤ ``num_iters``:
    ``num_iters`` sweeps of pure 4-neighbor min propagation reach exactly
    that far. Components with longer internal paths (snaking shapes) come
    out SPLIT into several labels — acceptable for the training-step
    instance proxies this exists for (fruit are compact); whole-image
    counting keeps :func:`label_components`.

    Why it exists (r4, measured on v5e through the axon relay): the
    hook-and-jump form's per-sweep ``.at[root].min`` scatter and pointer-
    jump gathers serialize on TPU — 188 ms at 16×128², 1102 ms at 8×512² —
    and were the ENTIRE training-step regression when CC moved in-step.
    This stencil form is pad+shift+minimum only (VPU-vectorized, XLA fuses
    each sweep); 128 sweeps measure at the relay dispatch floor (~0 ms
    on-device) at both shapes.
    """
    h, w = mask.shape
    n = h * w
    fg = mask.astype(bool)
    big = jnp.int32(n)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(fg, idx, big)

    def body(_, lab):
        p = jnp.pad(lab, 1, constant_values=big)
        m = jnp.minimum(
            jnp.minimum(p[:-2, 1:-1], p[2:, 1:-1]),
            jnp.minimum(p[1:-1, :-2], p[1:-1, 2:]),
        )
        return jnp.where(fg, jnp.minimum(lab, m), big)

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


def top_instances_dense(
    labels: jnp.ndarray,
    max_objects: int,
    min_area: int = 1,
    candidates: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter-free :func:`top_instances` — the in-step form.

    The exact form's per-label area histogram is one ``.at[ids].add``
    scatter over H·W+1 buckets: ~16 ms on-device at 512² on v5e (r4 probe),
    which dominates a training step when instancing runs per step. This
    form never scatters:

    1. Roots are found densely (``labels == own index``).
    2. A compactness prefilter keeps roots whose local foreground mass
       (integral-image box sum, window ~2·√min_area+1 anchored at the root,
       which is the component's topmost pixel) reaches ``min_area`` —
       rejecting speckle roots without knowing exact areas.
    3. The first ``candidates`` surviving roots in raster order get EXACT
       areas via dense label comparison (C·H·W elementwise ops, no
       scatter), and the final ``max_objects`` are the largest of those.

    Bit-identical to :func:`top_instances` whenever the image has at most
    ``candidates`` surviving components and every real component is compact
    enough for the prefilter (fruit are). Beyond that it degrades to
    raster-first selection — a documented training-proxy divergence; exact
    selection (eval counting, noisy-label regimes) keeps
    :func:`top_instances`.
    """
    h, w = labels.shape
    n = h * w
    cand = candidates or max(4 * max_objects, 16)
    fg = labels >= 0
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    roots = fg & (labels == idx)

    # Integral image of the foreground; box sums by four shifted slices.
    side = 2 * int(math.isqrt(max(min_area - 1, 0))) + 3  # ≥ compact extent
    r = side // 2
    integ = jnp.pad(
        jnp.cumsum(jnp.cumsum(fg.astype(jnp.float32), 0), 1), ((1, 0), (1, 0))
    )
    # Window rows [y, y+side), cols [x-r, x+r] — top-anchored because the
    # root is the component's topmost(-leftmost) pixel. Edge-replicated pad
    # of the integral image implements the boundary clamping.
    ext = jnp.pad(integ, ((0, side), (r, r + 1)), mode="edge")
    mass = (
        ext[side : side + h, 2 * r + 1 : 2 * r + 1 + w]
        - ext[0:h, 2 * r + 1 : 2 * r + 1 + w]
        - ext[side : side + h, 0:w]
        + ext[0:h, 0:w]
    )

    score = jnp.where(roots & (mass >= min_area), n - idx, 0)
    # Two-stage blocked top_k: a flat top_k over H·W lowers to one full
    # sort (traced 2.0 ms/step at 512² b8 inside the e2e train step); the
    # global top-``cand`` elements are each top-``cand`` within their block,
    # so per-block top_k (many short sorts) + a top_k over the survivors is
    # exact whenever block ≥ cand.
    flat_score = score.reshape(-1)
    block = 2048
    if n % block == 0 and block >= cand:
        s1, _ = jax.lax.top_k(flat_score.reshape(n // block, block), cand)
        top_scores, _ = jax.lax.top_k(s1.reshape(-1), cand)
    else:
        top_scores, _ = jax.lax.top_k(flat_score, cand)
    ids_c = jnp.where(top_scores > 0, n - top_scores, n).astype(jnp.int32)
    # Exact areas of the C candidates: dense comparison, no scatter.
    areas_c = (labels.reshape(-1)[None, :] == ids_c[:, None]).sum(-1).astype(jnp.float32)
    areas_c = jnp.where((top_scores > 0) & (areas_c >= min_area), areas_c, 0.0)
    top_areas, pos = jax.lax.top_k(areas_c, max_objects)
    keep = top_areas >= jnp.float32(max(min_area, 1))
    ids_k = jnp.where(keep, ids_c[pos], n)
    masks = labels[None, :, :] == ids_k[:, None, None]
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
