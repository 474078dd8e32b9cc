"""Patchify / unpatchify with pad-to-multiple, fully batched and shape-static.

TPU-native equivalent of ``PatchGraphConstructor.image_to_patches``
(``preprocessing/graph_construction/patch_graph_construction.py:15-47``): the
double-``unfold`` becomes a reshape/transpose, vectorized over the batch, in
NHWC layout. Padding semantics match the reference (zero pad on the
bottom/right to the next multiple of ``patch_size``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "pad_to_multiple",
    "patch_grid_dims",
    "patchify",
    "unpatchify",
    "patch_reduce_mean",
    "broadcast_patch_to_pixels",
]


def patch_grid_dims(h: int, w: int, patch_size: int) -> Tuple[int, int]:
    """(num_patches_h, num_patches_w) after pad-to-multiple."""
    return (-(-h // patch_size), -(-w // patch_size))


def pad_to_multiple(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Zero-pad spatial dims of NHWC (or NHW) up to multiples of ``patch_size``
    (bottom/right padding, like the reference's ``F.pad`` call at
    ``patch_graph_construction.py:28-33``)."""
    h_axis = 1
    h, w = x.shape[h_axis], x.shape[h_axis + 1]
    pad_h = (-h) % patch_size
    pad_w = (-w) % patch_size
    if pad_h == 0 and pad_w == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[h_axis] = (0, pad_h)
    cfg[h_axis + 1] = (0, pad_w)
    return jnp.pad(x, cfg)


def patchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """NHWC → (N, nph, npw, P, P, C) non-overlapping patches.

    Flattening the (nph, npw) axes row-major reproduces the reference's patch
    ordering (`patches.view(-1, C, P, P)` after `permute(1, 2, 0, 3, 4)` at
    ``patch_graph_construction.py:40-45``), so node index = r * npw + c.
    """
    x = pad_to_multiple(x, patch_size)
    n, h, w, c = x.shape
    nph, npw = h // patch_size, w // patch_size
    x = x.reshape(n, nph, patch_size, npw, patch_size, c)
    return x.transpose(0, 1, 3, 2, 4, 5)


def unpatchify(patches: jnp.ndarray) -> jnp.ndarray:
    """(N, nph, npw, P, P, C) → NHWC (inverse of :func:`patchify`)."""
    n, nph, npw, p, _, c = patches.shape
    x = patches.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, nph * p, npw * p, c)


def patch_reduce_mean(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Per-patch channel means: NHWC → (N, nph, npw, C).

    The workhorse behind 'pooled U-Net / Sobel / hist-eq features per patch'
    (intended recipe demonstrated at ``scripts/graph_refinement.py:76-111``).

    Lowered as two sequential middle-axis reshape-sums (W patches, then H
    patches) with fp32 accumulation: the one-shot ``patchify(...).mean``
    form makes XLA materialize a strided 6-D transpose, measured 3.95 ms vs
    0.68 ms for (8, 512², 32) bf16 on v5e.
    """
    n, h, w, c = x.shape
    y = x.astype(jnp.float32)
    y = y.reshape(n, h, w // patch_size, patch_size, c).sum(3)
    y = y.reshape(n, h // patch_size, patch_size, w // patch_size, c).sum(2)
    return (y / (patch_size * patch_size)).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def broadcast_patch_to_pixels(patch_vals: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(N, nph, npw, C) → NHWC by nearest (block) upsampling.

    Equivalent of the reference's `F.interpolate(..., mode='nearest')`
    broadcast of patch-level graph embeddings back to the pixel grid
    (``scripts/train_end_to_end.py:403-422``) for integer scale factors.

    custom_vjp: the backward is the per-patch-block sum of the cotangent,
    pinned here to the same two sequential middle-axis reshape-sums that
    :func:`patch_reduce_mean` uses (its docstring carries the fwd-side A/B
    where the alternative 6-D-transpose lowering costs 5.8×). Measured
    NEUTRAL on the 512² b8 e2e train step (91.20 vs 91.23 ms, stage
    breakdown identical): XLA's derived transpose-of-repeat already reaches
    this lowering; the pin keeps it explicit and grad-parity-tested rather
    than emergent.
    """
    x = jnp.repeat(patch_vals, patch_size, axis=1)
    return jnp.repeat(x, patch_size, axis=2)


def _broadcast_p2p_fwd(patch_vals, patch_size):
    return broadcast_patch_to_pixels(patch_vals, patch_size), None


def _broadcast_p2p_bwd(patch_size, _res, g):
    n, h, w, c = g.shape
    p = patch_size
    s = g.reshape(n, h, w // p, p, c).sum(3)
    s = s.reshape(n, h // p, p, w // p, c).sum(2)
    return (s,)


broadcast_patch_to_pixels.defvjp(_broadcast_p2p_fwd, _broadcast_p2p_bwd)
