"""Fused histogram-equalization Pallas kernel.

The XLA formulation of cv2-style ``equalizeHist``
(:func:`mingraph_unet_tpu.ops.filters._equalize_channel_u8`) materializes an
(N, 256) one-hot twice (histogram + LUT application): ~67 MB of HBM traffic
per 512² image each way. This kernel keeps the whole image, the histogram,
the CDF and the LUT resident in VMEM and streams pixel chunks through the
VPU/MXU — one HBM read of the image and one write of the result (~2 MB).

Honest benchmark note (v5e, loop-variant inputs, perf_lab ``histeq``):
despite the ~60× HBM-traffic reduction the kernel loses at production batch
(512² b8: 2.87 ms vs 2.24 ms for the XLA one-hot form) because the batch
grid serializes per image while the one-hot matmuls saturate the MXU across
the whole batch. The production dispatch therefore defaults to the XLA form
(``filters.equalize_histogram_rgb_batched``); the kernel stays as the
single-image / VMEM-constrained option and as working evidence for the
Pallas tier.

Per-image program (grid over batch):
1. Chunked one-hot compare + reduce → 256-bin histogram (VPU).
2. CDF via a lower-triangular (256, 256) matmul (MXU; in-kernel ``cumsum``
   is not supported by Mosaic).
3. cv2 LUT: ``round((cdf − cdf_min) / (N − cdf_min) · 255)``.
4. Chunked one-hot × LUT matmul → equalized pixels (exact: one nonzero per
   row, values ≤ 255).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["equalize_channel_pallas"]

_LANES = 512  # pixels per row-chunk lane layout
_ROWS_PER_STEP = 8  # rows of _LANES pixels per loop step


def _histeq_kernel(y_ref, out_ref):
    rows = y_ref.shape[1]  # block (1, rows, _LANES) int32 pixel values
    n_px = rows * _LANES
    # Mosaic cannot shape-cast (R, L) → (R·L, 1); everything stays in a
    # (R, L, 256) broadcast layout instead.
    bins3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)  # (1, 1, 256)

    # --- 1) histogram over chunks (VPU compare + reduce) ---
    def hist_body(i, hist):
        chunk = y_ref[0, pl.ds(i * _ROWS_PER_STEP, _ROWS_PER_STEP), :]  # (R, L)
        onehot = (chunk[:, :, None] == bins3).astype(jnp.float32)  # (R, L, 256)
        return hist + jnp.sum(onehot, axis=(0, 1))[None, :]

    n_steps = rows // _ROWS_PER_STEP
    hist = jax.lax.fori_loop(
        0, n_steps, hist_body, jnp.zeros((1, 256), jnp.float32)
    )  # (1, 256)

    # --- 2) CDF as a row-vector × upper-triangular matmul (in-kernel cumsum
    # is unsupported): cdf[j] = Σ_i hist[i]·[i ≤ j] ---
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    upper = (row_ids <= col_ids).astype(jnp.float32)
    cdf = jnp.dot(hist, upper, preferred_element_type=jnp.float32)  # (1, 256)

    # --- 3) cv2 LUT ---
    total = jnp.float32(n_px)
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, total + 1.0))
    denom = jnp.maximum(total - cdf_min, 1.0)
    lut = jnp.clip(jnp.round((cdf - cdf_min) / denom * 255.0), 0.0, 255.0)  # (1, 256)
    lut3 = lut[None, :, :] * jnp.ones((1, 1, 1), jnp.float32)  # (1, 1, 256)

    # --- 4) apply LUT chunk-wise (one-hot select + reduce, exact) ---
    def apply_body(i, _):
        chunk = y_ref[0, pl.ds(i * _ROWS_PER_STEP, _ROWS_PER_STEP), :]
        onehot = (chunk[:, :, None] == bins3).astype(jnp.float32)
        vals = jnp.sum(onehot * lut3, axis=2)  # (R, L)
        out_ref[0, pl.ds(i * _ROWS_PER_STEP, _ROWS_PER_STEP), :] = vals.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, n_steps, apply_body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def equalize_channel_pallas(y: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """cv2 ``equalizeHist`` on batched uint8-valued channels.

    Args:
        y: (B, H, W) integer array with values in [0, 255]. ``H·W`` must be a
            multiple of ``_ROWS_PER_STEP · _LANES`` (= 4096) — true for all
            power-of-two pipeline sizes (128², 256², 512², 1024²).
        interpret: run in Pallas interpreter mode (for CPU tests).

    Returns (B, H, W) int32 equalized values.
    """
    b, h, w = y.shape
    n = h * w
    if n % (_ROWS_PER_STEP * _LANES):
        raise ValueError(f"H*W={n} must be a multiple of {_ROWS_PER_STEP * _LANES}")
    rows = n // _LANES
    y32 = y.astype(jnp.int32).reshape(b, rows, _LANES)
    out = pl.pallas_call(
        _histeq_kernel,
        out_shape=jax.ShapeDtypeStruct((b, rows, _LANES), jnp.int32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, rows, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, _LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y32)
    return out.reshape(b, h, w)
