"""Windowed fused conv3x3(+bias+ReLU) Pallas kernel for low-channel levels.

Why: the U-Net's full-resolution levels have Cout ∈ {32, 64} — a direct NHWC
conv fills ≤ half of the MXU's 128 output lanes (measured ~21 TFLOP/s for
32ch at 512² on v5e), and the dense space-to-depth reparameterization
(ops/s2d.py) fixes the lanes but inflates executed FLOPs 4× (the (4Cin, 4Cout)
kernel is only 25% non-zero). This kernel uses the *windowed* factorization:
the four outputs of every 2×2 pixel block share one 4×4 input window, so the
block is one (16·Cin → 4·Cout) contraction — full lane occupancy at only
16/9 ≈ 1.78× FLOP inflation, the best dense-arithmetic form of this op.

Data layout: s2d (phase-major, ops/s2d.py) in HBM for both input and output —
the window/patch matrix is formed in VMEM per row-band (16 shifted slices of
the band), so no full-resolution relayout ever touches HBM. Row halos come
from two extra one-row block refs with clamped index maps; the image-boundary
rows are zeroed in-kernel, which reproduces the conv's SAME zero padding.

Reference workload: ``model/unet/unet_encoder.py:15-25`` (ConvBlock).

Status: compiles and is exact on real TPU (tests/test_pallas_kernels.py),
but NOT production — measured 1.64 ms vs the dense-s2d XLA form's 0.82 ms
for 32→32 at 512² b8 on v5e: the 16 scratch-store relayout copies that
assemble the patch matrix (required because Mosaic cannot relayout a
multi-way concatenate of shifted slices) cost more VMEM bandwidth than the
windowed matmul saves in MXU time. Superseded in r3 by the phase-select
kernel (psconv.py), which reaches the same 16/9× arithmetic with zero
assembly copies (lane-SELECTS of shifted views instead of lane-offset
stores) and is the production path for eligible s2d-layout convs; the
dense-s2d XLA lowering (ops/s2d.py) covers the rest.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["wconv3x3_weights", "wconv3x3_s2d"]

# Tap geometry for r=2: window tap d ∈ 0..3 reads s2d row/col (pos[d]) of the
# halo-extended band (top halo at 0) with intra-block phase (phase[d]).
_POS = (0, 1, 1, 2)
_PHASE = (1, 0, 1, 0)


def wconv3x3_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) 'SAME' conv kernel → (16·Cin, 4·Cout) windowed form.

    Rows are tap-major ((dy·4+dx)·Cin + ci, full-res channel order); columns
    are output-phase-major ((py·2+px)·Cout + co) — matching the s2d channel
    convention, so the matmul output IS the s2d-layout activation block.
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    u = np.zeros((4, 2), np.int64)
    valid_1d = np.zeros((4, 2), bool)
    for d in range(4):
        for p in range(2):
            t = d - p
            valid_1d[d, p] = 0 <= t <= 2
            u[d, p] = np.clip(t, 0, 2)
    # gathered[dy, dx, pyo, pxo, ci, co] = K[dy-pyo, dx-pxo, ci, co] · valid
    uy = u[:, None, :, None]  # (4,1,2,1)
    vx = u[None, :, None, :]  # (1,4,1,2)
    vy = valid_1d[:, None, :, None]
    vv = valid_1d[None, :, None, :]
    gathered = kernel[jnp.asarray(np.broadcast_to(uy, (4, 4, 2, 2))),
                      jnp.asarray(np.broadcast_to(vx, (4, 4, 2, 2)))]
    mask = jnp.asarray((vy & vv).astype(np.float32))[..., None, None]
    gathered = gathered * mask.astype(kernel.dtype)  # (4,4,2,2,Cin,Cout)
    # → rows (dy, dx, ci), cols (pyo, pxo, co)
    w2 = gathered.transpose(0, 1, 4, 2, 3, 5).reshape(16 * cin, 4 * cout)
    return w2


def _kernel_body(relu: bool, row_tile: int, groups: Tuple[int, ...],
                 out_dtype, top_ref, cur_ref, bot_ref, w_ref, b_ref, o_ref,
                 patches_ref):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    cin = sum(groups)
    cur = cur_ref[0]  # (TH, Ww, 4·Cin)
    # Image-boundary halos are the conv's SAME zero padding.
    top = jnp.where(i == 0, jnp.zeros_like(top_ref[0]), top_ref[0])
    bot = jnp.where(i == n - 1, jnp.zeros_like(bot_ref[0]), bot_ref[0])
    band = jnp.concatenate([top, cur, bot], axis=0)  # (TH+2, Ww, 4·Cin)
    ww = band.shape[1]
    zcol = jnp.zeros((band.shape[0], 1, band.shape[2]), band.dtype)
    band = jnp.concatenate([zcol, band, zcol], axis=1)  # (TH+2, Ww+2, 4·Cin)

    # Assemble the (TH, Ww, 16·Cin) window/patch matrix via VMEM scratch
    # stores, NOT a vector concatenate: the 16 shifted slices carry mixed
    # sublane/lane layout offsets, and Mosaic cannot relayout a multi-way
    # tpu.concatenate over them (fails on real TPU) — but it lowers each
    # store as a plain relayout copy.
    for dy in range(4):
        for dx in range(4):
            sl = band[_POS[dy]:_POS[dy] + row_tile, _POS[dx]:_POS[dx] + ww]
            ph = _PHASE[dy] * 2 + _PHASE[dx]
            d = dy * 4 + dx
            off = 0
            goff = 0
            for g in groups:
                patches_ref[:, :, d * cin + goff: d * cin + goff + g] = (
                    sl[..., off + ph * g: off + (ph + 1) * g]
                )
                off += 4 * g
                goff += g
    patches = patches_ref[...].reshape(row_tile * ww, 16 * cin)
    acc = jnp.dot(patches, w_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b_ref[...]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.reshape(row_tile, ww, acc.shape[-1]).astype(out_dtype)


@partial(jax.jit, static_argnames=("groups", "relu", "row_tile", "interpret"))
def wconv3x3_s2d(
    x_s2d: jnp.ndarray,
    w2: jnp.ndarray,
    bias: jnp.ndarray,
    groups: Tuple[int, ...] = (),
    relu: bool = True,
    row_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused conv3x3(+bias, optional ReLU) on s2d-layout tensors.

    Args:
        x_s2d: (B, H/2, W/2, 4·Cin) phase-major s2d input.
        w2: (16·Cin, 4·Cout) windowed weights from :func:`wconv3x3_weights`.
        bias: (Cout,) full-res bias (tiled to phases internally) — pass the
            BN-folded bias for inference fusion.
        groups: full-res channel widths when the s2d input is a concat of
            separately-transformed tensors (decoder skip‖up), like
            ``s2d_conv3x3_kernel``'s ``in_groups``.
        relu: fuse the ReLU epilogue.
        row_tile: s2d rows per kernel instance (VMEM sizing knob).

    Returns (B, H/2, W/2, 4·Cout) s2d output, dtype of ``x_s2d``.
    """
    b, hh, ww, c4 = x_s2d.shape
    cin = c4 // 4
    groups = tuple(groups) if groups else (cin,)
    assert sum(groups) == cin, (groups, cin)
    co4 = w2.shape[1]
    assert w2.shape[0] == 16 * cin, (w2.shape, cin)
    while hh % row_tile:
        row_tile //= 2
    n_bands = hh // row_tile

    bias2 = jnp.tile(bias.astype(jnp.float32), 4)[None, :]  # (1, 4·Cout)
    w2 = w2.astype(x_s2d.dtype)

    kern = partial(_kernel_body, relu, row_tile, groups, x_s2d.dtype)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, co4), x_s2d.dtype),
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ww, c4),
                lambda bi, i: (bi, jnp.maximum(i * row_tile - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, row_tile, ww, c4),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, ww, c4),
                lambda bi, i: (bi, jnp.minimum((i + 1) * row_tile, hh - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((16 * cin, co4), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co4), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_tile, ww, co4), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((row_tile, ww, 16 * cin), x_s2d.dtype)],
        interpret=interpret,
    )(x_s2d, x_s2d, x_s2d, w2, bias2)
