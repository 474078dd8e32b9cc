"""Space-to-depth (S2D) conv reparameterization for low-channel U-Net levels.

Why: v5e's MXU needs ~128 output lanes to saturate. The U-Net's level-0
convs (32 channels at 512²) run at ~21 TFLOP/s under XLA (~11% of bf16
peak) because Cout=32 fills a quarter of the MXU tile; the *same math*
expressed on the 2×2 space-to-depth grid — (B, H/2, W/2, 4C) with
reparameterized kernels — runs its (4× larger) FLOPs at ~190 TFLOP/s,
a ~2.2× net win, and turns the decoder's ConvTranspose(k2, s2) into a pure
matmul (no pixel-shuffle data movement at full resolution at all).

Layout convention: **phase-major** — s2d channel index ``ph * C + c`` with
``ph = py * r + px`` the intra-block phase. Phase-major means concatenating
two s2d tensors along channels keeps each input a contiguous *group*, so
skip-connection concats stay exact with per-group kernel transforms
(:func:`s2d_conv3x3_kernel`'s ``in_groups``).

Exactness: every transform below is an exact reparameterization (same
multiply-adds, different association order) of the corresponding
full-resolution op with 'SAME' zero padding. Verified against the direct
forms in ``tests/test_ops_s2d.py``.

Reference workload shape: ``model/unet/unet_encoder.py:15-25`` (ConvBlock),
``model/unet/unet_decoder.py:25`` (ConvTranspose k2 s2).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "s2d_conv3x3_kernel",
    "s2d_vector",
    "s2d_convt2x2_kernel",
    "s2d_1x1_kernel",
    "phase_max_pool",
    "phase_mean",
    "patch_reduce_mean_s2d",
    "conv3x3_s2d",
    "depth_to_space_grouped",
    "windowed_down_kernel",
    "conv3x3_windowed_down",
]

_R = 2  # block size; the U-Net only ever needs 2×2


def space_to_depth(x: jnp.ndarray, r: int = _R) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/r, W/r, r²·C), phase-major channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    # (B, H/r, W/r, py, px, C) → phase-major channels
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def depth_to_space(y: jnp.ndarray, r: int = _R) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (phase-major channel order)."""
    b, hh, ww, cc = y.shape
    c = cc // (r * r)
    y = y.reshape(b, hh, ww, r, r, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * r, ww * r, c)


@lru_cache(maxsize=None)
def _tap_map(r: int = _R):
    """Constant mapping for the 3×3 'SAME' conv on the s2d grid.

    Returns int arrays ``(dI, dJ, pyo, pxo, pyi, pxi) -> (u, v, valid)``:
    output pixel (r·I + pyo) reads input pixel (r·(I+dI) + pyi), which is
    full-res tap ``u = r·dI + pyi − pyo`` of the original 3×3 kernel; valid
    iff |u| ≤ 1 (and likewise v).
    """
    shape = (3, 3, r, r, r, r)
    u = np.zeros(shape, np.int64)
    v = np.zeros(shape, np.int64)
    valid = np.zeros(shape, bool)
    for dI in range(-1, 2):
        for dJ in range(-1, 2):
            for pyo in range(r):
                for pxo in range(r):
                    for pyi in range(r):
                        for pxi in range(r):
                            uu = r * dI + pyi - pyo
                            vv = r * dJ + pxi - pxo
                            ok = abs(uu) <= 1 and abs(vv) <= 1
                            idx = (dI + 1, dJ + 1, pyo, pxo, pyi, pxi)
                            valid[idx] = ok
                            u[idx] = np.clip(uu + 1, 0, 2)
                            v[idx] = np.clip(vv + 1, 0, 2)
    return u, v, valid


def s2d_conv3x3_kernel(
    kernel: jnp.ndarray, in_groups: Sequence[int] = (), r: int = _R
) -> jnp.ndarray:
    """Transform a (3, 3, Cin, Cout) 'SAME' conv kernel to its s2d form
    (3, 3, r²·Cin, r²·Cout).

    ``in_groups``: when the s2d input is a channel-concat of separately
    s2d-transformed tensors (e.g. [skip, upsampled] in the decoder), pass
    their full-res channel widths; the transform is applied per group so the
    phase-major group layout lines up. Empty = single group.
    """
    cin = kernel.shape[2]
    groups = tuple(in_groups) if in_groups else (cin,)
    assert sum(groups) == cin, (groups, cin)
    u, v, valid = _tap_map(r)
    parts = []
    offset = 0
    for g in groups:
        kg = kernel[:, :, offset : offset + g, :]  # (3, 3, g, Cout)
        offset += g
        # gathered[dI, dJ, pyo, pxo, pyi, pxi, ci, co] = W[u, v, ci, co]·valid
        gathered = kg[u, v] * valid[..., None, None].astype(kernel.dtype)
        # → (3, 3, (pyi, pxi, ci), (pyo, pxo, co))
        cout = kernel.shape[3]
        parts.append(
            gathered.transpose(0, 1, 4, 5, 6, 2, 3, 7).reshape(
                3, 3, r * r * g, r * r * cout
            )
        )
    if len(parts) == 1:
        # Cout phase-major ordering is already correct.
        return parts[0]
    return jnp.concatenate(parts, axis=2)


def s2d_vector(vec: jnp.ndarray, r: int = _R) -> jnp.ndarray:
    """Tile a per-channel vector (bias / BN scale) to phase-major s2d
    channels: (C,) → (r²·C,)."""
    return jnp.tile(vec, r * r)


def s2d_convt2x2_kernel(kernel: jnp.ndarray, r: int = _R) -> jnp.ndarray:
    """Transform a (r, r, Cin, Cout) stride-r 'VALID' ConvTranspose kernel
    into the (Cin, r²·Cout) matmul producing the s2d-layout output directly:
    ``y_s2d[I, J, ph·Cout + co] = Σ_ci x[I, J, ci]·K[r−1−py, r−1−px, ci, co]``
    (flax ``nn.ConvTranspose`` applies the kernel spatially flipped —
    verified against ``nn.ConvTranspose`` in tests/test_ops_s2d.py)."""
    rr, rr2, cin, cout = kernel.shape
    assert rr == r and rr2 == r
    k = kernel[::-1, ::-1]
    return k.reshape(r * r, cin, cout).transpose(1, 0, 2).reshape(cin, r * r * cout)


def s2d_1x1_kernel(kernel: jnp.ndarray, r: int = _R) -> jnp.ndarray:
    """(1, 1, Cin, Cout) → block-diagonal (r²·Cin, r²·Cout) per-phase matmul."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    eye = jnp.eye(r * r, dtype=kernel.dtype)
    # out[(ph_i, ci), (ph_o, co)] = eye[ph_i, ph_o] · W[ci, co]
    return jnp.einsum("pq,io->piqo", eye, kernel[0, 0]).reshape(
        r * r * cin, r * r * cout
    )


def phase_max_pool(y_s2d: jnp.ndarray, r: int = _R) -> jnp.ndarray:
    """MaxPool(r, r) of the full-res tensor, computed in s2d layout: the
    pool window *is* the phase block → channelwise max over phases.
    (B, H/r, W/r, r²·C) → (B, H/r, W/r, C).

    Form: channel-slice maxes on the TRANSPOSED (H, W, B, r²C) view — the
    same boundary trick as :func:`patch_reduce_mean_s2d`: the transpose in
    is a bitcast of the {3,0,2,1} layout the producing conv / psconv kernel
    already carries, and the transpose out is a bitcast to the conv-native
    layout the consuming conv wants. The previous reshape(..., r², C).max(3)
    form forced a relayout copy on BOTH sides of the reduce (device trace
    r5: 404+178+206 µs at the 512² b8 level-0 site, 104+26+38 µs at
    level-1 — ~0.93 ms/step of standalone copies). This form erases all
    those ops from the trace, but XLA fuses the slice-maxes into the
    CONSUMING convs' input reads, which re-pays most of the cost there
    (level-1 windowed conv 333 → 952 µs absorbing the level-0 pool):
    measured net ~-60 µs/step full-pipeline (10.196 → 10.136 ms device
    total) — kept as a small win, recorded honestly."""
    b, hh, ww, cc = y_s2d.shape
    c = cc // (r * r)
    xt = jnp.transpose(y_s2d, (1, 2, 0, 3))  # (hh, ww, b, r²c): layout bitcast
    m = xt[..., :c]
    for p in range(1, r * r):
        m = jnp.maximum(m, xt[..., p * c : (p + 1) * c])
    return jnp.transpose(m, (2, 0, 1, 3))  # → (b, hh, ww, c): bitcast out


def phase_mean(y_s2d: jnp.ndarray, r: int = _R) -> jnp.ndarray:
    """AvgPool(r, r) analog of :func:`phase_max_pool`."""
    b, hh, ww, cc = y_s2d.shape
    c = cc // (r * r)
    return y_s2d.reshape(b, hh, ww, r * r, c).mean(axis=3)


def patch_reduce_mean_s2d(x_s2d: jnp.ndarray, patch: int, r: int = _R) -> jnp.ndarray:
    """Per-patch mean of the full-resolution tensor, computed in s2d layout
    without materializing the full-res form: mean over the (patch/r)² s2d
    pixels of each patch *and* the r² phases.

    (B, H/r, W/r, r²·C) with full-res patch size ``patch`` (multiple of r)
    → (B, H/patch, W/patch, C). Numerically equal to
    ``patch_reduce_mean(depth_to_space(x), patch)`` up to fp summation order.
    """
    assert patch % r == 0, (patch, r)
    p = patch // r
    b, hh, ww, cc = x_s2d.shape
    c = cc // (r * r)
    # Phase sum FIRST via a 0/1 selector-matrix MXU contraction on the
    # TRANSPOSED (H, W, B, C) view — a bitcast of the {3,0,2,1} layout the
    # producing conv (or the psconv Pallas kernel) already has, so XLA
    # inserts no relayout at all; the tiny dot (2·T·r²C·C MACs) then sums
    # the phases in f32, and the long (p-term) W/H accumulations stay f32.
    # History (512² b8 on v5e, device traces r3): a reshape-axis sum forced
    # a {3,0,2,1}→{2,3,1,0} relayout copy per call site (~0.4 ms each);
    # the same selector dot on the UN-transposed 4D tensor still pulled a
    # relayout; lane-aligned channel-slice adds cost more than the copy;
    # and the full p·r²·C² selector contraction of the whole patch mean
    # burns real MACs (15.0 ms pipeline). Pipeline with this form:
    # 13.00 → 12.52 ms/step.
    sel = jnp.tile(jnp.eye(c, dtype=x_s2d.dtype), (r * r, 1))
    xt = jnp.transpose(x_s2d, (1, 2, 0, 3))  # (hh, ww, b, r²c): layout bitcast
    x = jax.lax.dot_general(
        xt, sel, (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    x = x.reshape(hh, ww // p, p, b, c).sum(2)
    x = x.reshape(hh // p, p, ww // p, b, c).sum(1)
    out = jnp.transpose(x, (2, 0, 1, 3))  # → (b, hh/p, ww/p, c), small
    return (out / (patch * patch)).astype(x_s2d.dtype)


def conv3x3_s2d(x_s2d: jnp.ndarray, kernel_s2d: jnp.ndarray) -> jnp.ndarray:
    """3×3 'SAME' conv on the s2d grid (NHWC)."""
    return jax.lax.conv_general_dilated(
        x_s2d,
        kernel_s2d.astype(x_s2d.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3x3_s2d_const(
    v: jnp.ndarray, kernel_s2d: jnp.ndarray, hh: int, ww: int
) -> jnp.ndarray:
    """``conv3x3_s2d`` of a spatially CONSTANT map, computed analytically.

    Equals ``conv3x3_s2d(broadcast_to(v, (1, hh, ww, Cin)), K)[0]`` exactly:
    the result is the full tap sum in the interior, attenuated at borders by
    'SAME' zero padding — i.e. ``out[y, x] = Σ_{dy∈valid(y), dx∈valid(x)}
    T[dy, dx]`` with ``T[dy, dx, o] = Σ_ci K[dy, dx, ci, o]·v[ci]``, and the
    validity pattern is separable in y/x. Why: the decoder's upsample-bias
    field (models/unet.py fused_up) used the conv form; as soon as its
    fusion partner moved to the psconv Pallas kernel, XLA materialized it
    as a standalone batch-1 conv costing ~0.6 ms/step at (256², 128ch)
    (device trace r3). This form is a (3,3,C) einsum + rank-1 outer masks.
    """
    t = jnp.einsum("yxio,i->yxo", kernel_s2d.astype(jnp.float32), v.astype(jnp.float32))
    iy = jnp.arange(hh)
    ix = jnp.arange(ww)
    ry = jnp.stack(
        [(iy >= 1), jnp.ones_like(iy, bool), (iy < hh - 1)], axis=1
    ).astype(jnp.float32)
    cx = jnp.stack(
        [(ix >= 1), jnp.ones_like(ix, bool), (ix < ww - 1)], axis=1
    ).astype(jnp.float32)
    return jnp.einsum("yd,xe,deo->yxo", ry, cx, t)


def depth_to_space_grouped(
    x_s2d: jnp.ndarray, groups: Sequence[int], r: int = _R
) -> jnp.ndarray:
    """Inverse layout for a channel-concat of separately s2d-transformed
    tensors (each group phase-major within itself): d2s per group, concat.
    (B, H/r, W/r, r²·ΣG) → (B, H, W, ΣG)."""
    groups = tuple(groups)
    if len(groups) <= 1:
        return depth_to_space(x_s2d, r)
    parts = []
    off = 0
    for g in groups:
        parts.append(depth_to_space(x_s2d[..., off : off + r * r * g], r))
        off += r * r * g
    return jnp.concatenate(parts, axis=-1)


def windowed_down_kernel(kernel: jnp.ndarray, r: int = _R) -> jnp.ndarray:
    """Transform a (3, 3, Cin, Cout) 'SAME' conv kernel into the *windowed*
    (4, 4, Cin, r²·Cout) stride-r form: the four outputs of each r×r pixel
    block share one 4×4 input window, so
    ``conv(x_full, K_win, strides=(2, 2), padding=((1, 2), (1, 2)))``
    produces the phase-major s2d output directly.

    Why: this executes 16/9 ≈ 1.78× the useful FLOPs at full MXU lane
    occupancy (Cout→4·Cout lanes), vs the dense s2d form's 4× inflation —
    measured ~1.9× faster for Cin=64→Cout=32 at 512² b8 on v5e (91 vs 49
    useful TFLOP/s; perf_lab ``wconv``). Production dispatch is *layout*-
    driven, not Cin-driven (see the rule atop models/unet.py): a full-res
    NHWC input always takes this form — including Cin=3 — because the
    space_to_depth relayout the dense form would need costs more than any
    conv-time difference; an input already in s2d layout stays dense.
    """
    parts = []
    for pyo in range(r):
        for pxo in range(r):
            parts.append(
                jnp.pad(
                    kernel,
                    ((pyo, 1 - pyo), (pxo, 1 - pxo), (0, 0), (0, 0)),
                )
            )
    return jnp.concatenate(parts, axis=3)  # (4, 4, Cin, r²·Cout), phase-major


def conv3x3_windowed_down(x_full: jnp.ndarray, kernel_win: jnp.ndarray) -> jnp.ndarray:
    """Windowed 3×3 'SAME' conv: full-res NHWC input → phase-major s2d
    output ((B, H, W, Cin) → (B, H/2, W/2, 4·Cout))."""
    return jax.lax.conv_general_dilated(
        x_full,
        kernel_win.astype(x_full.dtype),
        window_strides=(2, 2),
        padding=((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
