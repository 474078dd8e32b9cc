"""Auxiliary feature-map filters: Sobel, histogram equalization, Gaussian blur.

TPU-native equivalents of the reference's OpenCV wrappers:

- ``EdgeDetector.sobel_edges``
  (``preprocessing/graph_feature_processing/edge_detection.py:14-44``):
  gray conversion, Sobel x/y, magnitude, min-max normalize to [0, 255].
- ``HistogramEqualizer.equalize_histogram_rgb/_gray``
  (``preprocessing/graph_feature_processing/histogram_equalization.py:9-49``):
  RGB→YUV, equalize the Y channel with the cv2 CDF LUT, back to RGB.
- ``GaussianSmoother.smooth``
  (``preprocessing/graph_feature_processing/gaussian_smoothing.py:23-34``):
  separable Gaussian with cv2's ``getGaussianKernel`` weights.

All are expressed as fixed-weight (depthwise) convolutions and dense LUT
matmuls so XLA can fuse them into the surrounding pipeline; borders use
reflect-101 padding like OpenCV's default ``BORDER_REFLECT_101``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mingraph_unet_tpu.ops.image import rgb_to_gray

__all__ = [
    "sobel_kernels",
    "sobel_magnitude",
    "sobel_patch_mean",
    "equalize_histogram_gray",
    "equalize_histogram_rgb",
    "equalize_histogram_rgb_batched",
    "gaussian_kernel_1d",
    "gaussian_blur",
]


# ---------------------------------------------------------------------------
# Sobel
# ---------------------------------------------------------------------------


def sobel_kernels(ksize: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """OpenCV-compatible Sobel derivative kernels (kx, ky) of size ``ksize``.

    Built from the smoothing kernel [1, 2, 1] (and its box-convolutions for
    larger sizes) outer-product with the difference kernel [-1, 0, 1],
    matching ``cv2.getDerivKernels``.
    """
    if ksize % 2 == 0 or ksize < 3:
        raise ValueError("ksize must be odd and >= 3")

    def _deriv_kernels(order: int) -> np.ndarray:
        # cv2.getDerivKernels builds Pascal-triangle smoothing convolved with
        # repeated difference kernels.
        smooth = np.array([1.0])
        for _ in range(ksize - 1 - order):
            smooth = np.convolve(smooth, [1.0, 1.0])
        deriv = np.array([1.0])
        for _ in range(order):
            deriv = np.convolve(deriv, [1.0, -1.0])
        k = np.convolve(smooth, deriv)
        # cv2 derivative kernel sign convention: [-1, 0, 1] (increasing x).
        return k[::-1].copy()

    d = _deriv_kernels(1)  # 1st derivative, length ksize
    s = _deriv_kernels(0)  # pure smoothing, length ksize
    kx = np.outer(s, d)  # derivative along x (columns)
    ky = np.outer(d, s)  # derivative along y (rows)
    return kx, ky


def _reflect101_pad2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-101 pad the two leading-of-last-three spatial dims of NHWC."""
    cfg = [(0, 0)] * x.ndim
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    cfg[h_axis] = (pad, pad)
    cfg[w_axis] = (pad, pad)
    return jnp.pad(x, cfg, mode="reflect")


def _depthwise_conv2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'valid' conv of NHWC ``x`` with a single HW ``kernel``."""
    c = x.shape[-1]
    kh, kw = kernel.shape
    k = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def sobel_magnitude(rgb: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Sobel edge magnitude of an RGB image, normalized to [0, 255].

    ``rgb`` is HWC or NHWC in [0, 255] (float or uint8). Returns float32 HW /
    NHW. Matches ``EdgeDetector.sobel_edges``: gray conversion, CV_64F Sobel
    x/y, ``sqrt(gx² + gy²)``, then cv2 ``NORM_MINMAX`` scaling to [0, 255]
    (``edge_detection.py:14-44``).
    """
    squeeze_batch = rgb.ndim == 3
    if squeeze_batch:
        rgb = rgb[None]
    gray = rgb_to_gray(rgb.astype(jnp.float32))  # N,H,W
    if ksize == 3:
        # Stencil formulation: a 1-channel conv starves the conv units (8.4 ms
        # vs 0.9 ms for this form at 512²×8 on v5e); eight shifted views fuse
        # into one VPU pass.
        p = jnp.pad(gray, ((0, 0), (1, 1), (1, 1)), mode="reflect")
        tl, t, tr = p[:, :-2, :-2], p[:, :-2, 1:-1], p[:, :-2, 2:]
        l, r = p[:, 1:-1, :-2], p[:, 1:-1, 2:]
        bl, b, br = p[:, 2:, :-2], p[:, 2:, 1:-1], p[:, 2:, 2:]
        gx = (tr + 2.0 * r + br) - (tl + 2.0 * l + bl)
        gy = (bl + 2.0 * b + br) - (tl + 2.0 * t + tr)
        mag = jnp.sqrt(gx * gx + gy * gy)  # N,H,W
    else:
        kx, ky = sobel_kernels(ksize)
        pad = ksize // 2
        gray_p = _reflect101_pad2d(gray[..., None], pad)
        gx = _depthwise_conv2d(gray_p, jnp.asarray(kx, jnp.float32))
        gy = _depthwise_conv2d(gray_p, jnp.asarray(ky, jnp.float32))
        mag = jnp.sqrt(gx * gx + gy * gy)[..., 0]  # N,H,W
    # cv2.normalize(..., 0, 255, NORM_MINMAX) per image.
    mn = jnp.min(mag, axis=(-2, -1), keepdims=True)
    mx = jnp.max(mag, axis=(-2, -1), keepdims=True)
    out = (mag - mn) / jnp.maximum(mx - mn, 1e-12) * 255.0
    return out[0] if squeeze_batch else out


def sobel_patch_mean(rgb: jnp.ndarray, patch_size: int, ksize: int = 3) -> jnp.ndarray:
    """``patch_reduce_mean(sobel_magnitude(rgb)[..., None] / 255)`` computed
    on the channel-flattened view — the production aux-feature path.

    Why a separate lowering: (B, H, W, 3) tensors put C=3 on the 128-wide
    lane dimension, so every elementwise op in the gray conversion runs at
    3/128 lane occupancy (the dominant cost of ``sobel_magnitude`` on TPU).
    Here the image is viewed as (B, H, W·3) — full lanes — where a column
    shift by one pixel is a lane shift by 3; the gray weighted sum, the
    3×3 stencil, the magnitude, the per-image min/max and the per-patch sums
    all stay on full lanes, with non-gray lanes masked out of the
    reductions. The normalize-then-pool is folded through the pooling
    (affine maps commute with the mean), so nothing full-resolution is ever
    materialized in the C=1 layout.

    Exact same values as the reference chain (same float ops in the same
    f32 precision; equality tested in ``tests/test_ops_structure.py``).
    Only ksize=3 (the production setting) takes this path — larger kernels
    fall back to the depthwise-conv form.
    """
    if ksize != 3:
        mag = sobel_magnitude(rgb, ksize)
        from mingraph_unet_tpu.ops.patches import patch_reduce_mean

        return patch_reduce_mean(mag[..., None] / 255.0, patch_size)

    b, h, w, c = rgb.shape
    assert c == 3, rgb.shape
    x = rgb.astype(jnp.float32)
    # Column reflect-101 pad in pixel space, built in the 4D view (a flat
    # 'reflect' pad would reverse the channel order of the border pixel).
    x = jnp.concatenate([x[:, :, 1:2], x, x[:, :, w - 2 : w - 1]], axis=2)
    flat = x.reshape(b, h, (w + 2) * 3)
    # Row reflect-101 pad (rows are the sublane dim — cheap).
    flat = jnp.concatenate([flat[:, 1:2], flat, flat[:, h - 2 : h - 1]], axis=1)

    # Gray weighted sum at pixel-aligned lanes (lane k*3 holds gray of
    # pixel k); other lanes hold shifted garbage, masked out below.
    from mingraph_unet_tpu.ops.image import _GRAY_WEIGHTS

    gw = jnp.asarray(_GRAY_WEIGHTS, jnp.float32)
    g = (
        gw[0] * flat
        + gw[1] * jnp.concatenate([flat[..., 1:], flat[..., :1]], axis=-1)
        + gw[2] * jnp.concatenate([flat[..., 2:], flat[..., :2]], axis=-1)
    )  # (B, H+2, (W+2)*3)

    # 3×3 Sobel stencil: row shifts are slices, column shifts are ±3 lanes.
    def sh(dy, dx):
        return g[:, 1 + dy : 1 + dy + h, 3 * (1 + dx) : 3 * (1 + dx + w)]

    tl, t, tr = sh(-1, -1), sh(-1, 0), sh(-1, 1)
    l, r = sh(0, -1), sh(0, 1)
    bl, bo, br = sh(1, -1), sh(1, 0), sh(1, 1)
    gx = (tr + 2.0 * r + br) - (tl + 2.0 * l + bl)
    gy = (bl + 2.0 * bo + br) - (tl + 2.0 * t + tr)
    mag = jnp.sqrt(gx * gx + gy * gy)  # (B, H, W*3); gray lanes ≡ 0 mod 3

    lane_mask = (jnp.arange(w * 3) % 3 == 0)
    big = jnp.float32(3e38)
    mn = jnp.min(jnp.where(lane_mask, mag, big), axis=(-2, -1), keepdims=False)
    mx = jnp.max(jnp.where(lane_mask, mag, -big), axis=(-2, -1), keepdims=False)

    # Per-patch sums of the raw magnitude (masked), then the normalization
    # folded through the mean:  mean((m-mn)/(mx-mn)*255)/255
    #   = (mean(m) - mn) / (mx - mn).
    p = patch_size
    masked = jnp.where(lane_mask, mag, 0.0)
    nph, npw = h // p, w // p
    s = masked.reshape(b, nph, p, npw, p * 3).sum((2, 4))  # (B, nph, npw)
    mean = s / (p * p)
    denom = jnp.maximum(mx - mn, 1e-12)
    out = (mean - mn[:, None, None]) / denom[:, None, None]
    return out[..., None]  # (B, nph, npw, 1)


# ---------------------------------------------------------------------------
# Histogram equalization
# ---------------------------------------------------------------------------


def _equalize_channel_u8(chan: jnp.ndarray) -> jnp.ndarray:
    """cv2.equalizeHist semantics on one uint8 channel (HW int array).

    LUT: ``round((cdf(v) - cdf_min) / (total - cdf_min) * 255)`` with
    ``cdf_min`` the CDF at the first occupied bin.

    TPU note: both the histogram and the LUT application are expressed as
    dense one-hot reductions/matmuls — scatter-add and 256-entry gathers
    serialize badly on TPU (~16 ms and ~13 ms per 512² image measured on
    v5e vs ~0 ms for the dense forms).
    """
    flat = chan.reshape(-1).astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    onehot = flat[:, None] == bins[None, :]  # (N, 256) bool
    hist = onehot.sum(axis=0, dtype=jnp.int32)
    cdf = jnp.cumsum(hist)
    total = flat.shape[0]
    # cdf value at first nonzero bin == smallest nonzero cdf entry.
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, total + 1))
    denom = jnp.maximum(total - cdf_min, 1)
    lut = jnp.round((cdf - cdf_min).astype(jnp.float32) / denom * 255.0)
    lut = jnp.clip(lut, 0, 255)
    # One-hot 'gather': each row selects exactly one LUT entry (≤255, exact
    # in bf16), so the bf16 matmul is lossless and rides the MXU.
    out = jnp.einsum(
        "nk,k->n", onehot.astype(jnp.bfloat16), lut.astype(jnp.bfloat16)
    ).astype(jnp.int32)
    return out.reshape(chan.shape)


def equalize_histogram_gray(gray_u8: jnp.ndarray) -> jnp.ndarray:
    """Equalize a uint8 grayscale image (HW), cf.
    ``histogram_equalization.py:35-49``."""
    return _equalize_channel_u8_nibble(jnp.asarray(gray_u8)).astype(jnp.uint8)


# OpenCV RGB↔YUV (analog, 8-bit offset 128) coefficients.
_RGB2YUV = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.14713, -0.28886, 0.436],
        [0.615, -0.51499, -0.10001],
    ]
)
_YUV2RGB = np.array(
    [
        [1.0, 0.0, 1.13983],
        [1.0, -0.39465, -0.58060],
        [1.0, 2.03211, 0.0],
    ]
)


def equalize_histogram_rgb(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """Equalize the luma of an RGB uint8 image (HWC) in YUV space.

    Mirrors ``HistogramEqualizer.equalize_histogram_rgb``
    (``histogram_equalization.py:9-33``): RGB→YUV, ``equalizeHist`` on Y,
    YUV→RGB. Constant offsets (128) on U/V follow OpenCV's 8-bit convention.
    """
    rgb = jnp.asarray(rgb_u8).astype(jnp.float32)
    # Explicit channel arithmetic (not einsum): these 3×3 "matmuls" are
    # elementwise fusions on the VPU; an einsum forces awkward layouts and
    # costs ~3.6 ms at 512²×8 on v5e.
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    m = _RGB2YUV
    y = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
    u = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b
    v = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b
    y_u8 = jnp.clip(jnp.round(y), 0, 255).astype(jnp.int32)
    y_eq = _equalize_channel_u8_nibble(y_u8).astype(jnp.float32)
    mi = _YUV2RGB
    r2 = mi[0, 0] * y_eq + mi[0, 2] * v
    g2 = mi[1, 0] * y_eq + mi[1, 1] * u + mi[1, 2] * v
    b2 = mi[2, 0] * y_eq + mi[2, 1] * u
    rgb_eq = jnp.stack([r2, g2, b2], axis=-1)
    return jnp.clip(jnp.round(rgb_eq), 0, 255).astype(jnp.uint8)


def _equalize_channel_u8_nibble(chan: jnp.ndarray) -> jnp.ndarray:
    """cv2.equalizeHist, nibble-factored for the MXU. Bit-exact with
    :func:`_equalize_channel_u8`.

    The 256-bin one-hot form scans the image once per bin (≈537 MB of reads
    per 512² image after fusion). Factoring each value ``v = 16·hi + lo``
    into two 16-wide one-hots A, B turns the histogram into the 16×16 matmul
    ``AᵀB`` and the LUT application into ``((A·L)·B).sum(-1)`` — ~2.3× less
    traffic, everything exact (one-hot selections of integers ≤ 2²¹ in bf16
    matmuls with fp32 accumulation).
    """
    flat = chan.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    hi = flat >> 4
    lo = flat & 15
    bins16 = jnp.arange(16, dtype=jnp.int32)
    a = (hi[:, None] == bins16[None, :]).astype(jnp.bfloat16)  # (N, 16)
    b = (lo[:, None] == bins16[None, :]).astype(jnp.bfloat16)  # (N, 16)
    hist = jnp.einsum(
        "nh,nl->hl", a, b, preferred_element_type=jnp.float32
    ).reshape(256)  # hist[16·hi + lo]
    cdf = jnp.cumsum(hist)
    total = jnp.float32(n)
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, total + 1.0))
    denom = jnp.maximum(total - cdf_min, 1.0)
    lut = jnp.clip(jnp.round((cdf - cdf_min) / denom * 255.0), 0.0, 255.0)
    lut2 = lut.reshape(16, 16).astype(jnp.bfloat16)  # L[hi, lo], values ≤255 exact
    rows = jnp.einsum("nh,hl->nl", a, lut2, preferred_element_type=jnp.float32)
    out = (rows * b.astype(jnp.float32)).sum(-1).astype(jnp.int32)
    return out.reshape(chan.shape)


def _equalize_channel_batched(y_i32: jnp.ndarray, use_pallas: bool) -> jnp.ndarray:
    """Batched ``equalizeHist`` on (B, H, W) int channels → int32.

    On TPU the fused Pallas kernel (:mod:`ops.pallas.histeq`) keeps the
    image/histogram/CDF/LUT VMEM-resident — one HBM round trip instead of
    the XLA one-hot form's two (N, 256) materializations (~67 MB each way
    per 512² image).
    """
    if use_pallas:
        from mingraph_unet_tpu.ops.pallas.histeq import equalize_channel_pallas

        return equalize_channel_pallas(y_i32)
    return jax.vmap(_equalize_channel_u8_nibble)(y_i32)


def _histeq_pallas_ok(h: int, w: int) -> bool:
    """Pallas histeq eligibility: TPU backend + kernel shape constraint."""
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing never raises in practice
        return False
    return on_tpu and (h * w) % 4096 == 0


def equalize_histogram_rgb_batched(
    rgb_u8: jnp.ndarray, use_pallas: Optional[bool] = None
) -> jnp.ndarray:
    """Batched :func:`equalize_histogram_rgb` on (B, H, W, 3) uint8 images.

    ``use_pallas=True`` routes the per-image luma equalization through the
    fused Pallas kernel (:mod:`ops.pallas.histeq`); the default is the XLA
    one-hot form, which *wins* on v5e at production shapes (512² b8:
    2.24 ms vs the kernel's 2.87 ms — the kernel is VMEM-resident but its
    batch grid serializes, while the one-hot matmuls ride the MXU across the
    whole batch; measured with loop-variant inputs, scripts/perf_lab.py
    ``histeq``). Bit-exact either way.
    """
    rgb = jnp.asarray(rgb_u8).astype(jnp.float32)
    b_, h, w, _ = rgb.shape
    if use_pallas is None:
        use_pallas = False
    elif use_pallas and not _histeq_pallas_ok(h, w):
        use_pallas = False
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    m = _RGB2YUV
    y = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
    u = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b
    v = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b
    y_u8 = jnp.clip(jnp.round(y), 0, 255).astype(jnp.int32)
    y_eq = _equalize_channel_batched(y_u8, use_pallas).astype(jnp.float32)
    mi = _YUV2RGB
    r2 = mi[0, 0] * y_eq + mi[0, 2] * v
    g2 = mi[1, 0] * y_eq + mi[1, 1] * u + mi[1, 2] * v
    b2 = mi[2, 0] * y_eq + mi[2, 1] * u
    rgb_eq = jnp.stack([r2, g2, b2], axis=-1)
    return jnp.clip(jnp.round(rgb_eq), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Gaussian blur
# ---------------------------------------------------------------------------


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel weights (normalized)."""
    if ksize % 2 == 0:
        raise ValueError("Gaussian kernel size must be odd")
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8  # cv2 default rule
    xs = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(xs**2) / (2.0 * sigma**2))
    return k / k.sum()


def gaussian_blur(img: jnp.ndarray, ksize: Tuple[int, int] = (5, 5), sigma: float = 1.0) -> jnp.ndarray:
    """Separable Gaussian blur of an HWC / NHWC image
    (``gaussian_smoothing.py:23-34``)."""
    squeeze_batch = img.ndim == 3
    if squeeze_batch:
        img = img[None]
    kh = jnp.asarray(gaussian_kernel_1d(ksize[1], sigma), jnp.float32)  # cv2 (w, h) order
    kv = jnp.asarray(gaussian_kernel_1d(ksize[0], sigma), jnp.float32)
    orig_dtype = img.dtype
    x = img.astype(jnp.float32)
    pad_h = ksize[1] // 2
    pad_w = ksize[0] // 2
    cfg = [(0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)]
    x = jnp.pad(x, cfg, mode="reflect")
    x = _depthwise_conv2d(x, kv[:, None])
    x = _depthwise_conv2d(x, kh[None, :])
    if jnp.issubdtype(orig_dtype, jnp.integer):
        x = jnp.clip(jnp.round(x), 0, 255).astype(orig_dtype)
    if squeeze_batch:
        x = x[0]
    return x
