"""Core image transforms: resize, normalization, synced geometric augmentation.

TPU-native equivalent of the reference ``ImagePreprocessor``
(``preprocessing/image_preprocessing/image_preprocess.py:6-126``): the
PIL/torchvision pipeline (BGR→RGB → PIL Resize → ToTensor → Normalize, with
RandomHorizontalFlip + RandomRotation in training mode) becomes pure ``jnp``
functions composable under ``jax.jit`` and ``vmap``.

Design notes
------------
- Layout is NHWC (TPU-friendly); the reference uses NCHW.
- Augmentations take explicit PRNG keys and are applied to image and mask with
  the *same* key, fixing the reference's unsynced image/mask augmentation
  (acknowledged at ``image_preprocess.py:151-154``).
- Mask resize reproduces cv2 ``INTER_NEAREST`` source-index selection
  (``sx = floor(dx * src/dst)``), as used at ``image_preprocess.py:117``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "normalize",
    "denormalize",
    "resize_bilinear",
    "resize_nearest",
    "preprocess_image",
    "preprocess_mask",
    "random_horizontal_flip",
    "random_rotation",
    "augment_image",
    "augment_pair",
    "rgb_to_gray",
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(img: jnp.ndarray, mean: Sequence[float], std: Sequence[float]) -> jnp.ndarray:
    """Channel-wise normalize an image in [0, 1], HWC or NHWC."""
    mean_a = jnp.asarray(mean, dtype=img.dtype)
    std_a = jnp.asarray(std, dtype=img.dtype)
    return (img - mean_a) / std_a


def denormalize(img: jnp.ndarray, mean: Sequence[float], std: Sequence[float]) -> jnp.ndarray:
    """Invert :func:`normalize` (used to recover RGB for Sobel / hist-eq
    auxiliary features, cf. ``scripts/graph_refinement.py:50-59``)."""
    mean_a = jnp.asarray(mean, dtype=img.dtype)
    std_a = jnp.asarray(std, dtype=img.dtype)
    return img * std_a + mean_a


def resize_bilinear(img: jnp.ndarray, size: Tuple[int, int], antialias: bool = True) -> jnp.ndarray:
    """Bilinear resize of an HWC / NHWC float image to ``size=(H, W)``.

    ``antialias=True`` approximates PIL's ``Resize`` used by the reference
    pipeline; half-pixel centers == ``align_corners=False``.
    """
    spatial = img.shape[:-1] if img.ndim == 3 else img.shape[1:-1]
    if tuple(spatial) == tuple(size):
        return img
    if img.ndim == 3:
        shape = (size[0], size[1], img.shape[-1])
    else:
        shape = (img.shape[0], size[0], size[1], img.shape[-1])
    return jax.image.resize(img, shape, method="linear", antialias=antialias)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """cv2 ``INTER_NEAREST``-compatible resize for label maps.

    Works on HW, HWC, NHW or NHWC arrays; the last two spatial dims of the
    (optionally channel-suffixed) array are resized. Source index selection is
    ``sx = floor(dx * src_size / dst_size)``, matching OpenCV.
    """
    # Masks are HW or NHW (no channel dim); HWC would be ambiguous with NHW.
    if x.ndim == 2:
        h_axis, w_axis = 0, 1
    elif x.ndim == 3:
        h_axis, w_axis = 1, 2  # NHW
    else:
        raise ValueError("resize_nearest expects HW or NHW arrays")
    src_h, src_w = x.shape[h_axis], x.shape[w_axis]
    dst_h, dst_w = size
    if (src_h, src_w) == (dst_h, dst_w):
        return x
    rows = jnp.minimum((jnp.arange(dst_h) * src_h) // dst_h, src_h - 1)
    cols = jnp.minimum((jnp.arange(dst_w) * src_w) // dst_w, src_w - 1)
    x = jnp.take(x, rows, axis=h_axis)
    x = jnp.take(x, cols, axis=w_axis)
    return x


def preprocess_image(
    img_u8: jnp.ndarray,
    size: Tuple[int, int],
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jnp.ndarray:
    """uint8 RGB HWC → normalized float32 HWC at ``size``.

    Equivalent of the reference base transform chain ToPILImage → Resize →
    ToTensor → Normalize (``image_preprocess.py:26-31``), minus the NCHW
    permute (we stay NHWC).
    """
    img = img_u8.astype(jnp.float32) / 255.0
    img = resize_bilinear(img, size)
    return normalize(img, mean, std)


def preprocess_mask(mask: jnp.ndarray, size: Tuple[int, int], num_classes: int) -> jnp.ndarray:
    """Label-map HW (or NHW) → int32 at ``size`` clipped to [0, C-1]
    (reference ``image_preprocess.py:87-126``)."""
    mask = resize_nearest(mask, size)
    return jnp.clip(mask.astype(jnp.int32), 0, num_classes - 1)


# ---------------------------------------------------------------------------
# Synced geometric augmentation
# ---------------------------------------------------------------------------


def random_horizontal_flip(
    key: jax.Array, img: jnp.ndarray, mask: Optional[jnp.ndarray] = None, prob: float = 0.5
):
    """Random horizontal flip with one coin shared by image (HWC) and mask (HW)."""
    do_flip = jax.random.bernoulli(key, prob)
    img_out = jnp.where(do_flip, img[:, ::-1, :], img)
    if mask is None:
        return img_out
    mask_out = jnp.where(do_flip, mask[:, ::-1], mask)
    return img_out, mask_out


def _axis_interp_matrix(src: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """(out, in) 1-D linear-interpolation matrix for sample positions ``src``.

    Row o carries the bilinear tent weights ``max(0, 1 − |src[o] − u|)`` —
    identical values (incl. the zero fill outside [0, in_size−1]) to
    gather-based bilinear sampling, but applied as a matmul: XLA lowers the
    2-D fancy-index gather ~20× off the roofline on TPU (13.5 ms per warp
    at b16 128², perf_lab) while the MXU does this for free.
    """
    u = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - u))


def _axis_nearest_matrix(src: jnp.ndarray, in_size: int) -> jnp.ndarray:
    """(out, in) 1-D nearest-neighbor selection matrix (0 fill outside)."""
    u = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    idx = jnp.round(src)[:, None]
    return ((u == idx) & (idx >= 0) & (idx <= in_size - 1)).astype(jnp.float32)


def _shear_weights(shifts: jnp.ndarray, size: int, nearest: bool) -> jnp.ndarray:
    """(rows, out, in) banded 1-D resampling weights for per-row uniform
    shifts: ``w[r, o, i] = tent(o + shifts[r] − i)`` (or the one-hot nearest
    form). Zero fill outside the image falls out of the tent support.

    Why a dense banded matrix: both the 2-D fancy-index gather (13.5 ms per
    warp) and a vmapped contiguous dynamic slice (~1.7 ms per pass,
    latency-bound regardless of size) lower poorly on TPU at b16 128²;
    building the weights with vector ops and contracting on the MXU runs at
    memory speed.
    """
    u = jnp.arange(size, dtype=jnp.float32)
    src = u[None, :] + shifts[:, None]  # (rows, out)
    if nearest:
        idx = jnp.round(src)[..., None]
        return ((u == idx) & (idx >= 0) & (idx <= size - 1)).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - u))


def _shear_cols(img: jnp.ndarray, shifts: jnp.ndarray, nearest: bool):
    """Resample each row at ``x + shifts[row]`` (1-D, zero fill)."""
    w = img.shape[1]
    wm = _shear_weights(shifts, w, nearest)  # (h, w_out, w_in)
    if img.ndim == 3:
        return jnp.einsum("ywu,yuc->ywc", wm, img)
    return jnp.einsum("ywu,yu->yw", wm, img)


def _shear_rows(img: jnp.ndarray, shifts: jnp.ndarray, nearest: bool):
    """Resample each column at ``y + shifts[col]`` (1-D, zero fill)."""
    h = img.shape[0]
    wm = _shear_weights(shifts, h, nearest)  # (w, h_out, h_in)
    if img.ndim == 3:
        return jnp.einsum("xyv,vxc->yxc", wm, img)
    return jnp.einsum("xyv,vx->yx", wm, img)


def random_rotation(
    key: jax.Array,
    img: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    degrees: float = 15.0,
):
    """Random rotation in [-degrees, +degrees] about the center.

    Image (HWC) interpolated linearly with zero fill; mask (HW) sampled
    nearest-neighbor — both with the same angle. Equivalent of torchvision's
    ``RandomRotation(degrees)`` (reference ``image_preprocess.py:47-48``)
    with the mask kept geometrically consistent.

    Lowering: the classic three-shear factorization
    ``R(−θ) = Sx(tan θ/2) · Sy(−sin θ) · Sx(tan θ/2)`` — each shear is a
    banded-matrix contraction on the MXU (see ``_shear_weights``), vs
    ~13.5 ms for the direct 2-D bilinear gather at b16 128² (the gather
    lowering is ~20× off the roofline). Exact identity at θ=0; resampling
    values differ from direct bilinear only by the standard three-pass
    interpolation (each pass is 1-D linear).

    Sign convention: a positive sampled angle rotates the content the same
    direction as a direct bilinear warp at +θ (the three-shear factorization
    realizes R(−θ), so the sampled angle is negated before the shears).
    """
    angle = -jax.random.uniform(key, (), minval=-degrees, maxval=degrees) * jnp.pi / 180.0
    h, w = img.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    alpha = jnp.tan(angle / 2.0)
    beta = -jnp.sin(angle)
    dy = jnp.arange(h, dtype=jnp.float32) - cy
    dx = jnp.arange(w, dtype=jnp.float32) - cx

    def warp(t, nearest):
        t = _shear_cols(t, alpha * dy, nearest)
        t = _shear_rows(t, beta * dx, nearest)
        return _shear_cols(t, alpha * dy, nearest)

    img_out = warp(img, nearest=False)
    if mask is None:
        return img_out
    mask_f = warp(mask.astype(jnp.float32), nearest=True)
    return img_out, jnp.rint(mask_f).astype(mask.dtype)


def random_resized_crop(
    key: jax.Array,
    img: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    prob: float = 0.5,
    scale: Tuple[float, float] = (0.8, 1.0),
    ratio: Tuple[float, float] = (0.75, 4.0 / 3.0),
):
    """Synced RandomResizedCrop (area-scale + aspect-ratio jitter, resampled
    back to the input size).

    The reference *configures* a crop probability
    (``configs/preprocessing.yaml`` ``random_crop_prob``) and sketches
    ``RandomResizedCrop`` in a comment (``image_preprocess.py:40, 48``) but
    never applies it; this implements the op for real — image bilinear, mask
    nearest, same crop window for both — expressed as affine resampling so
    shapes stay static under jit.
    """
    k_apply, k_area, k_ratio, k_y, k_x = jax.random.split(key, 5)
    h, w = img.shape[:2]
    apply = jax.random.bernoulli(k_apply, prob)
    area_frac = jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k_ratio, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    crop_h = jnp.clip(jnp.sqrt(area_frac / aspect) * h, 1.0, h)
    crop_w = jnp.clip(jnp.sqrt(area_frac * aspect) * w, 1.0, w)
    y0 = jax.random.uniform(k_y, (), minval=0.0, maxval=1.0) * (h - crop_h)
    x0 = jax.random.uniform(k_x, (), minval=0.0, maxval=1.0) * (w - crop_w)
    # Identity window when not applied.
    crop_h = jnp.where(apply, crop_h, float(h))
    crop_w = jnp.where(apply, crop_w, float(w))
    y0 = jnp.where(apply, y0, 0.0)
    x0 = jnp.where(apply, x0, 0.0)

    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * crop_h + y0 - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * crop_w + x0 - 0.5
    # The sampling map is axis-separable, so the bilinear resample factors
    # exactly into two 1-D interpolation matmuls (identical weights and
    # zero fill; only fp association differs) — the 2-D gather this
    # replaces cost ~13.5 ms at b16 128² on TPU (perf_lab).
    my = _axis_interp_matrix(ys, h)
    mx = _axis_interp_matrix(xs, w)
    img_out = jnp.einsum("xu,yuc->yxc", mx, jnp.tensordot(my, img, axes=(1, 0)))
    if mask is None:
        return img_out
    ny = _axis_nearest_matrix(ys, h)
    nx = _axis_nearest_matrix(xs, w)
    mask_f = jnp.tensordot(ny, mask.astype(jnp.float32), axes=(1, 0))
    mask_out = jnp.rint(jnp.tensordot(mask_f, nx, axes=(1, 1))).astype(mask.dtype)
    return img_out, mask_out


def augment_image(
    key: jax.Array,
    img: jnp.ndarray,
    flip_prob: float = 0.5,
    rotation_degrees: float = 15.0,
    crop_prob: float = 0.0,
) -> jnp.ndarray:
    """Image-only flip + rotation (+ optional crop) — every channel of ``img``
    (HWC, any C) receives the same geometric transform, linearly interpolated.

    This is the binary-mask fast path's workhorse: a {0,1} mask (or a stack of
    instance channels) packed as extra image channels rides the SAME banded
    MXU contractions as the RGB planes and is rounded back to {0,1} afterwards
    — for a binary plane, ``rint(linear-warp)`` is exactly the argmax of the
    one-hot linear warp, i.e. a majority-vote nearest assignment. The MXU
    einsums contract at N=C lanes out of 128, so the extra channels are free,
    while the separate per-pass nearest-matrix warp they replace ran as VPU
    loop fusions (measured 3 x 2.41 ms of the 512-squared b8 e2e train step;
    the packed form retired them for +0.1 ms on the image warp).

    Uses the same per-op key-split schedule as :func:`augment_pair`, so an
    image augmented here and a (img, mask) pair augmented there with the same
    key receive identical transform draws.
    """
    k_flip, k_rot, k_crop = jax.random.split(key, 3)
    img = random_horizontal_flip(k_flip, img, None, flip_prob)
    img = random_rotation(k_rot, img, None, rotation_degrees)
    if crop_prob > 0.0:
        img = random_resized_crop(k_crop, img, None, prob=crop_prob)
    return img


def augment_pair(
    key: jax.Array,
    img: jnp.ndarray,
    mask: jnp.ndarray,
    flip_prob: float = 0.5,
    rotation_degrees: float = 15.0,
    crop_prob: float = 0.0,
):
    """Synced flip + rotation (+ optional resized crop) for one (HWC image,
    HW mask) pair.

    The training-mode augmentation chain of the reference
    (``image_preprocess.py:42-51``), applied consistently to both tensors.
    ``crop_prob`` applies :func:`random_resized_crop` — the knob the
    reference configures (``preprocessing.yaml`` ``random_crop_prob``) but
    never wires (``image_preprocess.py:40, 48``).
    Rotation runs on the *unnormalized-or-normalized* image equally well since
    fill is 0; callers that normalize first should accept 0-filled borders in
    normalized space (the torchvision reference rotates pre-normalization with
    0-filled borders in [0,1] space; pass the unnormalized image here and
    normalize afterwards to match).
    """
    k_flip, k_rot, k_crop = jax.random.split(key, 3)
    img, mask = random_horizontal_flip(k_flip, img, mask, flip_prob)
    img, mask = random_rotation(k_rot, img, mask, rotation_degrees)
    if crop_prob > 0.0:
        img, mask = random_resized_crop(k_crop, img, mask, prob=crop_prob)
    return img, mask


_GRAY_WEIGHTS = (0.299, 0.587, 0.114)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """RGB→gray with OpenCV weights (…, H, W, 3) → (…, H, W)."""
    w = jnp.asarray(_GRAY_WEIGHTS, dtype=img.dtype)
    return jnp.tensordot(img, w, axes=[[-1], [0]])
