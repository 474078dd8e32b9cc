"""ctypes binding for the native C++ decode/resize batch loader.

Builds ``native/libmgu_native.so`` on demand (``make -C native``) and exposes
:func:`load_batch`; anything it cannot handle (non-PNG, exotic bit depths)
falls back to the cv2 path in :mod:`mingraph_unet_tpu.data.dataset`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["available", "load_batch", "load_image", "load_mask"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libmgu_native.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # pragma: no cover
            print(f"[native_loader] build failed, falling back to cv2: {e}")
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover
        print(f"[native_loader] dlopen failed: {e}")
        return None
    lib.mgu_load_image.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.mgu_load_mask.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.mgu_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    for fn in (lib.mgu_load_image, lib.mgu_load_mask, lib.mgu_load_batch):
        fn.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def load_image(path: str, size: Tuple[int, int]) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((*size, 3), np.uint8)
    if lib.mgu_load_image(path.encode(), size[0], size[1], _as_u8_ptr(out)) != 0:
        return None
    return out


def load_mask(path: str, size: Tuple[int, int]) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(size, np.uint8)
    if lib.mgu_load_mask(path.encode(), size[0], size[1], _as_u8_ptr(out)) != 0:
        return None
    return out


def load_batch(
    image_paths: List[str],
    mask_paths: Optional[List[str]],
    size: Tuple[int, int],
    threads: int = 4,
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """Decode + resize a batch with the native thread pool.

    Returns (images (N, H, W, 3) u8, masks (N, H, W) u8 or None), or None if
    the native library is unavailable or any file failed (caller falls back).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(image_paths)
    h, w = size
    imgs = np.empty((n, h, w, 3), np.uint8)
    masks = np.empty((n, h, w), np.uint8) if mask_paths is not None else None
    c_imgs = (ctypes.c_char_p * n)(*[p.encode() for p in image_paths])
    c_masks = (
        (ctypes.c_char_p * n)(*[p.encode() for p in mask_paths]) if mask_paths is not None else None
    )
    failures = lib.mgu_load_batch(
        c_imgs,
        c_masks,
        n,
        h,
        w,
        _as_u8_ptr(imgs),
        _as_u8_ptr(masks) if masks is not None else None,
        threads,
    )
    if failures:
        return None
    return imgs, masks
