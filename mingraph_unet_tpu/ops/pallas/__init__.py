"""Pallas (Mosaic) TPU kernels — the native performance tier.

The reference delegates heavy work to library internals (SURVEY §2.7); here
the profiled hot spots that XLA cannot fuse well become hand-written TPU
kernels, each with a jnp reference implementation, an interpret-mode test
path, and an automatic fallback on non-TPU backends.
"""

from mingraph_unet_tpu.ops.pallas.histeq import equalize_channel_pallas  # noqa: F401
