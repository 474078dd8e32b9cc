"""U-Net encoder / decoder in Flax (NHWC, bf16-capable).

TPU-native re-design of the reference PyTorch U-Net:

- ``ConvBlock``: (Conv3x3 → BatchNorm → ReLU) ×2
  (``model/unet/unet_encoder.py:4-25``).
- ``UNetEncoder``: ``depth`` ConvBlock+MaxPool stages, channels doubling from
  ``init_features``; bottleneck ConvBlock; returns skips (shallow→deep) and
  bottleneck (``model/unet/unet_encoder.py:27-74``).
- ``UNetDecoder``: ``depth`` stages of ConvTranspose(k=2, s=2) halving
  channels, odd-size padding, skip concat, ConvBlock; final 1×1 conv to
  ``num_classes``; returns (logits, decoder features shallow→deep) — the
  latter is ``F_u`` for fusion (``model/unet/unet_decoder.py:58-149``).
- ``UNet``: encoder∘decoder; ``forward(x) -> (logits, skips, f_u)``
  (``model/unet/unet_model.py:6-36``).

Shape schedule for (128², init=32, depth=4) matches the reference's
documented expectations (``unet_encoder.py:88-93``, ``unet_decoder.py:171-175``)
with NCHW→NHWC transposition.

TPU notes: layout is NHWC so convolutions tile directly onto the MXU;
``dtype=jnp.bfloat16`` runs all conv math in bf16 while keeping fp32
parameters and batch statistics; XLA fuses the BN+ReLU chains into the conv
epilogues (verified against a hand-written Pallas fusion in
``ops/pallas``, which is used when it wins).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ConvBlock", "UNetEncoder", "UNetDecoder", "UNet"]

Dtype = Any


class ConvBlock(nn.Module):
    """(Conv3x3 same → BN → ReLU) ×2, the universal conv unit."""

    features: int
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding=1,
                use_bias=True,
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )(x)
            if self.use_batchnorm:
                # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1
                # (flax momentum is the running-average decay: 0.9).
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"bn{i + 1}",
                )(x)
            x = nn.relu(x)
        return x


def _conv_block_cls(remat: bool):
    """ConvBlock, optionally rematerialized: with ``remat=True`` the block's
    activations are recomputed in the backward pass (``jax.checkpoint``),
    trading FLOPs for HBM — the standard TPU recipe for large-resolution
    training where level-0/1 activations dominate memory."""
    if not remat:
        return ConvBlock
    return nn.remat(ConvBlock, static_argnums=(2,))


class UNetEncoder(nn.Module):
    """Downsampling path: ``depth`` ConvBlock+MaxPool stages + bottleneck."""

    init_features: int = 32
    depth: int = 4
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        block_cls = _conv_block_cls(self.remat)
        skips: List[jnp.ndarray] = []
        features = self.init_features
        for i in range(self.depth):
            x = block_cls(features, self.use_batchnorm, self.dtype, name=f"block{i}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            features *= 2
        bottleneck = block_cls(features, self.use_batchnorm, self.dtype, name="bottleneck")(x, train)
        return skips, bottleneck


class DecoderBlock(nn.Module):
    """ConvTranspose(k=2, s=2) halving channels → pad to skip size → concat
    [skip, up] → ConvBlock (``model/unet/unet_decoder.py:6-56``)."""

    out_features: int
    up_features: int  # channels after upsample == in_channels_prev // 2
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x_prev: jnp.ndarray, x_skip: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x_up = nn.ConvTranspose(
            self.up_features,
            kernel_size=(2, 2),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            name="upsample",
        )(x_prev)
        # Odd-size mismatch: pad x_up to the skip's spatial dims, split
        # left/right like the reference's F.pad (unet_decoder.py:44-50).
        dh = x_skip.shape[1] - x_up.shape[1]
        dw = x_skip.shape[2] - x_up.shape[2]
        if dh or dw:
            x_up = jnp.pad(
                x_up,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            )
        x = jnp.concatenate([x_skip, x_up], axis=-1)
        block_cls = _conv_block_cls(self.remat)
        return block_cls(self.out_features, self.use_batchnorm, self.dtype, name="conv_block")(x, train)


class UNetDecoder(nn.Module):
    """Upsampling path; returns (logits, decoder features shallow→deep)."""

    num_classes: int = 2
    init_features: int = 32
    depth: int = 4
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self, skips: Sequence[jnp.ndarray], bottleneck: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        x = bottleneck
        feats_deep_to_shallow: List[jnp.ndarray] = []
        prev_channels = self.init_features * (2**self.depth)
        for j, i in enumerate(reversed(range(self.depth))):
            out_ch = self.init_features * (2**i)
            x = DecoderBlock(
                out_features=out_ch,
                up_features=prev_channels // 2,
                use_batchnorm=self.use_batchnorm,
                dtype=self.dtype,
                remat=self.remat,
                name=f"block{j}",
            )(x, skips[i], train)
            feats_deep_to_shallow.append(x)
            prev_channels = out_ch
        logits = nn.Conv(
            self.num_classes, kernel_size=(1, 1), dtype=self.dtype, name="final_conv"
        )(x)
        # F_u ordered shallow→deep (unet_decoder.py:143-149).
        return logits.astype(jnp.float32), feats_deep_to_shallow[::-1]


class UNet(nn.Module):
    """Full U-Net: ``__call__(x) -> (logits, encoder_skips, f_u)``."""

    in_channels: int = 3  # informational; NHWC input carries its own C
    num_classes: int = 2
    init_features: int = 32
    depth: int = 4
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = x.astype(self.dtype)
        skips, bottleneck = UNetEncoder(
            self.init_features, self.depth, self.use_batchnorm, self.dtype, self.remat, name="encoder"
        )(x, train)
        logits, f_u = UNetDecoder(
            self.num_classes, self.init_features, self.depth, self.use_batchnorm, self.dtype,
            self.remat, name="decoder"
        )(skips, bottleneck, train)
        return logits, skips, f_u
