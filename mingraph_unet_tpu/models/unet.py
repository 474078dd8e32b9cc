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

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mingraph_unet_tpu.ops import s2d as s2d_ops

__all__ = ["ConvBlock", "FoldableBatchNorm", "UNetEncoder", "UNetDecoder", "UNet"]

Dtype = Any


def _active_mesh_shape() -> dict:
    """Axis sizes of the device mesh active at trace time ({} when none).

    Reads both the legacy ``with Mesh(...)`` resource env (how this repo's
    sharded paths enter pjit) and the newer ``use_mesh`` abstract mesh.
    Used by the psconv dispatch gate: spatial sharding must fall back to
    the XLA conv lowering, and data-parallel profitability is per-shard.
    """
    try:
        from jax._src import mesh as mesh_lib  # private API, guarded

        pm = mesh_lib.thread_resources.env.physical_mesh
        if not pm.empty:
            return dict(pm.shape)
    except Exception:
        pass
    try:
        am = jax.sharding.get_abstract_mesh()
        if not am.empty:
            return dict(am.shape)
    except Exception:
        pass
    return {}

def _psconv_auto(dtype, b: int, hh: int, ww: int, lanes: int) -> bool:
    """Auto profitability decision for the phase-select Pallas kernel on an
    ``(b, hh, ww)`` s2d grid with ``lanes`` MXU lanes (= 4·channels).

    Measured rule (512² full-pipeline A/B, v5e): the psel trade (16/9×
    FLOPs at full lanes vs the dense s2d form's 4×) pays when per-shard
    s2d-pixels × lanes ≥ 2^25, in bf16 only:

    - 128-lane sites (level-0, 32ch, r3): win from b4 (2^18 px · 128 =
      2^25: 8.60 → 7.78 ms) but lose at b2 (2^24: 3.83 → 4.53) and b1,
      and lose in fp32 (the MXU runs fp32 at 1/8 rate; 256² b1:
      0.52 → 0.80 ms).
    - 256-lane sites (level-1, 64ch, r4): win at b8·128² (2^17 px · 256 =
      2^25): full pipeline 712 → 737 img/s with the level-1 s2d lowering
      on. The same lowering WITHOUT the kernel (dense-s2d XLA) loses
      712 → 651 img/s, which is why ``UNet``'s structural level-1 auto
      ties to this same rule.

    Under a data-parallel mesh the kernel runs per-shard
    (custom_partitioning batch rule), so pixels count per shard; spatial
    sharding disables the kernel entirely (no halo support — ADVICE r3).
    This is the INFERENCE profitability rule; training is gated separately
    (and defaults OFF on a measured negative — ``ConvBlock._psconv_train_on``).
    """
    import os

    sites = os.environ.get("MG_PSCONV_SITES", "auto")
    if sites == "none" or jax.default_backend() != "tpu":
        return False
    mesh_shape = _active_mesh_shape()
    if mesh_shape.get("spatial", 1) > 1:
        return False
    if sites == "all":
        return True
    if sites != "auto":
        return False  # site-forcing debug modes decide per ConvBlock path
    shards = mesh_shape.get("data", 1) * mesh_shape.get("dcn", 1)
    return dtype == jnp.bfloat16 and (b * hh * ww * lanes) // shards >= (1 << 25)


def _phase_pool(y_s2d: jnp.ndarray, train: bool) -> jnp.ndarray:
    """Encoder inter-level MaxPool in s2d layout, kernel-dispatched.

    Inference on TPU with no spatial sharding and enough work per shard
    (the same lane-aware form as ``_psconv_auto``, at a lower threshold —
    the pool is HBM-bound, not MXU-bound) → the relayout-free Pallas pool
    (ops/pallas/pool.py). Everything else (training — the kernel has no
    VJP; CPU; spatially-sharded meshes; small tensors where dispatch
    overhead wins) → the XLA slice-max form (ops/s2d.py::phase_max_pool).
    ``MG_POOL_KERNEL=0`` forces the XLA form (A/B hook for
    scripts/bench_series.py's per-generation arms).
    """
    import os

    b, hh, ww, lanes = y_s2d.shape
    mesh_shape = _active_mesh_shape()
    shards = mesh_shape.get("data", 1) * mesh_shape.get("dcn", 1)
    if (
        os.environ.get("MG_POOL_KERNEL", "1") != "0"
        and not train
        and jax.default_backend() == "tpu"
        and mesh_shape.get("spatial", 1) == 1
        and (b * hh * ww * lanes) // shards >= (1 << 24)
    ):
        from mingraph_unet_tpu.ops.pallas import pool as pool_ops

        return pool_ops.phase_max_pool_pallas(
            y_s2d, interpret=pool_ops._INTERPRET
        )
    return s2d_ops.phase_max_pool(y_s2d)


def _d2s(y_s2d: jnp.ndarray, train: bool) -> jnp.ndarray:
    """Decoder s2d → full-res handoff. A relayout-free Pallas
    ``depth_to_space`` exists (ops/pallas/pool.py) and removes the XLA
    lowering's two-copy chain from the trace (103 + 238 µs at the 512² b8
    level-1 site), but the in-kernel sublane interleaves cost what the
    copies did — full pipeline 10.516 → 10.502 ms/step, a measured NEUTRAL
    (r5, v5e). Default stays on the XLA form (no extra compile time, native
    VJP); ``MG_D2S_KERNEL=1`` dispatches the kernel under the same gate as
    ``_phase_pool`` for future re-measurement at other shapes."""
    import os

    b, hh, ww, lanes = y_s2d.shape
    mesh_shape = _active_mesh_shape()
    shards = mesh_shape.get("data", 1) * mesh_shape.get("dcn", 1)
    if (
        os.environ.get("MG_D2S_KERNEL") == "1"
        and not train
        and jax.default_backend() == "tpu"
        and mesh_shape.get("spatial", 1) == 1
        and (b * hh * ww * lanes) // shards >= (1 << 24)
    ):
        from mingraph_unet_tpu.ops.pallas import pool as pool_ops

        return pool_ops.depth_to_space_pallas(
            y_s2d, interpret=pool_ops._INTERPRET
        )
    return s2d_ops.depth_to_space(y_s2d)


# Layout rule for the s2d ConvBlock (all cutovers measured at 512² b8 on
# v5e, perf_lab ``wconv``): XLA lowers s2d/d2s relayouts ~6× off the HBM
# roofline (the interleaving transpose), so the conv lowering follows the
# layout the input ALREADY has:
# - input full-res NHWC → windowed conv (full MXU lanes at 16/9× FLOPs,
#   s2d output directly, no relayout): 0.58 ms vs 1.50 for s2d+dense at
#   3→32; 0.77 vs ~1.8 at 32→32.
# - input already s2d → the phase-select Pallas kernel when eligible
#   (ops/pallas/psconv.py: 16/9× FLOPs at full lanes, layout-native via a
#   transpose bitcast — production since r3, ~0.5 vs 0.8–2.1 ms/conv),
#   else dense s2d conv (4× FLOPs but zero relayout). The windowed form's
#   d2s costs more than its MXU win (measured 4.3 vs 5.1 ms/block at dec
#   level 0); the patch-matrix Pallas kernel (ops/pallas/wconv.py) lost on
#   assembly copies — see its docstring.


class _ConvParams(nn.Module):
    """Parameter holder with ``nn.Conv``'s exact tree ({kernel, bias}, same
    shapes and initializers) for paths that apply the kernel in transformed
    (s2d / BN-folded) form. Keeps checkpoints interchangeable between
    lowerings."""

    features: int
    in_features: int
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class FoldableBatchNorm(nn.Module):
    """BatchNorm with ``nn.BatchNorm``'s exact param/stat tree whose
    eval-mode affine is exposed for folding into the preceding conv.

    Why: XLA does NOT fuse the eval-mode BN pass into the MXU conv epilogue —
    measured ~5 ms/step across the U-Net at 512² b8 on v5e (each BN is a full
    HBM read+write of the activation). Folding ``y = a·conv(x) + c`` into the
    conv weights removes those passes entirely. Train mode matches flax
    ``nn.BatchNorm`` semantics (biased batch variance, running average
    ``momentum·ra + (1−momentum)·batch``).
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones_init(), (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        self.ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        self.ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

    def eval_affine(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(a, c) with BN_eval(z) = a·z + c, in fp32."""
        a = self.scale * jax.lax.rsqrt(self.ra_var.value + self.epsilon)
        c = self.bias - self.ra_mean.value * a
        return a, c

    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if not train:
            a, c = self.eval_affine()
            return x * a.astype(x.dtype) + c.astype(x.dtype)
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axes)
        var = (xf * xf).mean(axes) - mean * mean  # biased, flax fast-variance
        if not self.is_initializing():
            self.ra_mean.value = self.momentum * self.ra_mean.value + (1 - self.momentum) * mean
            self.ra_var.value = self.momentum * self.ra_var.value + (1 - self.momentum) * var
        a = self.scale * jax.lax.rsqrt(var + self.epsilon)
        c = self.bias - mean * a
        return x * a.astype(x.dtype) + c.astype(x.dtype)


class ConvBlock(nn.Module):
    """(Conv3x3 same → BN → ReLU) ×2, the universal conv unit.

    ``s2d=True`` runs the block in 2×2 space-to-depth layout (input/output
    are phase-major (B, H/2, W/2, 4C) tensors): an exact reparameterization
    with 4× fatter channels that saturates the MXU at the U-Net's
    low-channel levels (see ops/s2d.py). The parameter tree is identical to
    the standard path. ``s2d_in_groups``: full-res channel widths when the
    s2d input is a concat of separately-transformed tensors.
    """

    features: int
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    s2d: bool = False
    s2d_in_groups: Tuple[int, ...] = ()
    # Input arrives full-res NHWC (output is still s2d). Callers that already
    # hold full-res tensors use this to skip the internal d2s: XLA lowers the
    # fused concat→slice→d2s→concat chain of ``depth_to_space_grouped`` on a
    # concatenated s2d input into one slow relayout kernel (~3.8 ms at 512²
    # b8 on v5e vs ~0.2 ms per plain d2s — see perf_lab ``wconv``).
    s2d_in_full_res: bool = False
    # Run eligible s2d→s2d convs through the phase-select Pallas kernel
    # (ops/pallas/psconv.py: 16/9× FLOPs instead of the dense form's 4×).
    # None = auto (TPU backend, inference only); tests force True/False.
    use_psconv: Optional[bool] = None

    def _psconv_on(self, b: int, hh: int, ww: int, lanes: int = 128) -> bool:
        if self.use_psconv is not None:
            return self.use_psconv
        import os

        sites = os.environ.get("MG_PSCONV_SITES", "auto")
        if sites in ("auto", "all", "none"):
            # The measured pixels·lanes ≥ 2^25 rule — see _psconv_auto.
            return _psconv_auto(self.dtype, b, hh, ww, lanes)
        # Site-forcing debug modes (MG_PSCONV_SITES=dec/enc): still subject
        # to the backend + spatial-sharding hard requirements (the kernel
        # cannot halo-exchange across H shards — ADVICE r3).
        if jax.default_backend() != "tpu" or _active_mesh_shape().get("spatial", 1) > 1:
            return False
        path = "/".join(self.scope.path) if self.scope is not None else ""
        return ("decoder" in path and sites in ("dec",)) or (
            "encoder" in path and sites in ("enc",)
        )

    def _psconv_train_on(self, b: int, hh: int, ww: int, lanes: int = 128) -> bool:
        """Training-path psconv gate — default OFF: a measured NEGATIVE.

        The custom_vjp path (fwd/dx psel kernels + operand-einsum dK) is
        grad-parity-tested and dispatchable, but the r4 hardware A/B
        (``scripts/bench_train.py``, v5e, full e2e train step) measured it
        LOSING where the inference rule would engage it: 512² b8 94.8 →
        102.0 ms/step (0.93×). Unlike inference, training reuses the s2d
        activations for dK and dx — XLA keeps one fused dense-s2d layout
        across fwd+bwd, while the psel trade pays its 16/9× three times
        and breaks that reuse. 128² b16 (below the pixel threshold either
        way): 10.53 vs 10.28 ms, noise. MG_PSCONV_TRAIN=on forces the
        kernel back on (same per-shard pixels·lanes profitability rule as
        inference) for future re-measurement; =none keeps the hard off."""
        import os

        mode = os.environ.get("MG_PSCONV_TRAIN", "off")
        if mode not in ("on", "all"):
            return False
        return self._psconv_on(b, hh, ww, lanes)

    def _conv(self, x, kernel, bias):
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, fused_up=None) -> jnp.ndarray:
        if self.s2d:
            return self._call_s2d(x, train, fused_up)
        assert fused_up is None, "fused_up is an s2d-path feature"
        for i in range(2):
            kernel, bias = _ConvParams(self.features, x.shape[-1], name=f"conv{i + 1}")()
            if self.use_batchnorm:
                # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1
                # (flax momentum is the running-average decay: 0.9).
                bn = FoldableBatchNorm(self.features, dtype=self.dtype, name=f"bn{i + 1}")
                if train:
                    x = bn(self._conv(x, kernel, bias), train=True)
                else:
                    # Inference: fold BN into the conv weights — the separate
                    # BN pass is a full HBM round trip XLA does not fuse.
                    a, c = bn.eval_affine()
                    x = self._conv(x, kernel * a, bias * a + c)
            else:
                x = self._conv(x, kernel, bias)
            x = nn.relu(x)
        return x

    def _call_s2d(self, x: jnp.ndarray, train: bool, fused_up=None) -> jnp.ndarray:
        if self.s2d_in_full_res:
            b, h, w, cin = x.shape
            hh, ww = h // 2, w // 2
        elif fused_up is not None:
            b, hh, ww, _ = x.shape
            cin = sum(self.s2d_in_groups)
        else:
            b, hh, ww, cc = x.shape
            cin = cc // 4
        for i in range(2):
            full_res_in = self.s2d_in_full_res and i == 0
            groups = self.s2d_in_groups if (i == 0 and self.s2d_in_groups) else (cin,)
            kernel, bias = _ConvParams(self.features, cin, name=f"conv{i + 1}")()
            bn = (
                FoldableBatchNorm(self.features, dtype=self.dtype, name=f"bn{i + 1}")
                if self.use_batchnorm
                else None
            )
            if bn is not None and not train:
                a, c = bn.eval_affine()
                kernel = kernel * a
                bias = bias * a + c
            fused_epilogue = False
            if fused_up is not None and i == 0:
                # Fused upsample+conv1 (decoder): conv1(concat[skip, up]) with
                # up = x_prev·Wt splits by linearity into
                #   conv(skip, K_a) + conv(x_prev, Wt∘K_b) + biasfield,
                # where Wt∘K_b contracts the ConvTranspose matmul into
                # conv1's kernel. This never materializes the concat or the
                # upsampled tensor in HBM (~1.7 ms/step at 512² b8 on v5e)
                # and runs the x_prev term at its un-upsampled channel width
                # (half the FLOPs of the equivalent conv on ``up``).
                # ``biasfield`` is the conv of the constant upsample-bias map
                # — constant in the interior but attenuated at borders by
                # SAME padding, so it is computed exactly with one conv on a
                # broadcast map (batch-1; hoisted by XLA as loop-invariant).
                x_prev, wt, bias_up = fused_up
                skip_c = groups[0]
                if (
                    not train
                    # 128 = level-0 (32ch) sites; 256 = level-1 (64ch, r4).
                    and 4 * skip_c in (128, 256)
                    and 4 * self.features in (128, 256)
                    and self._psconv_on(b, hh, ww, 4 * min(skip_c, self.features))
                ):
                    # Whole conv1 in one fused Pallas call: skip term via
                    # the phase-select matmuls, x_prev term via tap-pair-
                    # packed matmuls (the ConvTranspose contracted into the
                    # tap matrices, as in the XLA path below), upsample-bias
                    # field + bias + ReLU in the epilogue. A grouped
                    # 256-lane psel over a materialized [skip ‖ up] concat
                    # was also tried (r3): exact, but the up-matmul
                    # materialization plus 2× kernel input traffic lost
                    # ~1.4 ms vs keeping x_prev un-upsampled.
                    from mingraph_unet_tpu.ops.pallas import psconv as psconv_ops

                    km, kp, kc = psconv_ops.dec_conv1_weights(kernel, skip_c, wt)
                    t9 = psconv_ops.dec_conv1_bias_table(
                        kernel, skip_c, bias_up, bias
                    )
                    x = psconv_ops.dec_conv1_fused(
                        x.astype(self.dtype), x_prev.astype(self.dtype),
                        km, kp, kc, t9,
                        interpret=psconv_ops._INTERPRET,
                    )
                    fused_epilogue = True
                else:
                    k2 = s2d_ops.s2d_conv3x3_kernel(kernel, groups)
                    k2a = k2[:, :, : 4 * skip_c, :]
                    k2b = k2[:, :, 4 * skip_c :, :]
                    k2b_x = jnp.einsum(
                        "cq,yxqo->yxco", wt.astype(k2b.dtype), k2b
                    )
                    # The constant upsample-bias field is computed
                    # analytically (ops/s2d.py::conv3x3_s2d_const): as a
                    # conv it stops fusing when conv2 runs in Pallas and
                    # costs ~0.6 ms/step standalone (device trace r3).
                    bias_field = s2d_ops.conv3x3_s2d_const(
                        s2d_ops.s2d_vector(bias_up), k2b, hh, ww
                    )
                    x = (
                        s2d_ops.conv3x3_s2d(x.astype(self.dtype), k2a)
                        + s2d_ops.conv3x3_s2d(x_prev.astype(self.dtype), k2b_x)
                        + bias_field[None].astype(self.dtype)
                    )
            elif full_res_in:
                # Full-res input → windowed lowering, always: it emits the
                # s2d output directly, and the space_to_depth relayout the
                # dense form would need costs more than any conv-time
                # difference (see the layout rule at the top of this file).
                kw = s2d_ops.windowed_down_kernel(kernel)
                x = s2d_ops.conv3x3_windowed_down(x.astype(self.dtype), kw)
            elif (
                not train
                and len(groups) == 1
                and 4 * cin in (128, 256)
                and 4 * self.features in (128, 256)
                and self._psconv_on(b, hh, ww, 4 * min(cin, self.features))
            ):
                # Phase-select Pallas kernel: 4 dense lane-select matmuls
                # (16/9× useful FLOPs) with bias+ReLU fused in the epilogue.
                # Inference-only (no VJP; train keeps the XLA path).
                from mingraph_unet_tpu.ops.pallas import psconv as psconv_ops

                km = psconv_ops.psconv_weights(kernel)
                x = psconv_ops.conv3x3_s2d_psel(
                    x.astype(self.dtype),
                    km,
                    s2d_ops.s2d_vector(bias).astype(jnp.float32),
                    relu=True,
                    interpret=psconv_ops._INTERPRET,
                )
                fused_epilogue = True
            elif (
                train
                and len(groups) == 1
                and 4 * cin in (128, 256)
                and 4 * self.features in (128, 256)
                and self._psconv_train_on(b, hh, ww, 4 * min(cin, self.features))
            ):
                # Training through the phase-select kernel (custom_vjp:
                # adjoint-kernel psel for dx, operand-einsum for dK — both
                # at 16/9× FLOPs vs the dense form's 4×). Raw conv only:
                # bias/BN(batch stats)/ReLU follow in the epilogue below.
                from mingraph_unet_tpu.ops.pallas import psconv as psconv_ops

                x = psconv_ops.psconv_train(
                    x.astype(self.dtype), kernel, interpret=psconv_ops._INTERPRET
                )
            else:
                k2 = s2d_ops.s2d_conv3x3_kernel(kernel, groups)
                x = s2d_ops.conv3x3_s2d(x.astype(self.dtype), k2)
            if not fused_epilogue:
                x = x + s2d_ops.s2d_vector(bias).astype(x.dtype)
                if bn is not None and train:
                    # Per-full-res-channel statistics: fold the 4 phase
                    # groups into the reduction axes so stats/params match
                    # the standard path exactly (shape (C,)).
                    x5 = bn(x.reshape(b, hh, ww, 4, self.features), train=True)
                    x = x5.reshape(b, hh, ww, 4 * self.features)
                x = nn.relu(x)
            cin = self.features
        return x


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool(2,2) stride 2 as two sequential middle-axis reshape-maxes.

    Identical values to ``nn.max_pool`` (VALID floor semantics: odd trailing
    row/col dropped), but avoids the reduce-window lowering — measured
    0.48 → ~0.2 ms at (8, 256², 64) bf16 on v5e (same transpose-free
    pattern as ops/patches.py::patch_reduce_mean).
    """
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2]
    x = x.reshape(b, h // 2 * 2, w // 2, 2, c).max(3)
    return x.reshape(b, h // 2, 2, w // 2, c).max(2)


def _conv_block_cls(remat: bool):
    """ConvBlock, optionally rematerialized: with ``remat=True`` the block's
    activations are recomputed in the backward pass (``jax.checkpoint``),
    trading FLOPs for HBM — the standard TPU recipe for large-resolution
    training where level-0/1 activations dominate memory."""
    if not remat:
        return ConvBlock
    return nn.remat(ConvBlock, static_argnums=(2,))


class UNetEncoder(nn.Module):
    """Downsampling path: ``depth`` ConvBlock+MaxPool stages + bottleneck.

    ``s2d_level0``: run stage 0 in space-to-depth layout (MXU saturation at
    low channel counts; ops/s2d.py). Returns an extra element: stage 0's
    pre-pool activations in s2d layout (or None), so the decoder can consume
    the skip without a relayout round trip.
    """

    init_features: int = 32
    depth: int = 4
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False
    s2d_level0: bool = False
    # Also run stage 1 (the 2nd-largest conv level) in s2d layout: conv1 via
    # the windowed lowering from the pooled full-res input (no explicit
    # relayout), conv2 as a 256-lane s2d conv (psconv-eligible). r4; default
    # off until the TPU A/B lands (ROADMAP).
    s2d_level1: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray, Dict[str, Optional[jnp.ndarray]]]:
        block_cls = _conv_block_cls(self.remat)
        skips: List[jnp.ndarray] = []
        features = self.init_features
        s2d_skips: Dict[str, Optional[jnp.ndarray]] = {"skip0_s2d": None, "skip1_s2d": None}
        use_s2d = self.s2d_level0 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        use_s2d1 = (
            self.s2d_level1
            and self.depth >= 2
            and (x.shape[1] // 2) % 2 == 0
            and (x.shape[2] // 2) % 2 == 0
        )
        for i in range(self.depth):
            if (i == 0 and use_s2d) or (i == 1 and use_s2d1):
                # Full-res input straight into the block: conv1 uses the
                # windowed lowering, so the level never pays an explicit
                # space_to_depth relayout (~0.9 ms at 512² b8 on v5e).
                skip_s2d = block_cls(
                    features,
                    self.use_batchnorm,
                    self.dtype,
                    True,  # s2d
                    (),
                    True,  # s2d_in_full_res
                    name=f"block{i}",
                )(x.astype(self.dtype), train)
                s2d_skips[f"skip{i}_s2d"] = skip_s2d
                skips.append(s2d_ops.depth_to_space(skip_s2d))
                # MaxPool(2,2) == channelwise max over the phase block.
                x = _phase_pool(skip_s2d, train)
            else:
                x = block_cls(features, self.use_batchnorm, self.dtype, name=f"block{i}")(x, train)
                skips.append(x)
                x = _max_pool_2x2(x)
            features *= 2
        bottleneck = block_cls(features, self.use_batchnorm, self.dtype, name="bottleneck")(x, train)
        return skips, bottleneck, s2d_skips


class DecoderBlock(nn.Module):
    """ConvTranspose(k=2, s=2) halving channels → pad to skip size → concat
    [skip, up] → ConvBlock (``model/unet/unet_decoder.py:6-56``).

    ``s2d=True``: the whole block runs in space-to-depth layout — the
    ConvTranspose becomes a pure matmul producing s2d output directly (no
    full-resolution pixel shuffle), the skip arrives as an s2d tensor, and
    the ConvBlock uses grouped-transformed kernels. Returns an s2d tensor.
    """

    out_features: int
    up_features: int  # channels after upsample == in_channels_prev // 2
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False
    s2d: bool = False
    # Forwarded to the inner ConvBlock (None = auto gate); lets tests force
    # the fused dec-conv1 Pallas dispatch on CPU (interpret mode).
    use_psconv: Optional[bool] = None

    @nn.compact
    def __call__(self, x_prev: jnp.ndarray, x_skip: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.s2d:
            return self._call_s2d(x_prev, x_skip, train)
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

    def _call_s2d(self, x_prev: jnp.ndarray, x_skip_s2d: jnp.ndarray, train: bool) -> jnp.ndarray:
        kernel, bias = _ConvParams(
            self.up_features, x_prev.shape[-1], kernel_size=(2, 2), name="upsample"
        )()
        wt = s2d_ops.s2d_convt2x2_kernel(kernel)  # (Cin, 4·up_features)
        if x_prev.shape[:3] != x_skip_s2d.shape[:3]:
            raise ValueError(
                "s2d DecoderBlock requires matching skip/up grids "
                f"(got skip {x_skip_s2d.shape} vs prev {x_prev.shape}); odd "
                "input sizes must use the standard path."
            )
        skip_c = x_skip_s2d.shape[-1] // 4
        block_cls = _conv_block_cls(self.remat)
        # The upsample matmul is folded into the ConvBlock's first conv
        # (fused_up): no concat or upsampled tensor ever hits HBM.
        return block_cls(
            self.out_features,
            self.use_batchnorm,
            self.dtype,
            True,  # s2d
            (skip_c, self.up_features),
            use_psconv=self.use_psconv,
            name="conv_block",
        )(
            x_skip_s2d,
            train,
            (x_prev.astype(self.dtype), wt, bias),
        )


class UNetDecoder(nn.Module):
    """Upsampling path; returns (logits, decoder features shallow→deep).

    ``s2d_level0``: run the last (full-resolution) DecoderBlock in
    space-to-depth layout; ``skip0_s2d`` (from the encoder) avoids a
    relayout round trip when provided.
    """

    num_classes: int = 2
    init_features: int = 32
    depth: int = 4
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False
    s2d_level0: bool = False
    # Run the level-1 (2nd-largest) DecoderBlock in s2d layout too (r4;
    # default off until the TPU A/B lands — see UNetEncoder.s2d_level1).
    s2d_level1: bool = False

    @nn.compact
    def __call__(
        self,
        skips: Sequence[jnp.ndarray],
        bottleneck: jnp.ndarray,
        train: bool = False,
        skip0_s2d: Optional[jnp.ndarray] = None,
        skip1_s2d: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray], Dict[str, Optional[jnp.ndarray]]]:
        x = bottleneck
        s2d_feats: Dict[str, Optional[jnp.ndarray]] = {"f_u0_s2d": None, "f_u1_s2d": None}
        feats_deep_to_shallow: List[jnp.ndarray] = []
        prev_channels = self.init_features * (2**self.depth)
        for j, i in enumerate(reversed(range(self.depth))):
            out_ch = self.init_features * (2**i)
            use_s2d = (
                self.s2d_level0
                and i == 0
                and skips[0].shape[1] == 2 * x.shape[1]
                and skips[0].shape[2] == 2 * x.shape[2]
            )
            use_s2d1 = (
                self.s2d_level1
                and i == 1
                and skips[1].shape[1] == 2 * x.shape[1]
                and skips[1].shape[2] == 2 * x.shape[2]
                and skips[1].shape[1] % 2 == 0
                and skips[1].shape[2] % 2 == 0
            )
            if use_s2d or use_s2d1:
                given = skip0_s2d if i == 0 else skip1_s2d
                skip_s2d = (
                    given if given is not None else s2d_ops.space_to_depth(skips[i])
                )
                f_s2d = DecoderBlock(
                    out_features=out_ch,
                    up_features=prev_channels // 2,
                    use_batchnorm=self.use_batchnorm,
                    dtype=self.dtype,
                    remat=self.remat,
                    s2d=True,
                    name=f"block{j}",
                )(x, skip_s2d, train)
                s2d_feats[f"f_u{i}_s2d"] = f_s2d
                x = _d2s(f_s2d, train)
            else:
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
        f_u0_s2d = s2d_feats["f_u0_s2d"]
        if f_u0_s2d is not None:
            # Final 1×1 conv applied in s2d layout (block-diagonal per-phase
            # matmul — the identical multiply-adds), so the depth-to-space
            # relayout happens on num_classes channels instead of
            # init_features: consumers of the s2d form (pipeline pooling,
            # fusion) leave the full-res f_u[0] dead for XLA to eliminate —
            # the 32-channel d2s + 1×1 chain measured ~2.2 ms/step at 512² b8.
            kernel, bias = _ConvParams(
                self.num_classes, prev_channels, kernel_size=(1, 1), name="final_conv"
            )()
            k2 = s2d_ops.s2d_1x1_kernel(kernel)
            logits_s2d = f_u0_s2d.astype(self.dtype) @ k2.astype(self.dtype)
            logits_s2d = logits_s2d + s2d_ops.s2d_vector(bias).astype(logits_s2d.dtype)
            logits = s2d_ops.depth_to_space(logits_s2d)
        else:
            logits = nn.Conv(
                self.num_classes, kernel_size=(1, 1), dtype=self.dtype, name="final_conv"
            )(x)
        # F_u ordered shallow→deep (unet_decoder.py:143-149).
        return logits.astype(jnp.float32), feats_deep_to_shallow[::-1], s2d_feats


class UNet(nn.Module):
    """Full U-Net: ``__call__(x) -> (logits, encoder_skips, f_u)``.

    ``s2d_level0=True`` runs both full-resolution ConvBlocks (encoder stage
    0 and the last decoder stage) in space-to-depth layout — an exact
    reparameterization with the identical parameter tree (checkpoints are
    interchangeable); see ops/s2d.py for the why. Falls back to the
    standard path for odd input sizes.
    """

    in_channels: int = 3  # informational; NHWC input carries its own C
    num_classes: int = 2
    init_features: int = 32
    depth: int = 4
    use_batchnorm: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False
    s2d_level0: bool = False
    # Extend the s2d lowering one level down (encoder block1 + decoder
    # block at i=1, 256-lane convs). Exact reparameterization like level 0.
    # None = auto (r4): engage at inference exactly when the 256-lane
    # phase-select kernel will run (_psconv_auto) — the lowering WITHOUT
    # the kernel is a measured loss (712 → 651 img/s at 512² b8, dense-s2d
    # 4× FLOPs), WITH it a measured win (712 → 737). Training keeps it off
    # until the train-step A/B lands (ROADMAP).
    s2d_level1: Optional[bool] = None
    # Additionally return {"skip0_s2d", "f_u0_s2d", "skip1_s2d", "f_u1_s2d"}
    # (s2d-layout tensors, or None off the s2d path) as a 4th element.
    # Consumers that pool/fuse from the s2d forms leave the full-res
    # skips[0]/f_u[0] relayouts dead for XLA to eliminate.
    return_s2d_extras: bool = False

    def _resolve_s2d_level1(self, x: jnp.ndarray, train: bool) -> bool:
        """Resolve the tri-state ``s2d_level1`` at trace time (static per
        compiled shape). Auto engages only when the structural lowering and
        the 256-lane kernel gate agree — see the field comment."""
        if self.s2d_level1 is not None:
            return self.s2d_level1
        b, h, w = x.shape[:3]
        lanes1 = 4 * 2 * self.init_features  # level-1 channel width ×4 phases
        return (
            not train
            and self.depth >= 2
            and h % 4 == 0
            and w % 4 == 0
            and lanes1 in (128, 256)
            and _psconv_auto(self.dtype, b, h // 4, w // 4, lanes1)
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = x.astype(self.dtype)
        s2d_level1 = self._resolve_s2d_level1(x, train)
        skips, bottleneck, s2d_skips = UNetEncoder(
            self.init_features, self.depth, self.use_batchnorm, self.dtype, self.remat,
            self.s2d_level0, s2d_level1, name="encoder"
        )(x, train)
        logits, f_u, s2d_feats = UNetDecoder(
            self.num_classes, self.init_features, self.depth, self.use_batchnorm, self.dtype,
            self.remat, self.s2d_level0, s2d_level1, name="decoder"
        )(
            skips, bottleneck, train,
            skip0_s2d=s2d_skips["skip0_s2d"], skip1_s2d=s2d_skips["skip1_s2d"],
        )
        if self.return_s2d_extras:
            return logits, skips, f_u, {**s2d_skips, **s2d_feats}
        return logits, skips, f_u
