"""MinGraphUNet: the full batched pipeline (U-Net → patch graph → GAT →
MinCut → region GAT → fusion → detection).

This is the TPU-native flagship model, replacing the reference's per-image
Python graph loop (``scripts/train_end_to_end.py:300-425``, "the scalability
sin" per SURVEY §3.1) with one shape-static batched program:

Stage 1  U-Net forward → logits, encoder skips, decoder features F_u
         (``train_end_to_end.py:274``).
Stage 2  Patch-node features — **de-stubbed**: the reference fills these with
         ``torch.randn`` (line 326) and raises NotImplementedError in
         ``get_patch_features_from_unet_encoder``
         (``patch_graph_construction.py:104-136``); the intended recipe is
         demonstrated in ``scripts/graph_refinement.py:76-111``: pooled U-Net
         features ⊕ Sobel patch means ⊕ hist-eq patch means. Implemented here
         as patch-pooling of encoder skip 0 (projected to the configured
         width), plus Sobel/hist-eq channels computed in-graph from the
         denormalized input. Aux channels are scaled to [0, 1] (divergence:
         the reference demo concatenates raw [0, 255] means against ~unit
         U-Net features, a scale mismatch we fix).
Stage 3  Patch GAT over the 4-connected lattice (shift-based attention).
Stage 4  MinCut: segment predictor + Ncut loss → (L_partition, soft S*),
         hard labels by argmax (lines 348-356).
Stage 5  Region pooling (segment-mean as one-hot matmul), fully-connected
         K-region graph, region GAT (lines 368-384); K=1 degenerates to a
         passthrough like the reference's no-edge fallback (lines 440-446).
Stage 6  Region embeddings broadcast to pixels (nearest/block upsample,
         lines 403-422) and fused with F_u[0] (lines 440-444).
Stage 7  Detection head → bbox (B, 4), confidence (B, 1) (lines 450-453).

Everything vectorizes over the batch; the lattice edge structure is implicit
(no edge lists at runtime). All loss *inputs* that need ground truth are
returned so trainers can assemble L_total; L_partition itself is computed
in-graph.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mingraph_unet_tpu.models.detection import DetectionHead
from mingraph_unet_tpu.models.fusion import fuse_features
from mingraph_unet_tpu.models.gat import DenseGAT, GATNetwork, fully_connected_adjacency
from mingraph_unet_tpu.models.mincut import MinCutRefinement
from mingraph_unet_tpu.models.unet import UNet
from mingraph_unet_tpu.ops import filters
from mingraph_unet_tpu.ops import s2d as s2d_ops
from mingraph_unet_tpu.ops.image import denormalize
from mingraph_unet_tpu.ops.patches import broadcast_patch_to_pixels, patch_reduce_mean
from mingraph_unet_tpu.ops.segment import gather_rows, segment_mean

__all__ = ["MinGraphUNet"]


class MinGraphUNet(nn.Module):
    # U-Net
    num_classes: int = 2
    init_features: int = 32
    depth: int = 4
    use_batchnorm: bool = True
    remat: bool = False
    # Run the full-resolution U-Net levels in space-to-depth layout (exact
    # reparameterization, ~2× faster at 512² on v5e; ops/s2d.py). Same param
    # tree either way — checkpoints are interchangeable.
    unet_s2d_level0: bool = True
    # Level-1 s2d extension (r4). None = auto: engage at inference exactly
    # when the 256-lane phase-select kernel will run (measured 712 → 737
    # img/s at 512² b8 v5e; a LOSS without the kernel — see UNet.s2d_level1).
    unet_s2d_level1: Optional[bool] = None
    # Graph construction
    patch_size: int = 16
    unet_patch_feature_dim: int = 16
    sobel_kernel_size: int = 3
    normalization_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    normalization_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # GAT
    gat_hidden_dim: int = 128
    gat_output_dim: int = 64
    gat_num_heads: int = 4
    gat_num_layers: int = 1
    gat_dropout: float = 0.1
    gat_alpha: float = 0.2
    # MinCut
    num_segments: int = 2
    sigma_ncut: float = 1.0
    # Detection
    num_detection_classes: int = 1
    fc_hidden_dim: int = 256
    # Pre-pool the fused map to ≤S×S before the detection conv stack (the
    # convs' output is globally averaged anyway; running them at 512² costs
    # ~9 ms/step for features the mean immediately discards). None = the
    # reference-exact full-resolution path.
    detection_pre_pool: Optional[int] = None
    # Optional multi-instance dense head (objectness + box per patch cell);
    # the reference-parity single-box head always runs.
    use_dense_detection: bool = False
    # --- Ablation stage toggles (paper Table 3; reference
    # ``ablation_study.py:36-40`` demands the loader "instantiate the ablated
    # model" but provides no switches — these are them). Each `False` removes
    # the stage's parameters and passes features through:
    #   use_patch_gat=False  — patch features skip GAT refinement (linear
    #                          projection to the GAT width instead).
    #   use_partition=False  — no MinCut stage: L_partition ≡ 0 and the
    #                          patch-level embeddings broadcast to pixels
    #                          directly (no region pooling / region GAT).
    #   use_region_gat=False — region embeddings are the pooled segment
    #                          means without the K-region GAT pass.
    #   use_fusion=False     — detection sees F_u[0] only (no graph branch
    #                          features in the fused map).
    use_patch_gat: bool = True
    use_partition: bool = True
    use_region_gat: bool = True
    use_fusion: bool = True
    # Compute dtype (params stay fp32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        train: bool = False,
        unet_outputs: Optional[Tuple] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Full pipeline forward.

        ``unet_outputs``: optional precomputed ``(logits, skips, f_u)`` —
        large-scene mode runs the U-Net tile-by-tile with halos
        (``parallel/spatial.py``), stitches, and then runs the graph branch
        ONCE over the whole scene's patch lattice here (global refinement,
        not per-tile; SURVEY §5 long-context row). Parameter tree is
        unchanged (the unet params are simply unused in that call).
        """
        deterministic = not train
        b, h, w, _ = images.shape
        if h % self.patch_size or w % self.patch_size:
            raise ValueError(
                f"Input {h}x{w} must be a multiple of patch_size={self.patch_size} "
                "(use ops.patches.pad_to_multiple upstream)."
            )

        # === Stage 1: U-Net ===
        skip0_s2d = f_u0_s2d = None
        if unet_outputs is not None:
            logits, skips, f_u = unet_outputs
        else:
            logits, skips, f_u, s2d_extras = UNet(
                num_classes=self.num_classes,
                init_features=self.init_features,
                depth=self.depth,
                use_batchnorm=self.use_batchnorm,
                dtype=self.dtype,
                remat=self.remat,
                s2d_level0=self.unet_s2d_level0,
                s2d_level1=self.unet_s2d_level1,
                return_s2d_extras=True,
                name="unet",
            )(images, train=train)
            skip0_s2d = s2d_extras["skip0_s2d"]
            f_u0_s2d = s2d_extras["f_u0_s2d"]

        # === Stage 2: initial patch-node features (real, not stubbed) ===
        # Pool from the s2d-layout skip when available: the pooled result is
        # identical (same values, fp summation order aside) and the full-res
        # skips[0] relayout then has no in-graph consumer.
        if skip0_s2d is not None:
            unet_patch = s2d_ops.patch_reduce_mean_s2d(skip0_s2d, self.patch_size)
        else:
            unet_patch = patch_reduce_mean(skips[0], self.patch_size)  # (B, nph, npw, F0)
        unet_patch = nn.Dense(
            self.unet_patch_feature_dim, dtype=self.dtype, name="patch_feature_proj"
        )(unet_patch)
        # Sobel / hist-eq aux features operate on the first 3 bands; extra
        # spectral bands (multi-spectral scenes, BASELINE config 5) still flow
        # through the U-Net and the pooled-feature projection above.
        c_in = images.shape[-1]
        if c_in < 3:
            raise ValueError("MinGraphUNet expects >= 3 input bands")
        mean3 = tuple(self.normalization_mean)[:3] if len(self.normalization_mean) >= 3 else self.normalization_mean
        std3 = tuple(self.normalization_std)[:3] if len(self.normalization_std) >= 3 else self.normalization_std
        rgb255 = jnp.clip(
            denormalize(images[..., :3].astype(jnp.float32), mean3, std3),
            0.0,
            1.0,
        ) * 255.0
        # Flat-view lowering: full-lane gray/stencil/pooling — the (…, 3)
        # layout runs at 3/128 lane occupancy (ops/filters.py docstring).
        sobel_patch = filters.sobel_patch_mean(
            rgb255, self.patch_size, self.sobel_kernel_size
        )
        # Batched hist-eq: Pallas fused kernel on TPU, XLA one-hot elsewhere
        # (bit-exact either way; see ops/pallas/histeq.py).
        histeq = filters.equalize_histogram_rgb_batched(
            jnp.clip(jnp.round(rgb255), 0, 255).astype(jnp.uint8)
        ).astype(jnp.float32)
        histeq_patch = patch_reduce_mean(histeq / 255.0, self.patch_size)
        patch_feats = jnp.concatenate(
            [unet_patch.astype(jnp.float32), sobel_patch, histeq_patch], axis=-1
        )  # (B, nph, npw, F0p + 1 + 3)

        # === Stage 3: patch GAT over the lattice ===
        if self.use_patch_gat:
            gat_feats = GATNetwork(
                hidden_dim=self.gat_hidden_dim,
                output_dim=self.gat_output_dim,
                num_heads=self.gat_num_heads,
                num_layers=self.gat_num_layers,
                dropout_rate=self.gat_dropout,
                alpha=self.gat_alpha,
                backend="lattice",
                dtype=self.dtype,
                name="patch_gat",
            )(patch_feats.astype(self.dtype), deterministic=deterministic)
        else:
            # Ablated: no message passing — per-patch linear projection keeps
            # the downstream width contract.
            gat_feats = nn.Dense(
                self.gat_output_dim, dtype=self.dtype, name="patch_passthrough_proj"
            )(patch_feats.astype(self.dtype))

        # Adapter for L_feature: pooled decoder features → GAT width (the
        # reference stubs this pair with randn, train_end_to_end.py:338).
        if f_u0_s2d is not None:
            f_u0_patch = s2d_ops.patch_reduce_mean_s2d(f_u0_s2d, self.patch_size)
        else:
            f_u0_patch = patch_reduce_mean(f_u[0], self.patch_size)
        f_unet_patches = nn.Dense(
            self.gat_output_dim, dtype=self.dtype, name="feature_consistency_proj"
        )(f_u0_patch).astype(jnp.float32)

        nph, npw = gat_feats.shape[1], gat_feats.shape[2]
        if self.use_partition:
            # === Stage 4: MinCut partition ===
            l_partition, soft_assign = MinCutRefinement(
                num_segments=self.num_segments,
                sigma_ncut=self.sigma_ncut,
                backend="lattice",
                predictor_hidden=self.gat_output_dim // 2,
                predictor_use_gnn=True,
                predictor_heads=max(1, self.gat_num_heads // 2),
                dropout_rate=self.gat_dropout,
                alpha=self.gat_alpha,
                dtype=self.dtype,
                name="mincut",
            )(gat_feats, deterministic=deterministic)
            hard_labels = jnp.argmax(soft_assign, axis=-1)  # (B, nph, npw)

            # === Stage 5: region pooling + region GAT ===
            flat_feats = gat_feats.reshape(b, nph * npw, -1).astype(jnp.float32)
            flat_labels = hard_labels.reshape(b, nph * npw)
            region_feats, region_counts = segment_mean(flat_feats, flat_labels, self.num_segments)
            if self.num_segments > 1 and self.use_region_gat:
                region_adj = fully_connected_adjacency(self.num_segments)
                region_embeds = GATNetwork(
                    hidden_dim=self.gat_hidden_dim,
                    output_dim=self.gat_output_dim,
                    num_heads=self.gat_num_heads,
                    num_layers=1,
                    dropout_rate=self.gat_dropout,
                    alpha=self.gat_alpha,
                    backend="dense",
                    dtype=self.dtype,
                    name="region_gat",
                )(region_feats.astype(self.dtype), adj=region_adj, deterministic=deterministic)
                region_embeds = region_embeds.astype(jnp.float32)
            else:
                region_embeds = region_feats

            # Broadcast region embeddings → patches → pixels (nearest).
            f_g_patch = gather_rows(region_embeds, flat_labels).reshape(b, nph, npw, -1)
        else:
            # Ablated: no partition → no regions; the patch-level embeddings
            # broadcast to pixels directly ("Graph U-Net Only" semantics).
            l_partition = jnp.zeros((b,), jnp.float32)
            soft_assign = jnp.zeros((b, nph, npw, self.num_segments), jnp.float32)
            soft_assign = soft_assign.at[..., 0].set(1.0)
            hard_labels = jnp.zeros((b, nph, npw), jnp.int32)
            region_embeds = jnp.zeros((b, self.num_segments, gat_feats.shape[-1]), jnp.float32)
            region_counts = jnp.zeros((b, self.num_segments), jnp.float32)
            f_g_patch = gat_feats.astype(jnp.float32)
        f_g_pixel = broadcast_patch_to_pixels(f_g_patch, self.patch_size)  # (B, H, W, Dg)

        # === Stage 7 setup: decide the detection input path first ===
        # Pooled fast path: when the head would pre-pool with a window equal
        # to the patch pitch, pool-then-concat equals concat-then-pool —
        # f_g_pixel is patch-constant, so its pooled form IS f_g_patch, and
        # the pooled f_u[0] is the patch mean (computable straight from the
        # s2d layout). The full-res fused map then has no consumer (unless
        # the dense head needs it), so stage 6 below skips building it
        # entirely — the ~0.5 GB/step broadcast+concat+pool chain never
        # enters the graph, regardless of what the caller does with the
        # output dict. Same parameter tree either way (pre_pool_size is not
        # a parameter), numerics equal up to fp summation order — the
        # pre-pool path is already a documented production divergence from
        # the reference-exact default.
        pooled_fast = (
            self.detection_pre_pool is not None
            and h > self.detection_pre_pool
            and h % self.detection_pre_pool == 0
            and w % self.detection_pre_pool == 0
            and h // self.detection_pre_pool == self.patch_size
            and w // self.detection_pre_pool == self.patch_size
        )

        # === Stage 6: fusion === (kept in the compute dtype: the fused map is
        # the largest activation in the pipeline — f32 here doubles the HBM
        # traffic the detection head reads). Built only when something
        # consumes it (see pooled_fast above).
        fused = None
        if not pooled_fast or self.use_dense_detection:
            if self.use_fusion:
                fused = fuse_features(
                    [f_u[0].astype(self.dtype)],
                    f_g_pixel.astype(self.dtype),
                    target_spatial_size=(h, w),
                )
            else:
                fused = f_u[0].astype(self.dtype)

        if pooled_fast:
            if f_u0_s2d is not None:
                pooled_u = s2d_ops.patch_reduce_mean_s2d(
                    f_u0_s2d.astype(self.dtype), self.patch_size
                )
            else:
                pooled_u = patch_reduce_mean(f_u[0].astype(self.dtype), self.patch_size)
            if self.use_fusion:
                det_in = jnp.concatenate(
                    [pooled_u, f_g_patch.astype(self.dtype)], axis=-1
                )
            else:
                det_in = pooled_u
            det_pre_pool = None
        else:
            det_in = fused.astype(self.dtype)
            det_pre_pool = self.detection_pre_pool
        det = DetectionHead(
            num_classes=self.num_detection_classes,
            fc_hidden_dim=self.fc_hidden_dim,
            pre_pool_size=det_pre_pool,
            dtype=self.dtype,
            name="detection_head",
        )(det_in, train=train)
        if self.num_detection_classes > 1:
            bboxes, confidence, class_scores = det
        else:
            bboxes, confidence = det
            class_scores = None

        out = {
            "logits": logits,
            "f_u": f_u,
            "encoder_skips": skips,
            "patch_feats": patch_feats,
            "gat_feats": gat_feats.astype(jnp.float32),
            "f_unet_patches": f_unet_patches,
            "l_partition": l_partition,
            "soft_assignments": soft_assign,
            "hard_patch_labels": hard_labels,
            "region_embeddings": region_embeds,
            "region_counts": region_counts,
            "f_g_pixel": f_g_pixel,
            "pred_bboxes": bboxes,
            "pred_confidence": confidence,
        }
        if class_scores is not None:
            out["pred_class_scores"] = class_scores
        if fused is not None:
            out["fused"] = fused
        if self.use_dense_detection:
            from mingraph_unet_tpu.models.detection import DenseDetectionHead

            dense = DenseDetectionHead(
                cell_size=self.patch_size, dtype=self.dtype, name="dense_detection_head"
            )(fused, train=train)
            out["dense_objectness_logits"] = dense["objectness_logits"]
            out["dense_boxes"] = dense["boxes"]
        return out
