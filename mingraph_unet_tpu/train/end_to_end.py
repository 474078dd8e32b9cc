"""End-to-end MinGraph-UNet trainer (≡ ``scripts/train_end_to_end.py``).

One jitted, fully-batched train step computes

``L_total = L_CE + λ1·L_shape + λ2·L_feature + λ3·L_partition + λ4·L_smooth``

(reference lines 472-476) over the :class:`MinGraphUNet` pipeline, with the
reference's stubbed seams implemented for real:

- **L_feature** gets real inputs: the pipeline's pooled-decoder projection vs
  GAT patch features, with patch labels ``y_p`` pooled from the *ground-truth*
  mask (fraction of foreground pixels > 0.5) — the reference uses
  ``torch.randn`` features and random labels (lines 338-345).
- **L_shape** actually trains: with COCO instance annotations it runs the
  intended per-instance path (``shape_loss.py:150-180``); otherwise it uses
  probability-weighted (soft-mask) moments so ∂L/∂probs exists — the
  reference hard-codes its λ1 term to 0 (line 287), and a hard-argmax
  evaluation (round 1 here) carries no gradient.
- **L_smooth** is TV on the foreground softmax probability of the initial
  segmentation — the reference's stated intent (comment at line 459) instead
  of its dummy constant-map application (line 462, which is identically 0).
- **Detection** (optional, ``train_detection=True``): the head is trained
  against a ground-truth union box + objectness derived from the mask — the
  reference leaves detection untrained ("Detection losses would be calculated
  here", line 456).

Composite checkpointing covers every module's params + batch stats + opt
state in one pytree, with resume (reference's save is a print stub,
lines 500-504).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mingraph_unet_tpu.config import PipelineConfig
from mingraph_unet_tpu.data.dataset import BatchLoader, MangoDataset, device_preprocess_batch
from mingraph_unet_tpu.models import losses
from mingraph_unet_tpu.models.pipeline import MinGraphUNet
from mingraph_unet_tpu.ops.patches import patch_reduce_mean
from mingraph_unet_tpu.parallel.mesh import make_mesh, shard_batch
from mingraph_unet_tpu.train.checkpoint import CheckpointManager
from mingraph_unet_tpu.train.common import TrainState, make_multistep, make_optimizer
from mingraph_unet_tpu.utils.logging import MetricsLogger

__all__ = ["build_mingraph_unet", "gt_union_box", "make_e2e_train_step", "train_end_to_end"]


def build_mingraph_unet(cfg: PipelineConfig, dtype=None) -> MinGraphUNet:
    m = cfg.model
    return MinGraphUNet(
        num_classes=m.unet.out_channels,
        init_features=m.unet.init_features,
        depth=m.unet.depth,
        use_batchnorm=m.unet.use_batchnorm,
        remat=m.unet.remat,
        unet_s2d_level0=m.unet.s2d_level0,
        unet_s2d_level1=m.unet.s2d_level1,
        patch_size=m.graph_construction.patch_size,
        unet_patch_feature_dim=m.graph_construction.unet_patch_feature_dim,
        sobel_kernel_size=cfg.preprocessing.sobel_kernel_size,
        normalization_mean=cfg.preprocessing.normalization_mean,
        normalization_std=cfg.preprocessing.normalization_std,
        gat_hidden_dim=m.gat.hidden_dim,
        gat_output_dim=m.gat.output_dim,
        gat_num_heads=m.gat.num_heads,
        gat_num_layers=m.gat.num_layers,
        gat_dropout=m.gat.dropout,
        gat_alpha=m.gat.alpha,
        num_segments=cfg.dataset.num_semantic_regions,
        sigma_ncut=m.mincut.sigma_ncut,
        num_detection_classes=cfg.dataset.num_detection_classes,
        fc_hidden_dim=m.fusion_detection.fc_hidden_dim,
        use_dense_detection=m.fusion_detection.use_dense_detection,
        detection_pre_pool=m.fusion_detection.detection_pre_pool,
        use_patch_gat=m.ablation.use_patch_gat,
        use_partition=m.ablation.use_partition,
        use_region_gat=m.ablation.use_region_gat,
        use_fusion=m.ablation.use_fusion,
        dtype=dtype if dtype is not None else (jnp.bfloat16 if cfg.training.bf16 else jnp.float32),
    )


def gt_union_box(masks: jnp.ndarray, foreground_class: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image normalized union bbox (cx, cy, w, h) of foreground pixels +
    has-object flag. Supervision for the single-box detection head."""
    b, h, w = masks.shape
    fg = (masks == foreground_class)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    big = jnp.float32(1e9)
    y_min = jnp.min(jnp.where(fg, ys, big), axis=(1, 2))
    x_min = jnp.min(jnp.where(fg, xs, big), axis=(1, 2))
    y_max = jnp.max(jnp.where(fg, ys, -1.0), axis=(1, 2))
    x_max = jnp.max(jnp.where(fg, xs, -1.0), axis=(1, 2))
    has = fg.any(axis=(1, 2))
    cx = (x_min + x_max + 1.0) / 2.0 / w
    cy = (y_min + y_max + 1.0) / 2.0 / h
    bw = (x_max - x_min + 1.0) / w
    bh = (y_max - y_min + 1.0) / h
    box = jnp.stack([cx, cy, bw, bh], axis=-1)
    return jnp.where(has[:, None], box, 0.0), has


# Fixed slot order for the uncertainty balancer's log-variance vector
# (params["loss_balance"]["log_vars"], shape (len(BALANCED_LOSSES),)).
BALANCED_LOSSES = ("l_shape", "l_feature", "l_partition", "l_smooth",
                   "l_partition_sup")


def _augment_variables(variables: Dict[str, Any], train_cfg) -> Dict[str, Any]:
    """Append the uncertainty balancer's learnable log-variances to the
    param tree (trained by the same optimizer, checkpointed with the rest).
    The model never sees this subtree — the train step strips it."""
    if train_cfg.loss_balance == "uncertainty":
        params = dict(variables["params"])
        params["loss_balance"] = {
            "log_vars": jnp.zeros((len(BALANCED_LOSSES),), jnp.float32)
        }
        variables = {**variables, "params": params}
    return variables


def make_e2e_train_step(model: MinGraphUNet, tx, cfg: PipelineConfig, augment: bool = True,
                        train_detection: bool = True):
    pre = cfg.preprocessing
    lw = cfg.model.losses
    patch = cfg.model.graph_construction.patch_size
    max_instances = cfg.model.fusion_detection.max_instances
    exact_instancing = cfg.training.instancing == "exact"
    balance = cfg.training.loss_balance == "uncertainty"

    def train_step(state: TrainState, images_u8, masks, key):
        # ``masks`` is either the semantic mask batch or a (masks, instances)
        # tuple when the dataset carries COCO instance annotations — the
        # instance path supplies real GT for the dense detection head and
        # the shape loss (the reference's intended-but-sourceless path,
        # shape_loss.py:150-180). Masks travel host→device as uint8 (4× less
        # relay traffic than int32); all downstream math wants int32.
        gt_instances = None
        if isinstance(masks, (tuple, list)):
            masks, gt_instances = masks
        masks = masks.astype(jnp.int32)
        aug_key, drop_key = jax.random.split(jax.random.fold_in(key, state.step))

        def loss_fn(params):
            bal = params.get("loss_balance") if balance else None
            if balance:
                params = {k: v for k, v in params.items() if k != "loss_balance"}
            pre_out = device_preprocess_batch(
                aug_key, images_u8, masks,
                pre.normalization_mean, pre.normalization_std,
                augment=augment, flip_prob=pre.horizontal_flip_prob,
                rotation_degrees=pre.rotation_degrees,
                crop_prob=pre.random_crop_prob,
                instances=gt_instances,
                num_classes=cfg.dataset.num_classes,
            )
            if gt_instances is not None:
                imgs, aug_masks, aug_inst = pre_out
            else:
                imgs, aug_masks = pre_out
                aug_inst = None
            out, new_model_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_key},
            )
            b = imgs.shape[0]
            logits = out["logits"]

            l_seg = losses.cross_entropy_loss(logits, aug_masks)

            # y_p from ground truth: foreground fraction per patch > 0.5.
            fg_frac = patch_reduce_mean(
                (aug_masks == 1).astype(jnp.float32)[..., None], patch
            )[..., 0]
            y_p = (fg_frac > 0.5).astype(jnp.float32)
            n_patches = y_p.shape[1] * y_p.shape[2]
            l_feature = losses.feature_consistency_loss(
                out["f_unet_patches"].reshape(b, n_patches, -1),
                out["gat_feats"].reshape(b, n_patches, -1),
                y_p.reshape(b, n_patches),
                margin=lw.feature_loss_margin,
            )

            l_partition = out["l_partition"].mean()

            probs = jax.nn.softmax(logits, axis=-1)
            if aug_inst is not None:
                # Intended instance path: per-object Mahalanobis ellipse
                # prior on real GT instance masks (shape_loss.py:150-180).
                l_shape = losses.elliptical_shape_loss(aug_inst.astype(jnp.float32))
            else:
                # Soft-mask moments with a stop-gradient CC instance
                # decomposition (r4): the ellipse prior applies per
                # predicted blob instead of to the union of all fruit,
                # while ∂L_shape/∂probs still exists.
                l_shape = losses.elliptical_shape_loss_soft_instances(
                    probs, max_instances=max_instances, exact=exact_instancing
                )
            l_smooth = losses.total_variation_loss(probs[..., 1:2])

            aux = {
                "l_unet_seg": l_seg,
                "l_shape": l_shape,
                "l_feature": l_feature,
                "l_partition": l_partition,
                "l_smooth": l_smooth,
            }
            graph_terms = [
                ("l_shape", l_shape, lw.l_shape_weight),
                ("l_feature", l_feature, lw.l_feature_weight),
                ("l_partition", l_partition, lw.l_partition_weight),
                ("l_smooth", l_smooth, lw.l_smooth_weight),
            ]
            if lw.l_partition_sup_weight > 0.0:
                # Supervised partition: patch-CE against the y_p labels
                # already derived for L_feature (framework addition; the
                # reference's unsupervised Ncut was measured not to align
                # with fruit — VALUE_STUDY.md).
                l_psup = losses.partition_supervision_loss(
                    out["soft_assignments"].astype(jnp.float32), y_p
                )
                aux["l_partition_sup"] = l_psup
                graph_terms.append(
                    ("l_partition_sup", l_psup, lw.l_partition_sup_weight)
                )

            total = l_seg
            for name, val, wt in graph_terms:
                if wt == 0.0:  # static: compiled out entirely
                    continue
                if bal is not None:
                    # Kendall-style homoscedastic-uncertainty weighting:
                    # exp(-s)·λ·L + s/2 with learnable s per active term.
                    s = bal["log_vars"][BALANCED_LOSSES.index(name)]
                    total = total + jnp.exp(-s) * wt * val + 0.5 * s
                    aux[f"bal_s_{name}"] = s
                else:
                    total = total + wt * val
            if train_detection:
                gt_box, has_obj = gt_union_box(aug_masks)
                l_bbox, l_conf = losses.detection_losses(
                    out["pred_bboxes"], out["pred_confidence"], gt_box, has_obj
                )
                total = total + l_bbox + l_conf
                aux["l_bbox"] = l_bbox
                aux["l_conf"] = l_conf
            if "dense_objectness_logits" in out:
                from mingraph_unet_tpu.models.detection import dense_detection_loss

                if aug_inst is not None:
                    # Real annotated GT instances.
                    inst = aug_inst
                else:
                    # Fallback: GT instances from connected components of the
                    # semantic mask; static max_instances slots.
                    from mingraph_unet_tpu.ops import cc

                    def gt_instances_cc(m):
                        # instancing="fast" (default): scatter-free stencil
                        # CC + dense top-K — the exact forms cost 188 ms at
                        # 16×128² in-step (r4 probe, ops/cc.py docstrings).
                        # Noisy-label regimes (e.g. the value study) set
                        # instancing="exact": speckle components crowd out
                        # the fast form's raster-first candidate window.
                        if exact_instancing:
                            labels = cc.label_components((m == 1).astype(jnp.int32))
                            masks_i, _ = cc.top_instances(labels, max_instances, min_area=10)
                        else:
                            labels = cc.label_components_stencil((m == 1).astype(jnp.int32))
                            masks_i, _ = cc.top_instances_dense(labels, max_instances, min_area=10)
                        return masks_i

                    inst = jax.vmap(gt_instances_cc)(aug_masks)  # (B, O, H, W)
                l_dense_obj, l_dense_box = dense_detection_loss(
                    {"objectness_logits": out["dense_objectness_logits"],
                     "boxes": out["dense_boxes"]},
                    inst,
                    patch,
                )
                total = total + l_dense_obj + l_dense_box
                aux["l_dense_obj"] = l_dense_obj
                aux["l_dense_box"] = l_dense_box
            aux["total"] = total
            return total, (new_model_state["batch_stats"], aux)

        (loss, (new_bs, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_updates(tx, grads, new_bs)
        return new_state, aux

    return train_step


def train_end_to_end(
    config_dir: str,
    max_epochs: Optional[int] = None,
    max_steps_per_epoch: Optional[int] = None,
    data_root_override: Optional[str] = None,
    train_detection: bool = True,
) -> Tuple[TrainState, Dict[str, Any]]:
    cfg = PipelineConfig.from_config_dir(config_dir)
    train_cfg = cfg.training
    if train_cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    ds_cfg = cfg.dataset
    data_root = data_root_override or ds_cfg.data_root

    ann_file = ds_cfg.annotations_file
    if ann_file and not os.path.isabs(ann_file) and not os.path.exists(ann_file):
        ann_file = os.path.join(data_root, ds_cfg.train_dir, ann_file)
    dataset = MangoDataset(
        image_dir=os.path.join(data_root, ds_cfg.train_dir, ds_cfg.image_folder),
        mask_dir=os.path.join(data_root, ds_cfg.train_dir, ds_cfg.mask_folder),
        image_size=cfg.preprocessing.resize_dim,
        num_classes=cfg.model.unet.out_channels,
        annotations_file=ann_file,
        max_instances=cfg.model.fusion_detection.max_instances,
    )
    loader = BatchLoader(dataset, train_cfg.batch_size, shuffle=True, drop_last=True, seed=train_cfg.seed)
    steps_per_epoch = max(1, len(loader))
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    model = build_mingraph_unet(cfg)
    tx, schedule = make_optimizer(train_cfg, steps_per_epoch)
    mesh = make_mesh(train_cfg.data_parallel, train_cfg.spatial_parallel)

    key = jax.random.key(train_cfg.seed)
    init_key, loop_key = jax.random.split(key)
    sample = jnp.zeros((train_cfg.batch_size, *cfg.preprocessing.resize_dim, 3), jnp.float32)

    ckpt = CheckpointManager(
        train_cfg.checkpoint_dir, max_to_keep=3,
        best_metric=train_cfg.checkpoint_best_metric,
        best_mode=train_cfg.checkpoint_best_mode,
    )
    state = None
    start_epoch = 0
    if train_cfg.resume and ckpt.latest_step is not None:
        abstract = jax.eval_shape(
            lambda: TrainState.create(
                _augment_variables(model.init(init_key, sample), train_cfg), tx
            )
        )
        restored = ckpt.restore_latest({"state": abstract, "epoch": 0})
        if restored is not None:
            state = restored["state"]
            start_epoch = int(restored["epoch"]) + 1
            print(f"[e2e] resumed from step {int(state.step)} (epoch {start_epoch})")
    if state is None:
        variables = _augment_variables(jax.jit(model.init)(init_key, sample), train_cfg)
        state = TrainState.create(variables, tx)

    donate = (0,) if train_cfg.donate_buffers else ()
    window = max(1, train_cfg.scan_window)

    def build_steps(phase_cfg):
        ts = make_e2e_train_step(
            model, tx, phase_cfg, augment=True, train_detection=train_detection
        )
        jw = (
            jax.jit(make_multistep(ts, window), donate_argnums=donate)
            if window > 1
            else None
        )
        return jax.jit(ts, donate_argnums=donate), jw

    # Two-phase schedule (graph_warmup_epochs > 0): warmup epochs run a step
    # compiled with the four graph-loss λs zeroed — the value study's
    # measured rescue for multi-loss cold-start collapse (joint-from-cold
    # reaches mango IoU 0.0000 where two-phase reaches 0.75-0.79,
    # outputs/VALUE_STUDY.md). One extra compile at the phase boundary;
    # param tree and optimizer state are identical across phases.
    _steps_cache: Dict[str, Any] = {}

    def steps_for_epoch(epoch):
        phase = "warmup" if epoch < train_cfg.graph_warmup_epochs else "joint"
        if phase not in _steps_cache:
            if phase == "warmup":
                import dataclasses

                phase_cfg = dataclasses.replace(
                    cfg,
                    model=dataclasses.replace(
                        cfg.model,
                        losses=dataclasses.replace(
                            cfg.model.losses,
                            l_shape_weight=0.0, l_feature_weight=0.0,
                            l_partition_weight=0.0, l_smooth_weight=0.0,
                            l_partition_sup_weight=0.0,
                        ),
                    ),
                )
            else:
                phase_cfg = cfg
            _steps_cache[phase] = build_steps(phase_cfg)
        return _steps_cache[phase]

    jit_step, jit_window = steps_for_epoch(start_epoch)

    num_epochs = max_epochs if max_epochs is not None else train_cfg.num_epochs
    logger = MetricsLogger(train_cfg.log_dir, "train_end_to_end", train_cfg.log_interval)
    history = {"epoch_loss": []}
    global_step = start_epoch * steps_per_epoch

    with mesh:
        for epoch in range(start_epoch, num_epochs):
            jit_step, jit_window = steps_for_epoch(epoch)
            # StepLR only changes at epoch granularity; evaluating the
            # optax schedule is an eager device round trip, so cache it.
            epoch_lr = float(schedule(epoch * steps_per_epoch))
            running: Dict[str, float] = {}
            n_steps = 0
            # num_workers > 0 enables background-thread prefetch (the
            # reference's DataLoader-workers role).
            epoch_iter = (
                loader.prefetch_epoch(epoch, prefetch=train_cfg.num_workers)
                if train_cfg.num_workers > 0
                else loader.epoch(epoch)
            )
            pending: list = []  # (aux device tree, steps it covers)

            def drain_pending(keep: int = 0):
                """Fetch queued metrics (one device→host transfer per entry;
                per-scalar float() costs a relay round trip each), leaving
                the newest ``keep`` entries in flight."""
                while len(pending) > keep:
                    aux, done, gstep = pending.pop(0)
                    aux_np = jax.device_get(aux)
                    for k, v in aux_np.items():
                        running[k] = running.get(k, 0.0) + float(v) * done
                    logger.log(
                        gstep,
                        {**{k: float(v) for k, v in aux_np.items()},
                         "lr": epoch_lr, "epoch": epoch},
                    )

            def run_batches(batches):
                """Consume buffered host batches: full windows through the
                scanned multi-step (ONE dispatch + ONE deferred metrics fetch
                per window — the host round trip costs ~0.3 s over the
                relay), remainder singly. Metrics fetch lags one dispatch so
                the next window's host→device transfer overlaps compute."""
                nonlocal state, n_steps, global_step, loop_key
                i = 0
                while i < len(batches):
                    loop_key, step_key = jax.random.split(loop_key)
                    if jit_window is not None and len(batches) - i >= window:
                        chunk = batches[i : i + window]
                        imgs = shard_batch(
                            jnp.asarray(np.stack([b[0] for b in chunk])), mesh, leading=1
                        )
                        masks = shard_batch(
                            jnp.asarray(
                                np.stack([b[1] for b in chunk]).astype(np.uint8)
                            ),
                            mesh,
                            leading=1,
                        )
                        if len(chunk[0]) == 3:  # instance-annotated batches
                            inst = shard_batch(
                                jnp.asarray(np.stack([b[2] for b in chunk])),
                                mesh,
                                leading=1,
                            )
                            masks = (masks, inst)
                        state, aux = jit_window(state, imgs, masks, step_key)
                        done = window
                    else:
                        item = batches[i]
                        imgs = shard_batch(jnp.asarray(item[0]), mesh)
                        masks = shard_batch(jnp.asarray(item[1].astype(np.uint8)), mesh)
                        if len(item) == 3:
                            masks = (masks, shard_batch(jnp.asarray(item[2]), mesh))
                        state, aux = jit_step(state, imgs, masks, step_key)
                        done = 1
                    i += done
                    n_steps += done
                    global_step += done
                    pending.append((aux, done, global_step))
                    drain_pending(keep=1)  # fetch all but the in-flight one

            buf: list = []
            for batch in epoch_iter:  # (imgs, masks[, instances])
                if n_steps + len(buf) >= steps_per_epoch:
                    break
                buf.append(batch)
                if len(buf) == window:
                    run_batches(buf)
                    buf = []
            if buf:
                run_batches(buf)
                buf = []
            drain_pending()
            epoch_loss = running.get("total", 0.0) / max(1, n_steps)
            history["epoch_loss"].append(epoch_loss)
            avg = {k: v / max(1, n_steps) for k, v in running.items()}
            print(
                f"[e2e] epoch {epoch + 1}/{num_epochs} "
                + " ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items()))
            )
            if (epoch + 1) % train_cfg.save_epoch_interval == 0 or epoch == num_epochs - 1:
                ckpt.save(int(state.step), {"state": jax.device_get(state), "epoch": epoch},
                          metrics={"loss": float(epoch_loss)})
    ckpt.wait()
    logger.close()
    return state, history
