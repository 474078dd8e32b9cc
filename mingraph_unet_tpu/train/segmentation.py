"""U-Net-only segmentation trainer (≡ ``scripts/train_segmentation.py``).

One jitted train step fuses on-device preprocessing (synced augmentation +
normalization), the U-Net forward, CE + soft-Dice loss
(``train_segmentation.py:127-131``), and the optimizer update. Data
parallelism is expressed through ``jax.sharding``: batches are placed with a
``NamedSharding`` over the mesh's ``data`` axis and XLA inserts the gradient
all-reduce (no hand-written collectives).

TPU-native additions over the reference: bf16 compute policy, buffer
donation, step-indexed Orbax checkpointing with resume (the reference always
restarts at epoch 0), structured JSONL metrics, optional NaN debugging.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mingraph_unet_tpu.config import PipelineConfig
from mingraph_unet_tpu.data.dataset import BatchLoader, MangoDataset, device_preprocess_batch
from mingraph_unet_tpu.experiments.metrics import segmentation_metrics
from mingraph_unet_tpu.models import losses
from mingraph_unet_tpu.models.unet import UNet
from mingraph_unet_tpu.parallel.mesh import make_mesh, shard_batch
from mingraph_unet_tpu.train.checkpoint import CheckpointManager
from mingraph_unet_tpu.train.common import TrainState, make_multistep, make_optimizer
from mingraph_unet_tpu.utils.logging import MetricsLogger

__all__ = ["build_unet", "make_train_step", "train_unet_segmentation", "evaluate_unet"]


def build_unet(cfg: PipelineConfig, dtype=None) -> UNet:
    u = cfg.model.unet
    return UNet(
        in_channels=u.in_channels,
        num_classes=u.out_channels,
        init_features=u.init_features,
        depth=u.depth,
        use_batchnorm=u.use_batchnorm,
        remat=u.remat,
        s2d_level0=u.s2d_level0,
        dtype=dtype if dtype is not None else (jnp.bfloat16 if cfg.training.bf16 else jnp.float32),
    )


def make_train_step(model: UNet, tx, cfg: PipelineConfig, augment: bool = True):
    pre = cfg.preprocessing
    dice_w = cfg.model.losses.dice_weight

    def train_step(state: TrainState, images_u8, masks, key):
        # Masks travel host→device as uint8 (4× less relay traffic).
        masks = masks.astype(jnp.int32)

        def loss_fn(params):
            imgs, aug_masks = device_preprocess_batch(
                key,
                images_u8,
                masks,
                pre.normalization_mean,
                pre.normalization_std,
                augment=augment,
                flip_prob=pre.horizontal_flip_prob,
                rotation_degrees=pre.rotation_degrees,
                crop_prob=pre.random_crop_prob,
                num_classes=cfg.dataset.num_classes,
            )
            (logits, _, _), new_model_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs,
                train=True,
                mutable=["batch_stats"],
            )
            ce = losses.cross_entropy_loss(logits, aug_masks)
            dice = losses.dice_loss(logits, aug_masks)
            loss = ce + dice_w * dice
            return loss, (new_model_state["batch_stats"], ce, dice)

        (loss, (new_bs, ce, dice)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_updates(tx, grads, new_bs)
        metrics = {"loss": loss, "ce": ce, "dice": dice}
        return new_state, metrics

    return train_step


def _abstract_state(model, tx, sample_images, sample_masks, key):
    def init_fn():
        variables = model.init(key, jnp.zeros_like(sample_images, jnp.float32))
        return TrainState.create(variables, tx)

    return jax.eval_shape(init_fn)


def train_unet_segmentation(
    config_dir: str,
    max_epochs: Optional[int] = None,
    max_steps_per_epoch: Optional[int] = None,
    data_root_override: Optional[str] = None,
) -> Tuple[TrainState, Dict[str, Any]]:
    """Full training entry point (config dir → trained state + history)."""
    cfg = PipelineConfig.from_config_dir(config_dir)
    train_cfg = cfg.training
    if train_cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    ds_cfg = cfg.dataset
    data_root = data_root_override or ds_cfg.data_root

    dataset = MangoDataset(
        image_dir=os.path.join(data_root, ds_cfg.train_dir, ds_cfg.image_folder),
        mask_dir=os.path.join(data_root, ds_cfg.train_dir, ds_cfg.mask_folder),
        image_size=cfg.preprocessing.resize_dim,
        num_classes=cfg.model.unet.out_channels,
    )
    loader = BatchLoader(dataset, train_cfg.batch_size, shuffle=True, drop_last=True, seed=train_cfg.seed)
    steps_per_epoch = max(1, len(loader))
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    model = build_unet(cfg)
    tx, schedule = make_optimizer(train_cfg, steps_per_epoch)
    mesh = make_mesh(train_cfg.data_parallel, train_cfg.spatial_parallel)

    key = jax.random.key(train_cfg.seed)
    init_key, loop_key = jax.random.split(key)

    sample_imgs = jnp.zeros((train_cfg.batch_size, *cfg.preprocessing.resize_dim, 3), jnp.uint8)

    ckpt = CheckpointManager(
        train_cfg.checkpoint_dir, max_to_keep=3,
        best_metric=train_cfg.checkpoint_best_metric,
        best_mode=train_cfg.checkpoint_best_mode,
    )
    start_epoch = 0
    state = None
    if train_cfg.resume and ckpt.latest_step is not None:
        abstract = _abstract_state(model, tx, sample_imgs, None, init_key)
        restored = ckpt.restore_latest({"state": abstract, "epoch": 0})
        if restored is not None:
            state = restored["state"]
            start_epoch = int(restored["epoch"]) + 1
            print(f"[train] resumed from step {int(state.step)} (epoch {start_epoch})")
    if state is None:
        variables = jax.jit(model.init, static_argnames=())(
            init_key, jnp.zeros_like(sample_imgs, jnp.float32)
        )
        state = TrainState.create(variables, tx)

    train_step = make_train_step(model, tx, cfg, augment=True)
    donate = (0,) if train_cfg.donate_buffers else ()
    jit_step = jax.jit(train_step, donate_argnums=donate)
    window = max(1, train_cfg.scan_window)
    jit_window = (
        jax.jit(make_multistep(train_step, window), donate_argnums=donate)
        if window > 1
        else None
    )

    num_epochs = max_epochs if max_epochs is not None else train_cfg.num_epochs
    logger = MetricsLogger(train_cfg.log_dir, "train_segmentation", train_cfg.log_interval)
    history = {"epoch_loss": []}
    global_step = start_epoch * steps_per_epoch

    with mesh:
        for epoch in range(start_epoch, num_epochs):
            # StepLR only changes at epoch granularity; evaluating the
            # optax schedule is an eager device round trip, so cache it.
            epoch_lr = float(schedule(epoch * steps_per_epoch))
            running = {"loss": 0.0, "ce": 0.0, "dice": 0.0}
            n_steps = 0
            # num_workers > 0 enables background-thread prefetch (the
            # reference's DataLoader-workers role).
            epoch_iter = (
                loader.prefetch_epoch(epoch, prefetch=train_cfg.num_workers)
                if train_cfg.num_workers > 0
                else loader.epoch(epoch)
            )
            pending = []  # (metrics device tree, steps covered, global_step)

            def drain_pending(keep: int = 0):
                """Fetch queued metrics (one device→host transfer per entry),
                leaving the newest ``keep`` entries in flight so the next
                window's host→device transfer overlaps compute."""
                while len(pending) > keep:
                    metrics, done, gstep = pending.pop(0)
                    metrics_np = jax.device_get(metrics)
                    for k in running:
                        running[k] += float(metrics_np[k]) * done
                    logger.log(gstep, {**{k: float(v) for k, v in metrics_np.items()},
                                       "lr": epoch_lr,
                                       "epoch": epoch})

            def run_batches(batches):
                """Full windows through the scanned multi-step (one dispatch
                + one deferred metrics fetch per window), remainder singly."""
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
                            jnp.asarray(np.stack([b[1] for b in chunk]).astype(np.uint8)),
                            mesh,
                            leading=1,
                        )
                        state, metrics = jit_window(state, imgs, masks, step_key)
                        done = window
                    else:
                        imgs = shard_batch(jnp.asarray(batches[i][0]), mesh)
                        masks = shard_batch(
                            jnp.asarray(batches[i][1].astype(np.uint8)), mesh
                        )
                        state, metrics = jit_step(state, imgs, masks, step_key)
                        done = 1
                    i += done
                    n_steps += done
                    global_step += done
                    pending.append((metrics, done, global_step))
                    drain_pending(keep=1)

            buf = []
            for imgs_np, masks_np in epoch_iter:
                if n_steps + len(buf) >= steps_per_epoch:
                    break
                buf.append((imgs_np, masks_np))
                if len(buf) == window:
                    run_batches(buf)
                    buf = []
            if buf:
                run_batches(buf)
                buf = []
            drain_pending()
            epoch_loss = running["loss"] / max(1, n_steps)
            history["epoch_loss"].append(epoch_loss)
            print(f"[train] epoch {epoch + 1}/{num_epochs} avg_loss={epoch_loss:.4f}")
            if (epoch + 1) % train_cfg.save_epoch_interval == 0 or epoch == num_epochs - 1:
                ckpt.save(int(state.step), {"state": jax.device_get(state), "epoch": epoch},
                          metrics={"loss": float(epoch_loss)})
    ckpt.wait()
    logger.close()
    return state, history


def evaluate_unet(
    model: UNet,
    state: TrainState,
    dataset: MangoDataset,
    cfg: PipelineConfig,
    batch_size: int = 8,
) -> Dict[str, Any]:
    """Accumulate predictions over a dataset and compute reference-exact
    segmentation metrics (E1 semantics)."""
    pre = cfg.preprocessing

    @jax.jit
    def predict(images_u8):
        imgs = device_preprocess_batch(
            jax.random.key(0), images_u8, jnp.zeros(images_u8.shape[:3], jnp.int32),
            pre.normalization_mean, pre.normalization_std, augment=False,
        )[0]
        logits, _, _ = model.apply(state.variables(), imgs, train=False)
        return jnp.argmax(logits, axis=-1)

    loader = BatchLoader(dataset, batch_size, shuffle=False, drop_last=False)
    trues, preds = [], []
    for imgs_np, masks_np in loader.epoch(0):
        pred = np.asarray(predict(jnp.asarray(imgs_np)))
        preds.append(pred.reshape(-1))
        trues.append(masks_np.reshape(-1))
    return segmentation_metrics(
        np.concatenate(trues), np.concatenate(preds), cfg.model.unet.out_channels
    )
