"""Segmentation test-set evaluation (≡ ``experiments/segmentation_performance.py``).

Evaluates a trained model on the test split (falling back to val when test is
absent, reference lines 40-42), accumulates flat label arrays, computes the
reference-exact metrics (E1), and prints the mango-class (index 1) and macro
rows in Table-1 format (reference lines 153-176). Supports ``model_type`` of
``unet`` and ``mingraph-unet`` (the reference mentions deeplabv3+/yolo but
leaves them unimplemented, lines 60-81 — same here, with a clear error).

Run: ``python -m mingraph_unet_tpu.experiments.segmentation_performance
--config_path CONFIGS --weights_path CKPT [--model_type unet]``.
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict, Optional

import numpy as np

from mingraph_unet_tpu.config import PipelineConfig
from mingraph_unet_tpu.data.dataset import BatchLoader, MangoDataset, device_preprocess_batch
from mingraph_unet_tpu.experiments.metrics import segmentation_metrics

__all__ = ["evaluate_segmentation_model", "print_table1", "region_blend_logits"]


def region_blend_logits(logits, patch_labels, patch: int, num_regions: int,
                        gamma: float = 0.5, purity_tau: Optional[float] = None):
    """Graph-refined segmentation logits: blend each pixel's logits with the
    mean logits of its (trained) MinCut region.

    ``refined = (1-γ)·logits + γ·region_mean[region(pixel)]`` — the
    architecture's refinement mechanism (reference README / demo at
    ``graph_refinement.py:76-111``) applied to segmentation directly at
    eval time. ``logits`` (B, H, W, C) float; ``patch_labels`` (B, nph,
    npw) int region ids; ``patch`` the pixel pitch of one patch.

    ``purity_tau`` (r5 sweep): when set, blending is gated per region on the
    variance of its foreground probability — only regions with
    ``Var[p_fg] < purity_tau`` blend (pure regions, where the region mean is
    evidence rather than class-mixing). Impure regions keep their original
    logits. The r4 study shipped only the untuned (γ=0.5, ungated) point,
    which zeroed mango IoU; this is the mechanism's envelope knob.
    """
    import jax
    import jax.numpy as jnp

    pix_regions = jnp.repeat(
        jnp.repeat(patch_labels, patch, axis=1), patch, axis=2
    )  # (B, H, W)
    onehot = jax.nn.one_hot(pix_regions, num_regions, dtype=jnp.float32)
    sums = jnp.einsum("bhws,bhwc->bsc", onehot, logits)
    counts = onehot.sum(axis=(1, 2))[..., None]  # (B, S, 1)
    region_mean = sums / jnp.maximum(counts, 1.0)
    blended = (1.0 - gamma) * logits + gamma * jnp.einsum(
        "bhws,bsc->bhwc", onehot, region_mean
    )
    if purity_tau is None:
        return blended
    p_fg = jax.nn.softmax(logits, axis=-1)[..., 1]  # (B, H, W)
    mean_p = jnp.einsum("bhws,bhw->bs", onehot, p_fg) / jnp.maximum(
        counts[..., 0], 1.0
    )
    mean_p2 = jnp.einsum("bhws,bhw->bs", onehot, p_fg**2) / jnp.maximum(
        counts[..., 0], 1.0
    )
    var = jnp.maximum(mean_p2 - mean_p**2, 0.0)  # (B, S)
    gate = (var < purity_tau).astype(jnp.float32)  # (B, S)
    gate_pix = jnp.einsum("bhws,bs->bhw", onehot, gate)[..., None]
    return gate_pix * blended + (1.0 - gate_pix) * logits


def _find_split_dir(cfg: PipelineConfig, data_root: str) -> str:
    test_dir = os.path.join(data_root, cfg.dataset.test_dir)
    if os.path.isdir(os.path.join(test_dir, cfg.dataset.image_folder)):
        return test_dir
    val_dir = os.path.join(data_root, cfg.dataset.val_dir)
    if os.path.isdir(os.path.join(val_dir, cfg.dataset.image_folder)):
        print(f"[eval] test split missing; falling back to val ({val_dir})")
        return val_dir
    train_dir = os.path.join(data_root, cfg.dataset.train_dir)
    print(f"[eval] test/val splits missing; falling back to train ({train_dir})")
    return train_dir


def evaluate_segmentation_model(
    config_dir: str,
    weights_path: str,
    model_type: str = "unet",
    batch_size: int = 8,
    data_root_override: Optional[str] = None,
    blend_gamma: float = 0.5,
    blend_purity_tau: Optional[float] = None,
) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.train.infer import load_variables
    from mingraph_unet_tpu.train.segmentation import build_unet
    from mingraph_unet_tpu.train.end_to_end import build_mingraph_unet

    cfg = PipelineConfig.from_config_dir(config_dir)
    model_type = model_type.lower()
    if model_type == "unet":
        model = build_unet(cfg)

        def forward(variables, imgs):
            logits, _, _ = model.apply(variables, imgs, train=False)
            return logits

    elif model_type in ("mingraph-unet", "mingraph_unet"):
        model = build_mingraph_unet(cfg)

        def forward(variables, imgs):
            return model.apply(variables, imgs, train=False)["logits"]

    elif model_type in ("mingraph-unet-refined", "mingraph_unet_refined"):
        # Graph-refined segmentation: the architecture's stated mechanism
        # ("MinCut refines GAT partitions", reference README + the demo at
        # graph_refinement.py:76-111) applied at eval time with the TRAINED
        # partition. Every pixel's logits are blended with the mean logits
        # of its MinCut region: refined = (1-γ)·logits + γ·region_mean.
        # If regions track objects, occlusion-suppressed fruit pixels are
        # pulled up by their region's evidence and isolated clutter false
        # positives are pulled down — the graph touching segmentation
        # DIRECTLY rather than only through shared-encoder gradients.
        model = build_mingraph_unet(cfg)
        patch = cfg.model.graph_construction.patch_size
        num_regions = cfg.dataset.num_semantic_regions

        def forward(variables, imgs):
            out = model.apply(variables, imgs, train=False)
            return region_blend_logits(
                out["logits"].astype(jnp.float32),
                out["hard_patch_labels"],
                patch,
                num_regions,
                gamma=blend_gamma,
                purity_tau=blend_purity_tau,
            )

    else:
        raise NotImplementedError(
            f"model_type {model_type!r} is not implemented "
            "(choices: unet, mingraph-unet, mingraph-unet-refined)"
        )

    variables = load_variables(weights_path)
    pre = cfg.preprocessing

    @jax.jit
    def predict(images_u8):
        imgs, _ = device_preprocess_batch(
            jax.random.key(0), images_u8, jnp.zeros(images_u8.shape[:3], jnp.int32),
            pre.normalization_mean, pre.normalization_std, augment=False,
        )
        return jnp.argmax(forward(variables, imgs), axis=-1)

    data_root = data_root_override or cfg.dataset.data_root
    split_dir = _find_split_dir(cfg, data_root)
    dataset = MangoDataset(
        image_dir=os.path.join(split_dir, cfg.dataset.image_folder),
        mask_dir=os.path.join(split_dir, cfg.dataset.mask_folder),
        image_size=pre.resize_dim,
        num_classes=cfg.model.unet.out_channels,
    )
    loader = BatchLoader(dataset, batch_size, shuffle=False, drop_last=False)
    trues, preds = [], []
    for imgs_np, masks_np in loader.epoch(0):
        preds.append(np.asarray(predict(jnp.asarray(imgs_np))).reshape(-1))
        trues.append(masks_np.reshape(-1))
    results = segmentation_metrics(
        np.concatenate(trues), np.concatenate(preds), cfg.model.unet.out_channels
    )
    print_table1(results, model_type)
    return results


def print_table1(results: Dict[str, Any], model_name: str, mango_class: int = 1) -> None:
    """Table-1-format printout (reference lines 153-171)."""
    print(f"\n--- Segmentation Performance ({model_name}) ---")
    print(f"{'Metric':<12} {'Mango (cls 1)':>14} {'Macro avg':>12}")
    rows = [
        ("IoU", "iou_per_class", "mean_iou"),
        ("Precision", "precision_per_class", "mean_precision"),
        ("Recall", "recall_per_class", "mean_recall"),
        ("F1", "f1_per_class", "mean_f1"),
    ]
    for name, per_class_key, mean_key in rows:
        per_class = results[per_class_key]
        mango = per_class[mango_class] if len(per_class) > mango_class else float("nan")
        print(f"{name:<12} {mango:>14.4f} {results[mean_key]:>12.4f}")


def main():
    parser = argparse.ArgumentParser(description="Evaluate segmentation performance")
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--weights_path", required=True)
    parser.add_argument("--model_type", default="unet")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=args.cpu)
    evaluate_segmentation_model(
        args.config_path, args.weights_path, args.model_type, args.batch_size
    )


if __name__ == "__main__":
    main()
