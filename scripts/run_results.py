#!/usr/bin/env python
"""Produce the accuracy deliverable: train to convergence and record real
Tables 1/2/3 (the reference's raison d'être — Table 1 printed at
``experiments/segmentation_performance.py:153-176``, Table-2 targets quoted
at ``experiments/metrics.py:188-192``, Table 3 named at
``experiments/ablation_study.py:78-85``).

Pipeline (all stages resumable — each training has its own checkpoint dir):

1. Generate a synthetic annotated orchard dataset
   (``mingraph_unet_tpu/data/synthetic.py``) with train/val/test splits,
   instance polygons and occlusion flags.
2. Train the U-Net baseline (``train_unet_segmentation``) and the full
   MinGraph-UNet (``train_end_to_end``, dense detection head on) to
   convergence.
3. Train the four non-full Table-3 ablation variants (the full method
   reuses step 2's weights).
4. Evaluate: Table 1 (segmentation metrics, both models, test split),
   Table 2 (yield metrics: CC-instancing counter on both models + the
   dense-head detector), Table 3 (yield metrics per trained variant).
5. Write ``outputs/RESULTS.md`` + ``outputs/results.json`` + loss curves.

Run:  python scripts/run_results.py --out runs/results  [--quick]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mingraph_unet_tpu.experiments.ablation_study import ABLATION_VARIANTS, VARIANT_TOGGLES


def write_config_dir(cfg_dir, data_root, image_size, *, epochs, batch_size,
                     ckpt_dir, log_dir, use_dense=False, ablation=None,
                     losses=None, patch_size=None, lr=1e-3, lr_step,
                     lr_gamma=0.3, scan_window=8, annotations=True, seed=0,
                     instancing="fast", graph_warmup_epochs=0,
                     loss_balance="none"):
    """Write a 4-file config dir for one training run. ``losses`` overrides
    L_total weight fields (λ sweeps, seg-only warmup phases — VERDICT r3 #2);
    ``patch_size`` overrides the graph node granularity (at 64² the default
    16-px patches leave a 4×4 grid whose GT patch labels y_p=(fg frac>0.5)
    are all-zero for fruit-sized objects — the graph losses degenerate)."""
    import yaml

    from mingraph_unet_tpu.config import PipelineConfig, _tuples_to_lists

    h, w = image_size
    cfg = PipelineConfig()
    cfg.dataset = dataclasses.replace(
        cfg.dataset, data_root=data_root, image_height=h, image_width=w,
        annotations_file="annotations.json" if annotations else None,
    )
    cfg.preprocessing = dataclasses.replace(cfg.preprocessing, resize_dim=(h, w))
    if patch_size is not None:
        cfg.model.graph_construction = dataclasses.replace(
            cfg.model.graph_construction, patch_size=patch_size
        )
    if use_dense:
        cfg.model.fusion_detection = dataclasses.replace(
            cfg.model.fusion_detection, use_dense_detection=True
        )
    if ablation:
        cfg.model = dataclasses.replace(
            cfg.model, ablation=dataclasses.replace(cfg.model.ablation, **ablation)
        )
    if losses:
        cfg.model = dataclasses.replace(
            cfg.model, losses=dataclasses.replace(cfg.model.losses, **losses)
        )
    cfg.training = dataclasses.replace(
        cfg.training,
        batch_size=batch_size, num_epochs=epochs, learning_rate=lr,
        lr_step_size=lr_step, lr_gamma=lr_gamma, bf16=True,
        scan_window=scan_window, checkpoint_dir=ckpt_dir, log_dir=log_dir,
        save_epoch_interval=5, num_workers=4, seed=seed,
        instancing=instancing, graph_warmup_epochs=graph_warmup_epochs,
        loss_balance=loss_balance,
    )
    os.makedirs(cfg_dir, exist_ok=True)
    for name, section in (
        ("dataset.yaml", cfg.dataset),
        ("model.yaml", cfg.model),
        ("preprocessing.yaml", cfg.preprocessing),
        ("training.yaml", cfg.training),
    ):
        with open(os.path.join(cfg_dir, name), "w") as f:
            yaml.safe_dump(
                _tuples_to_lists(dataclasses.asdict(section)), f, sort_keys=False
            )
    return cfg_dir


def read_loss_history(log_dir):
    """Collect (step, metrics) rows from the MetricsLogger JSONL files."""
    import glob

    rows = []
    for path in sorted(glob.glob(os.path.join(log_dir, "*.jsonl"))):
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return rows


def plot_losses(histories, out_png):
    """Loss curves per trained model (one panel per model)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception as e:  # pragma: no cover
        print(f"[results] matplotlib unavailable ({e}); skipping loss plot")
        return None
    live = {k: v for k, v in histories.items() if v}
    if not live:
        return None
    fig, axes = plt.subplots(1, len(live), figsize=(5 * len(live), 3.4), squeeze=False)
    for ax, (name, rows) in zip(axes[0], live.items()):
        steps = [r.get("step", i) for i, r in enumerate(rows)]
        key = "total" if any("total" in r for r in rows) else "loss"
        vals = [r.get(key) for r in rows]
        pts = [(s, v) for s, v in zip(steps, vals) if v is not None]
        if pts:
            ax.plot(*zip(*pts), lw=1.0)
        ax.set_title(name)
        ax.set_xlabel("step")
        ax.set_ylabel(key)
        ax.set_yscale("log")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"[results] wrote {out_png}")
    return out_png


def fmt_pct(x):
    return f"{x:.2f}" if isinstance(x, (int, float)) else str(x)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="runs/results", help="run workdir")
    ap.add_argument("--num_train", type=int, default=1200)
    ap.add_argument("--num_val", type=int, default=200)
    ap.add_argument("--num_test", type=int, default=200)
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=25, help="U-Net + full-method epochs")
    ap.add_argument("--variant_epochs", type=int, default=15, help="ablation-variant epochs")
    ap.add_argument("--eval_images", type=int, default=200, help="Table-2/3 image cap")
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke configuration (CI guard)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--results_dir", default="outputs", help="where RESULTS.md lands")
    args = ap.parse_args()

    if args.quick:
        args.num_train, args.num_val, args.num_test = 12, 4, 6
        args.image_size, args.batch_size = 64, 2
        args.epochs, args.variant_epochs, args.eval_images = 2, 1, 4

    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=args.cpu)

    from mingraph_unet_tpu.data.synthetic import generate_orchard_dataset
    from mingraph_unet_tpu.experiments.segmentation_performance import (
        evaluate_segmentation_model,
        print_table1,
    )
    from mingraph_unet_tpu.experiments.yield_estimation_performance import (
        evaluate_yield_model,
    )
    from mingraph_unet_tpu.train.end_to_end import train_end_to_end
    from mingraph_unet_tpu.train.segmentation import train_unet_segmentation

    out_root = os.path.abspath(args.out)
    data_root = os.path.join(out_root, "data")
    size = (args.image_size, args.image_size)
    t_start = time.time()

    # --- 1. dataset ---
    marker = os.path.join(data_root, ".complete")
    if os.path.exists(marker):
        print(f"[results] dataset already generated under {data_root}")
    else:
        print(f"[results] generating orchard dataset under {data_root} ...")
        generate_orchard_dataset(
            data_root, args.num_train, args.num_val, args.num_test, size,
            max_fruits=6 if args.quick else 9,
        )
        with open(marker, "w") as f:
            f.write("ok")

    common = dict(
        data_root=data_root, image_size=size, batch_size=args.batch_size,
        lr_step=max(1, args.epochs // 2),
    )

    # --- 2. train baseline U-Net + full method ---
    cfg_unet = write_config_dir(
        os.path.join(out_root, "unet", "configs"), epochs=args.epochs,
        ckpt_dir=os.path.join(out_root, "unet", "checkpoints"),
        log_dir=os.path.join(out_root, "unet", "logs"),
        annotations=False, **common,
    )
    print("\n[results] === training U-Net baseline ===")
    train_unet_segmentation(cfg_unet)

    cfg_full = write_config_dir(
        os.path.join(out_root, "full", "configs"), epochs=args.epochs,
        ckpt_dir=os.path.join(out_root, "full", "checkpoints"),
        log_dir=os.path.join(out_root, "full", "logs"),
        use_dense=True, **common,
    )
    print("\n[results] === training full MinGraph-UNet ===")
    train_end_to_end(cfg_full)

    # Two-phase full method (r4): same budget, but the first third of the
    # epochs train seg+detection only before the graph losses engage — the
    # value study's measured rescue for multi-loss interference
    # (outputs/VALUE_STUDY.md; TrainingConfig.graph_warmup_epochs).
    cfg_twophase = write_config_dir(
        os.path.join(out_root, "full_twophase", "configs"), epochs=args.epochs,
        ckpt_dir=os.path.join(out_root, "full_twophase", "checkpoints"),
        log_dir=os.path.join(out_root, "full_twophase", "logs"),
        use_dense=True, graph_warmup_epochs=max(1, args.epochs // 3), **common,
    )
    print("\n[results] === training full MinGraph-UNet (two-phase) ===")
    train_end_to_end(cfg_twophase)

    # --- 3. train ablation variants (full method reuses step 2) ---
    variant_dirs = {"combined": (cfg_full, os.path.join(out_root, "full", "checkpoints"))}
    for name, slug in ABLATION_VARIANTS.items():
        if slug == "combined":
            continue
        root = os.path.join(out_root, "variants", slug)
        cfg_dir = write_config_dir(
            os.path.join(root, "configs"), epochs=args.variant_epochs,
            ckpt_dir=os.path.join(root, "checkpoints"),
            log_dir=os.path.join(root, "logs"),
            ablation=VARIANT_TOGGLES[slug], **common,
        )
        print(f"\n[results] === training ablation variant {name!r} ===")
        train_end_to_end(cfg_dir)
        variant_dirs[slug] = (cfg_dir, os.path.join(root, "checkpoints"))

    # --- 4. evaluate ---
    results = {
        "config": {
            k: getattr(args, k)
            for k in ("num_train", "num_val", "num_test", "image_size",
                      "batch_size", "epochs", "variant_epochs", "eval_images", "quick")
        },
        "dataset": "synthetic annotated orchard (mingraph_unet_tpu/data/synthetic.py)",
    }

    print("\n[results] === Table 1: segmentation (test split) ===")
    table1 = {}
    table1["unet"] = evaluate_segmentation_model(
        cfg_unet, os.path.join(out_root, "unet", "checkpoints"), "unet"
    )
    table1["mingraph-unet"] = evaluate_segmentation_model(
        cfg_full, os.path.join(out_root, "full", "checkpoints"), "mingraph-unet"
    )
    # The graph branch touching segmentation directly: eval-time region-mean
    # logit blending over the trained MinCut partition (same checkpoint).
    table1["mingraph-unet + graph-refined eval"] = evaluate_segmentation_model(
        cfg_full, os.path.join(out_root, "full", "checkpoints"),
        "mingraph-unet-refined",
    )
    table1["mingraph-unet (two-phase)"] = evaluate_segmentation_model(
        cfg_twophase, os.path.join(out_root, "full_twophase", "checkpoints"),
        "mingraph-unet",
    )
    results["table1_segmentation"] = table1

    print("\n[results] === Table 2: yield estimation (test split) ===")
    test_img_dir = os.path.join(data_root, "test", "images")
    test_ann = os.path.join(data_root, "test", "annotations.json")
    table2 = {}
    table2["unet_cc_counting"] = evaluate_yield_model(
        cfg_unet, os.path.join(out_root, "unet", "checkpoints"),
        model_type="unet", num_images=args.eval_images,
        image_dir=test_img_dir, ann_file=test_ann,
    )
    table2["mingraph_unet_cc_counting"] = evaluate_yield_model(
        cfg_full, os.path.join(out_root, "full", "checkpoints"),
        model_type="mingraph-unet", num_images=args.eval_images,
        image_dir=test_img_dir, ann_file=test_ann,
    )
    table2["mingraph_unet_dense_head"] = evaluate_yield_model(
        cfg_full, os.path.join(out_root, "full", "checkpoints"),
        model_type="mingraph-unet-dense", num_images=args.eval_images,
        image_dir=test_img_dir, ann_file=test_ann,
    )
    table2["mingraph_unet_twophase_cc_counting"] = evaluate_yield_model(
        cfg_twophase, os.path.join(out_root, "full_twophase", "checkpoints"),
        model_type="mingraph-unet", num_images=args.eval_images,
        image_dir=test_img_dir, ann_file=test_ann,
    )
    table2["mingraph_unet_twophase_dense_head"] = evaluate_yield_model(
        cfg_twophase, os.path.join(out_root, "full_twophase", "checkpoints"),
        model_type="mingraph-unet-dense", num_images=args.eval_images,
        image_dir=test_img_dir, ann_file=test_ann,
    )
    results["table2_yield"] = table2

    print("\n[results] === Table 3: trained ablation variants ===")
    table3 = []
    for name, slug in ABLATION_VARIANTS.items():
        cfg_dir, ckpt = variant_dirs[slug]
        row = evaluate_yield_model(
            cfg_dir, ckpt, model_type="mingraph-unet",
            num_images=args.eval_images,
            ablation=VARIANT_TOGGLES[slug],
            image_dir=test_img_dir, ann_file=test_ann,
        )
        table3.append({"variant": name, **row, "mocked": False})
    results["table3_ablation"] = table3

    # --- 5. write artifacts ---
    os.makedirs(args.results_dir, exist_ok=True)
    histories = {
        "unet": read_loss_history(os.path.join(out_root, "unet", "logs")),
        "mingraph-unet": read_loss_history(os.path.join(out_root, "full", "logs")),
    }
    curve_png = plot_losses(
        histories, os.path.join(args.results_dir, "loss_curves.png")
    )
    results["wall_clock_sec"] = round(time.time() - t_start, 1)

    json_path = os.path.join(args.results_dir, "results.json")
    with open(json_path, "w") as f:
        json.dump(
            results, f, indent=2,
            default=lambda o: o.tolist() if hasattr(o, "tolist") else float(o),
        )
    print(f"[results] wrote {json_path}")

    md_path = os.path.join(args.results_dir, "RESULTS.md")
    with open(md_path, "w") as f:
        f.write(_render_markdown(results, curve_png))
    print(f"[results] wrote {md_path}")
    for name, rows in table1.items():
        print_table1(rows, name)
    return results


def _render_markdown(results, curve_png):
    cfg = results["config"]
    lines = [
        "# RESULTS — trained accuracy tables",
        "",
        f"Synthetic annotated orchard dataset ({cfg['num_train']} train / "
        f"{cfg['num_val']} val / {cfg['num_test']} test images at "
        f"{cfg['image_size']}², generator: `mingraph_unet_tpu/data/synthetic.py`), "
        f"trained to convergence with `scripts/run_results.py` "
        f"({cfg['epochs']} epochs main models, {cfg['variant_epochs']} per ablation "
        f"variant, batch {cfg['batch_size']}, bf16). All numbers below are measured "
        "from trained checkpoints — no mocks anywhere. Metric definitions are the "
        "reference's exactly (`experiments/metrics.py`; parity-tested).",
        "",
        "## Table 1 — segmentation (test split)",
        "",
        "| Model | mIoU | Mango IoU | Mean precision | Mean recall | Mean F1 | Pixel acc. |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, r in results["table1_segmentation"].items():
        iou = r.get("iou_per_class", [float("nan")] * 2)
        mango = iou[1] if len(iou) > 1 else float("nan")
        cm = r.get("confusion_matrix")
        pixel_acc = float("nan")
        if cm is not None:
            import numpy as np

            cm = np.asarray(cm, dtype=np.float64)
            pixel_acc = float(np.trace(cm) / max(cm.sum(), 1.0))
        lines.append(
            f"| {name} | {r.get('mean_iou', float('nan')):.4f} | {mango:.4f} | "
            f"{r.get('mean_precision', float('nan')):.4f} | "
            f"{r.get('mean_recall', float('nan')):.4f} | "
            f"{r.get('mean_f1', float('nan')):.4f} | "
            f"{pixel_acc:.4f} |"
        )
    lines += [
        "",
        "## Table 2 — yield estimation (test split)",
        "",
        "| Detector | Count acc. (%) | Yield err. (%) | Obj. matching (%) | Occlusion robustness (%) | AP@0.5 (%) |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in results["table2_yield"].items():
        lines.append(
            f"| {name} | {fmt_pct(r.get('count_accuracy_perc'))} | "
            f"{fmt_pct(r.get('yield_estimation_error_perc'))} | "
            f"{fmt_pct(r.get('object_matching_rate_perc'))} | "
            f"{fmt_pct(r.get('occlusion_robustness_perc'))} | "
            f"{fmt_pct(r.get('ap50_perc'))} |"
        )
    lines += [
        "",
        "Reference paper targets (quoted at `experiments/metrics.py:188-192`): "
        "95.3 % count accuracy, 5.9 % yield error — on the real Banginapalle "
        "mango dataset, which this environment does not have; the synthetic "
        "dataset is not claimed comparable, but the full measurement path is "
        "identical.",
        "",
        "## Table 3 — ablation study (trained variants)",
        "",
        "| Variant | Count acc. (%) | Yield err. (%) |",
        "|---|---|---|",
    ]
    for r in results["table3_ablation"]:
        lines.append(
            f"| {r['variant']} | {fmt_pct(r.get('count_accuracy_perc'))} | "
            f"{fmt_pct(r.get('yield_estimation_error_perc'))} |"
        )
    lines += ["", f"Total wall clock: {results['wall_clock_sec']} s."]
    if curve_png:
        lines += ["", f"![loss curves]({os.path.basename(curve_png)})"]
    lines += [
        "",
        "Reproduce: `python scripts/run_results.py --out runs/results` "
        "(resumable; `--quick` runs the CI-guard mini version).",
        "",
    ]
    return "\n".join(lines)


if __name__ == "__main__":
    main()
