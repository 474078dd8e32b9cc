"""Ablation study harness (≡ ``experiments/ablation_study.py``).

Maps the paper's Table-3 variant names to **real ablated architectures**
(stage toggles on :class:`MinGraphUNet`) and evaluates each with the yield
harness. The reference names exactly this requirement — the loader must
"instantiate the ablated model" (``ablation_study.py:36-40``) — but provides
no switches; the Table-3 names (lines 78-85) are vague, so the mapping below
records our interpretation:

- "Min-Cut Only"            — partition without GAT refinement:
                              patch_gat=off, partition=on, region_gat=off
- "Graph U-Net Only"        — U-Net + patch GAT, no partition/region stages:
                              patch_gat=on, partition=off
- "Graph Construction"      — raw patch-graph features fused, no message
                              passing or partition: all graph stages off
- "Graph Traversal"         — GAT + partition without the region GAT:
                              patch_gat=on, partition=on, region_gat=off
- "Combined (Full Method)"  — the full MinGraph-UNet (all stages on)

When trained weights for a variant are missing the reference silently
fabricates ``U(80, 95)`` / ``U(5, 15)`` mock numbers (lines 43-51, with its
missing-``np``-import bug); here missing weights are reported as such, and
mock numbers are only produced with an explicit ``allow_mock=True`` and are
clearly labeled ``"mocked": True``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Dict, List, Optional

import numpy as np

from mingraph_unet_tpu.experiments.yield_estimation_performance import evaluate_yield_model

__all__ = [
    "ABLATION_VARIANTS",
    "VARIANT_TOGGLES",
    "apply_variant",
    "run_ablation_experiment",
    "run_ablation_study",
]

ABLATION_VARIANTS: Dict[str, str] = {
    "Min-Cut Only": "mincut_only",
    "Graph U-Net Only": "graph_unet_only",
    "Graph Construction": "graph_construction",
    "Graph Traversal": "graph_traversal",
    "Combined (Full Method)": "combined",
}

# Stage toggles per variant slug (see module docstring for the rationale).
VARIANT_TOGGLES: Dict[str, Dict[str, bool]] = {
    "mincut_only": {"use_patch_gat": False, "use_partition": True, "use_region_gat": False},
    "graph_unet_only": {"use_patch_gat": True, "use_partition": False, "use_region_gat": False},
    "graph_construction": {
        "use_patch_gat": False,
        "use_partition": False,
        "use_region_gat": False,
    },
    "graph_traversal": {"use_patch_gat": True, "use_partition": True, "use_region_gat": False},
    "combined": {"use_patch_gat": True, "use_partition": True, "use_region_gat": True},
}


def apply_variant(cfg, variant_slug: str):
    """Return a copy of ``cfg`` with the variant's stage toggles applied to
    ``cfg.model.ablation`` (the config consumed by ``build_mingraph_unet``)."""
    toggles = VARIANT_TOGGLES[variant_slug]
    cfg = dataclasses.replace(cfg)
    cfg.model = dataclasses.replace(
        cfg.model, ablation=dataclasses.replace(cfg.model.ablation, **toggles)
    )
    return cfg


def run_ablation_experiment(
    variant_name: str,
    config_dir: Optional[str],
    weights_path: Optional[str],
    num_images: int = 8,
    allow_mock: bool = False,
    seed: int = 0,
) -> Dict[str, float]:
    if variant_name not in ABLATION_VARIANTS:
        raise ValueError(
            f"Unknown variant {variant_name!r}; choices: {list(ABLATION_VARIANTS)}"
        )
    have_weights = weights_path is not None and os.path.isdir(weights_path)
    if not have_weights:
        if not allow_mock:
            raise FileNotFoundError(
                f"No weights for variant {variant_name!r} at {weights_path!r}. "
                "Pass allow_mock=True for reference-style mock numbers."
            )
        rng = np.random.default_rng(seed + hash(variant_name) % 1000)
        return {
            "variant": variant_name,
            "count_accuracy_perc": float(rng.uniform(80, 95)),
            "yield_estimation_error_perc": float(rng.uniform(5, 15)),
            "mocked": True,
        }
    results = evaluate_yield_model(
        config_dir,
        weights_path,
        model_type="mingraph-unet",
        num_images=num_images,
        seed=seed,
        ablation=VARIANT_TOGGLES[ABLATION_VARIANTS[variant_name]],
    )
    return {"variant": variant_name, **results, "mocked": False}


def run_ablation_study(
    config_dir: Optional[str] = None,
    weights_root: Optional[str] = None,
    num_images: int = 8,
    allow_mock: bool = True,
) -> List[Dict[str, float]]:
    """Run all Table-3 variants; weights expected under
    ``{weights_root}/{variant_slug}/``."""
    rows = []
    for name, slug in ABLATION_VARIANTS.items():
        weights = os.path.join(weights_root, slug) if weights_root else None
        try:
            rows.append(
                run_ablation_experiment(name, config_dir, weights, num_images, allow_mock)
            )
        except FileNotFoundError as e:
            print(f"[ablation] {name}: {e}")
    print("\n--- Ablation Study (Table-3 format) ---")
    print(f"{'Variant':<26} {'Count Acc. (%)':>15} {'Yield Err. (%)':>15} {'mocked':>8}")
    for r in rows:
        print(
            f"{r['variant']:<26} {r['count_accuracy_perc']:>15.2f} "
            f"{r['yield_estimation_error_perc']:>15.2f} {str(r.get('mocked', False)):>8}"
        )
    return rows


def main():
    parser = argparse.ArgumentParser(description="Run the ablation study")
    parser.add_argument("--config_path", default=None)
    parser.add_argument("--weights_root", default=None)
    parser.add_argument("--num_images", type=int, default=8)
    parser.add_argument("--no_mock", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=args.cpu)
    run_ablation_study(
        args.config_path, args.weights_root, args.num_images, allow_mock=not args.no_mock
    )


if __name__ == "__main__":
    main()
