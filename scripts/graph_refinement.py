#!/usr/bin/env python
"""CLI: graph-branch pipeline demo (≡ reference ``scripts/graph_refinement.py``).

Runs the graph stages standalone on one image: preprocess → patch features
(pooled pixels ⊕ Sobel ⊕ hist-eq, the recipe at ``graph_refinement.py:76-111``)
→ lattice GAT → segment predictor + Ncut loss → hard patch labels. This is
the authoritative smoke test for how patch-node features are assembled.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_graph_pipeline(config_dir: str, image_path: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mingraph_unet_tpu.config import PipelineConfig
    from mingraph_unet_tpu.data.dataset import load_image_rgb, _resize_image
    from mingraph_unet_tpu.models.gat import GATNetwork
    from mingraph_unet_tpu.models.mincut import MinCutRefinement
    from mingraph_unet_tpu.ops import filters
    from mingraph_unet_tpu.ops.image import normalize
    from mingraph_unet_tpu.ops.patches import patch_reduce_mean

    cfg = PipelineConfig.from_config_dir(config_dir)
    patch = cfg.model.graph_construction.patch_size
    gat_cfg = cfg.model.gat

    rgb = _resize_image(load_image_rgb(image_path), cfg.preprocessing.resize_dim)
    x = normalize(jnp.asarray(rgb, jnp.float32) / 255.0,
                  cfg.preprocessing.normalization_mean, cfg.preprocessing.normalization_std)

    # Patch features: pooled normalized pixels (U-Net placeholder in the
    # reference demo) ⊕ Sobel mean ⊕ hist-eq mean.
    unet_feat = patch_reduce_mean(x[None], patch)  # (1, nph, npw, 3)
    sobel = filters.sobel_magnitude(jnp.asarray(rgb))[None, ..., None] / 255.0
    sobel_feat = patch_reduce_mean(sobel, patch)
    histeq = filters.equalize_histogram_rgb(jnp.asarray(rgb)).astype(jnp.float32)[None] / 255.0
    histeq_feat = patch_reduce_mean(histeq, patch)
    feats = jnp.concatenate([unet_feat, sobel_feat, histeq_feat], axis=-1)
    nph, npw = feats.shape[1], feats.shape[2]
    print(f"[graph] patch grid {nph}x{npw}, node feature dim {feats.shape[-1]}")

    gat = GATNetwork(hidden_dim=gat_cfg.hidden_dim, output_dim=gat_cfg.output_dim,
                     num_heads=gat_cfg.num_heads, num_layers=1,
                     dropout_rate=gat_cfg.dropout, alpha=gat_cfg.alpha, backend="lattice")
    v_gat = jax.jit(gat.init)(jax.random.key(0), feats)
    refined = jax.jit(lambda v, f: gat.apply(v, f))(v_gat, feats)
    print(f"[graph] GAT-refined features: {refined.shape}")

    mincut = MinCutRefinement(num_segments=cfg.dataset.num_semantic_regions,
                              sigma_ncut=cfg.model.mincut.sigma_ncut, backend="lattice")
    v_mc = jax.jit(mincut.init)(jax.random.key(1), refined)
    l_part, soft = jax.jit(lambda v, f: mincut.apply(v, f))(v_mc, refined)
    hard = np.asarray(jnp.argmax(soft, axis=-1))[0]
    print(f"[graph] L_partition = {float(l_part[0]):.6f}")
    print(f"[graph] hard patch labels ({nph}x{npw}):")
    print(hard)
    return float(l_part[0]), hard


def main():
    parser = argparse.ArgumentParser(description="Graph refinement pipeline demo")
    parser.add_argument("--config_path", type=str, default=None)
    parser.add_argument("--image_path", type=str, default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    self_smoke = args.config_path is None
    setup_host(force_cpu=args.cpu or self_smoke)

    if not self_smoke:
        if not args.image_path:
            parser.error("--image_path required with --config_path")
        test_graph_pipeline(args.config_path, args.image_path)
        return

    import glob
    import shutil
    import tempfile

    from mingraph_unet_tpu.utils.bootstrap import make_dummy_run

    base = tempfile.mkdtemp(prefix="mgu_graph_smoke_")
    try:
        cfg_dir = make_dummy_run(base, num_images=1, image_size=(64, 64))
        image = sorted(glob.glob(os.path.join(base, "data/train/images/*.png")))[0]
        l_part, hard = test_graph_pipeline(cfg_dir, image)
        assert l_part >= 0
        print("[smoke] graph_refinement OK")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
