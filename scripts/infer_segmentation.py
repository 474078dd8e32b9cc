#!/usr/bin/env python
"""CLI: single-image U-Net segmentation inference (≡ reference
``scripts/infer_segmentation.py``).

With args: ``--config_path --image_path --weights_path [--output_dir]``.
With no args: self-bootstraps a tiny train run, then infers on one of its
images (reference ``__main__`` pattern, ``infer_segmentation.py:136-187``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Infer mango segmentation on one image")
    parser.add_argument("--config_path", type=str, default=None)
    parser.add_argument("--image_path", type=str, default=None)
    parser.add_argument("--weights_path", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default="outputs/inference")
    parser.add_argument("--large_scene", action="store_true",
                        help="Tiled native-resolution inference for big scenes")
    parser.add_argument("--tile", type=int, default=512)
    parser.add_argument("--halo", type=int, default=64)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    self_smoke = args.config_path is None
    setup_host(force_cpu=args.cpu or self_smoke)

    from mingraph_unet_tpu.train.infer import infer_segmentation, infer_segmentation_large

    if not self_smoke:
        if not (args.image_path and args.weights_path):
            parser.error("--image_path and --weights_path are required with --config_path")
        if args.large_scene:
            infer_segmentation_large(args.config_path, args.image_path, args.weights_path,
                                     args.output_dir, tile=args.tile, halo=args.halo)
        else:
            infer_segmentation(args.config_path, args.image_path, args.weights_path, args.output_dir)
        return

    import glob
    import shutil
    import tempfile

    from mingraph_unet_tpu.train.segmentation import train_unet_segmentation
    from mingraph_unet_tpu.utils.bootstrap import make_dummy_run

    base = tempfile.mkdtemp(prefix="mgu_infer_smoke_")
    try:
        cfg_dir = make_dummy_run(base, num_images=4, image_size=(64, 64), batch_size=2, num_epochs=1)
        train_unet_segmentation(cfg_dir, max_epochs=1)
        image = sorted(glob.glob(os.path.join(base, "data/train/images/*.png")))[0]
        out = infer_segmentation(
            cfg_dir, image, os.path.join(base, "checkpoints"), args.output_dir
        )
        assert out["labels"].shape == (64, 64)
        print("[smoke] infer_segmentation OK")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
