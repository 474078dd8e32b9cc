#!/usr/bin/env python
"""CLI: U-Net-only segmentation training (≡ reference
``scripts/train_segmentation.py``).

With ``--config_path`` runs the real training; with no args it
self-bootstraps a tiny dummy dataset + configs and runs a short smoke
(reference ``__main__`` pattern, ``train_segmentation.py:172-231``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Train U-Net for mango segmentation")
    parser.add_argument("--config_path", type=str, default=None, help="Directory with the 4 YAML configs")
    parser.add_argument("--epochs", type=int, default=None, help="Override num_epochs")
    parser.add_argument("--cpu", action="store_true", help="Force CPU backend")
    args = parser.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=args.cpu or args.config_path is None)

    from mingraph_unet_tpu.train.segmentation import train_unet_segmentation

    if args.config_path:
        train_unet_segmentation(args.config_path, max_epochs=args.epochs)
        return

    # Self-bootstrapping smoke run.
    import shutil
    import tempfile

    from mingraph_unet_tpu.utils.bootstrap import make_dummy_run

    base = tempfile.mkdtemp(prefix="mgu_smoke_")
    try:
        cfg_dir = make_dummy_run(base, num_images=4, image_size=(64, 64), batch_size=2, num_epochs=2)
        state, history = train_unet_segmentation(cfg_dir, max_epochs=args.epochs or 2)
        print(f"[smoke] final epoch losses: {history['epoch_loss']}")
        assert history["epoch_loss"][-1] > 0
        print("[smoke] train_segmentation OK")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
