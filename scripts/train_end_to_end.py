#!/usr/bin/env python
"""CLI: end-to-end MinGraph-UNet training (≡ reference
``scripts/train_end_to_end.py``).

With ``--config_path`` runs the real training; with no args it
self-bootstraps a tiny dummy dataset + configs and runs a short smoke
(reference ``__main__`` pattern, ``train_end_to_end.py:510-562``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Train the full MinGraph-UNet pipeline")
    parser.add_argument("--config_path", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--no_detection", action="store_true", help="Skip detection losses")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=args.cpu or args.config_path is None)

    from mingraph_unet_tpu.train.end_to_end import train_end_to_end

    if args.config_path:
        train_end_to_end(
            args.config_path, max_epochs=args.epochs, train_detection=not args.no_detection
        )
        return

    import shutil
    import tempfile
    import traceback

    from mingraph_unet_tpu.utils.bootstrap import make_dummy_run

    base = tempfile.mkdtemp(prefix="mgu_e2e_smoke_")
    try:
        cfg_dir = make_dummy_run(
            base, num_images=4, image_size=(64, 64), batch_size=2, num_epochs=2, patch_size=16
        )
        state, history = train_end_to_end(cfg_dir, max_epochs=args.epochs or 2)
        print(f"[smoke] epoch losses: {history['epoch_loss']}")
        print("[smoke] train_end_to_end OK")
    except Exception:
        traceback.print_exc()
        raise
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
