#!/usr/bin/env python
"""Dump the top XLA ops by device time for the flagship inference loop.

Perf-walk helper for ROADMAP items 6-8: traces the exact bench.py production
loop and prints per-op rows (us/step, category, source) so remaining work is
targeted from data, not memory. Run: ``python scripts/top_ops.py [--n 30]``.
"""

import argparse
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build_train_loop(size, batch, iters):
    """The exact bench_train.py e2e train-step loop (fwd+bwd+opt), jitted."""
    import dataclasses
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mingraph_unet_tpu.config import PipelineConfig
    from mingraph_unet_tpu.train.common import TrainState, make_optimizer
    from mingraph_unet_tpu.train.end_to_end import (
        build_mingraph_unet, make_e2e_train_step,
    )

    cfg = PipelineConfig()
    cfg.preprocessing = dataclasses.replace(cfg.preprocessing, resize_dim=(size, size))
    cfg.training = dataclasses.replace(cfg.training, batch_size=batch, bf16=True)
    model = build_mingraph_unet(cfg)
    tx, _ = make_optimizer(cfg.training, steps_per_epoch=100)
    train_step = make_e2e_train_step(model, tx, cfg, augment=True,
                                     train_detection=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    masks = jnp.asarray((rng.uniform(size=(batch, size, size)) < 0.07).astype(np.uint8))
    key = jax.random.key(0)
    sample = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), sample)
    state = TrainState.create(variables, tx)

    @partial(jax.jit, static_argnames=("length",))
    def loop(state, length):
        def body(carry, _):
            new_state, aux = train_step(carry, images, masks, key)
            return new_state, None

        final, _ = jax.lax.scan(body, state, None, length=length)
        return final.step, jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum().astype(jnp.float32), final.params,
            jnp.float32(0))

    def run():
        s, chk = loop(state, length=iters)
        int(s), float(chk)

    return run


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="trace the e2e TRAIN step instead of inference")
    args = ap.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=args.cpu)

    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.pipeline import MinGraphUNet
    from mingraph_unet_tpu.utils.profiling import parse_device_trace

    if args.cpu:
        args.size, args.iters = 64, 2

    if args.train:
        args.iters = min(args.iters, 12)
        run = _build_train_loop(args.size, args.batch, args.iters)
        run()  # compile
        td = tempfile.mkdtemp(prefix="mgu_topops_")
        try:
            with jax.profiler.trace(td):
                run()
            rows = parse_device_trace(td, args.iters)
        finally:
            shutil.rmtree(td, ignore_errors=True)
        rows.sort(key=lambda r: -r["us_per_step"])
        total = sum(r["us_per_step"] for r in rows)
        print(f"total device: {total / 1e3:.3f} ms/step over {len(rows)} ops")
        for r in rows[: args.n]:
            long = r.get("long_name", "") or ""
            print(f"{r['us_per_step']:9.1f} us  {r['category']:<12.12s} "
                  f"{r['op'][:40]:<40s} {r.get('source', '')}")
            if long:
                print(f"{'':24s}{long[:160]}")
        return

    model = MinGraphUNet(dtype=jnp.bfloat16, detection_pre_pool=32)
    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x)

    @jax.jit
    def loop(v, xx):
        def body(c, _):
            out = model.apply(v, xx + c * 1e-12, train=False)
            return (out["logits"].sum() + out["pred_confidence"].sum()
                    + out["pred_bboxes"].sum()), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
        return c

    float(loop(variables, x))  # compile
    td = tempfile.mkdtemp(prefix="mgu_topops_")
    try:
        with jax.profiler.trace(td):
            float(loop(variables, x))
        rows = parse_device_trace(td, args.iters)
    finally:
        shutil.rmtree(td, ignore_errors=True)
    rows.sort(key=lambda r: -r["us_per_step"])
    total = sum(r["us_per_step"] for r in rows)
    print(f"total device: {total / 1e3:.3f} ms/step over {len(rows)} ops")
    for r in rows[: args.n]:
        print(f"{r['us_per_step']:9.1f} us  {r['category']:<12.12s} "
              f"{r['op'][:58]:<58s} {r.get('source', '')}")


if __name__ == "__main__":
    main()
