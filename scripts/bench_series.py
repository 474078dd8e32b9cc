#!/usr/bin/env python
"""Canonical cross-round lowering series in ONE process (VERDICT r3 #6,
ROADMAP item 4).

The flagship workload (512² batch 8, full MinGraph pipeline, bf16) under
the four generations of U-Net lowering, measured back-to-back in one
process with one timing methodology so every delta is CODE, not timer:

- ``r2``: s2d level-0 with XLA dense-s2d convs (``MG_PSCONV_SITES=none``);
- ``r3``: + the production phase-select Pallas conv kernels (``auto``);
- ``r4``: + the level-1 s2d extension (``unet_s2d_level1=True``);
- ``r5``: + the relayout-free Pallas phase-max-pool (``MG_POOL_KERNEL``).

Methodology: the same two-length jitted-scan slope as ``bench_matrix.py``
(cancels the fixed ~25 ms relay dispatch per call); each arm gets a FRESH
model instance and a FRESH jitted closure (the psconv dispatch gate reads
``MG_PSCONV_SITES`` at trace time, and jit caching would otherwise reuse
arm A's executable for arm B). bench.py's 40-iter amortized loop remains
the driver series (BENCH_r0N.json); this script exists to compare CODE
generations under ONE timer, which the README table then cites.

Run: ``python scripts/bench_series.py`` (TPU; ``--cpu`` smoke-checks the
harness on tiny shapes). Writes ``outputs/bench_series.json``.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=args.cpu)

    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.pipeline import MinGraphUNet

    if args.cpu:
        args.size, args.batch, args.iters = 128, 2, 3

    batch, size, iters = args.batch, args.size, args.iters
    x = jnp.zeros((batch, size, size, 3), jnp.float32)

    ARMS = (
        ("r2_xla_s2d", "none", False, "0"),
        ("r3_psconv", "auto", False, "0"),
        ("r4_level1", "auto", True, "0"),
        ("r5_pool_kernel", "auto", True, "1"),
    )

    rows = []
    for name, sites, level1, pool in ARMS:
        os.environ["MG_PSCONV_SITES"] = sites
        os.environ["MG_POOL_KERNEL"] = pool
        model = MinGraphUNet(dtype=jnp.bfloat16, detection_pre_pool=32,
                             unet_s2d_level1=level1)
        variables = jax.jit(model.init)(jax.random.key(0), x)
        jax.block_until_ready(variables)

        # Fresh closure per arm -> fresh jit cache entry; the env var is
        # re-read when THIS closure traces.
        def forward(variables, x, carry, _model=model):
            out = _model.apply(variables, x + carry * 1e-12, train=False)
            return (out["logits"].sum() + out["pred_confidence"].sum()
                    + out["pred_bboxes"].sum()).astype(jnp.float32)

        from functools import partial

        @partial(jax.jit, static_argnames=("length",))
        def loop(variables, x, length, _fwd=forward):
            def body(c, _):
                return _fwd(variables, x, c), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=length)
            return c

        def best(length, reps=3):
            t0 = time.perf_counter()
            float(loop(variables, x, length=length))
            compile_t = time.perf_counter() - t0
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(loop(variables, x, length=length))
                b = min(b, time.perf_counter() - t0)
            return b, compile_t

        t_short, c1 = best(iters)
        t_long, c2 = best(3 * iters)
        ms = (t_long - t_short) / (2 * iters) * 1e3
        row = {"arm": name, "sites": sites, "s2d_level1": level1,
               "ms_per_step": ms, "images_per_s": batch / (ms / 1e3),
               "compile_s": c1 + c2}
        rows.append(row)
        print(f"[series] {name:>12}: {ms:.2f} ms/step -> "
              f"{row['images_per_s']:.1f} img/s (compile {c1 + c2:.0f}s)",
              flush=True)

    os.makedirs(os.path.join(REPO, "outputs"), exist_ok=True)
    out = os.path.join(REPO, "outputs", "bench_series.json")
    with open(out, "w") as f:
        json.dump({"batch": batch, "size": size, "slope_iters": iters,
                   "platform": jax.devices()[0].platform, "rows": rows},
                  f, indent=2)
    print(f"[series] wrote {out}")


if __name__ == "__main__":
    main()
