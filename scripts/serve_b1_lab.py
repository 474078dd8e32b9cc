#!/usr/bin/env python
"""Small-batch (b1) serving lab — VERDICT r4 #6.

At batch 1 the production psconv kernels and the level-1 s2d lowering gate
OFF: the lane-aware profitability rule (per-shard pixels·lanes ≥ 2^25,
``models/unet.py::_psconv_auto``) was measured at b8, and b1 sits at 2^23.
r4's recorded b1 point is 2.3 ms device latency / 444 img/s steady-state.

This lab measures the b1 A/B matrix the rule never saw:

- ``MG_PSCONV_SITES`` ∈ {auto (off at b1), all (forced on)}
- ``unet_s2d_level1`` ∈ {auto, True}

with the same jitted-scan slope timer as ``bench_series.py`` (cancels relay
dispatch), then trace-attributes the best arm's device time by stage. Each
arm gets a fresh jit (the dispatch gates read env/attrs at trace time).

Writes ``outputs/serve_b1.json``. Run: ``python scripts/serve_b1_lab.py``
(TPU; ``--cpu`` smoke-checks the harness).
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=args.cpu)

    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.pipeline import MinGraphUNet

    if args.cpu:
        args.size, args.iters = 64, 2

    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)

    def measure(sites: str, level1, label: str, trace: bool = False):
        os.environ["MG_PSCONV_SITES"] = sites
        model = MinGraphUNet(dtype=jnp.bfloat16, detection_pre_pool=32,
                             unet_s2d_level1=level1)
        variables = jax.jit(model.init)(jax.random.key(0), x)

        from functools import partial

        @partial(jax.jit, static_argnames="n")
        def loop(v, xx, n):
            def body(c, _):
                out = model.apply(v, xx + c * 1e-12, train=False)
                return (out["logits"].sum()
                        + out["pred_confidence"].sum()).astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        def jloop(n):
            return float(loop(variables, x, n=n))

        def timed(n, reps=3):
            t0 = time.perf_counter()
            jloop(n)
            compile_t = time.perf_counter() - t0
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                jloop(n)
                best = min(best, time.perf_counter() - t0)
            return best, compile_t

        t_short, c1 = timed(args.iters)
        t_long, c2 = timed(3 * args.iters)
        ms = (t_long - t_short) / (2 * args.iters) * 1e3
        row = {"arm": label, "sites": sites, "s2d_level1": str(level1),
               "ms_per_step": round(ms, 3),
               "images_per_s": round(args.batch / (ms / 1e3), 1),
               "compile_s": round(c1 + c2, 1)}
        print(f"[b1] {label}: {ms:.3f} ms/step "
              f"({row['images_per_s']} img/s)", flush=True)
        if trace:
            import shutil
            import tempfile

            from mingraph_unet_tpu.utils.profiling import (
                attribute_stages,
                parse_device_trace,
            )

            td = tempfile.mkdtemp(prefix="mgu_b1_trace_")
            try:
                with jax.profiler.trace(td):
                    jloop(3 * args.iters)
                rows = parse_device_trace(td, 3 * args.iters)
            finally:
                shutil.rmtree(td, ignore_errors=True)
            if rows:
                st = attribute_stages(rows, [
                    ("unet", ("models/unet.py", "pallas/psconv.py",
                              "pallas/wconv.py", "pallas/pool.py",
                              "ops/s2d.py")),
                    ("detection", ("models/detection.py",)),
                    ("aux_filters", ("ops/filters.py",)),
                    ("graph_fusion", ("models/gat.py", "models/mincut.py",
                                      "models/fusion.py", "ops/segment.py",
                                      "ops/patches.py", "models/pipeline.py")),
                ])
                st["device_total"] = round(sum(st.values()), 3)
                st["dispatch_gap"] = round(ms - st["device_total"], 3)
                row["stage_ms"] = st
                print(f"[b1] stage breakdown: {st}", flush=True)
        return row

    rows = [
        measure("auto", None, "production (gates at b1: kernels off)"),
        measure("all", None, "psconv forced on"),
        measure("auto", True, "level-1 s2d forced on"),
        measure("all", True, "psconv + level-1 forced on"),
    ]
    best = min(rows, key=lambda r: r["ms_per_step"])
    print(f"[b1] best arm: {best['arm']} at {best['ms_per_step']} ms")
    # Trace-attribute the production arm (what serving actually runs) so a
    # negative result still lands with its attribution (VERDICT r4 #6).
    rows.append(measure("auto", None, "production arm (trace)", trace=True))

    out = {"batch": args.batch, "size": args.size, "slope_iters": args.iters,
           "platform": jax.devices()[0].platform, "rows": rows}
    os.makedirs(os.path.join(REPO, "outputs"), exist_ok=True)
    path = os.path.join(REPO, "outputs", "serve_b1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[b1] wrote {path}")


if __name__ == "__main__":
    main()
