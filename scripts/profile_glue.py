#!/usr/bin/env python
"""Attribute the U-Net's unexplained ~2-3 ms/step (VERDICT r2 missing #4).

Per-level probes sum to ~8.6 ms of an ~11.5 ms U-Net at 512² b8
(``perf_lab.py unetlevels``); this captures a jax.profiler device trace of
the production forward and prints per-HLO-op time, so the gap gets a name
(relayout copies between blocks? pool/d2s epilogues? scheduling holes?).

Usage:
    python scripts/profile_glue.py [--what unet|pipeline] [--steps 30]

Writes the raw trace under outputs/profile/ and prints the top ops by
self-time, grouped by op category.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(what: str, steps: int, trace_dir: str):
    import jax
    import jax.numpy as jnp

    from mingraph_unet_tpu.models.pipeline import MinGraphUNet
    from mingraph_unet_tpu.models.unet import UNet

    x = jnp.zeros((8, 512, 512, 3), jnp.float32)
    if what == "unet":
        model = UNet(dtype=jnp.bfloat16, s2d_level0=True)
        variables = jax.jit(model.init)(jax.random.key(0), x)

        def fwd(v, xx, c):
            return model.apply(v, xx + c * 1e-12, train=False)[0].sum()

    else:
        model = MinGraphUNet(dtype=jnp.bfloat16, detection_pre_pool=32)
        variables = jax.jit(model.init)(jax.random.key(0), x)

        def fwd(v, xx, c):
            out = model.apply(v, xx + c * 1e-12, train=False)
            return out["logits"].sum() + out["pred_confidence"].sum()

    @jax.jit
    def loop(v, xx):
        def body(c, _):
            return fwd(v, xx, c), None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    float(loop(variables, x))  # compile
    t0 = time.perf_counter()
    float(loop(variables, x))
    dt = (time.perf_counter() - t0) / steps
    print(f"[profile] {what}: {dt * 1e3:.2f} ms/step (pre-trace)", file=sys.stderr)

    with jax.profiler.trace(trace_dir):
        float(loop(variables, x))
    return dt


def summarize(trace_dir: str, steps: int, top: int = 30):
    """Aggregate device-side XLA-op self time by op name / HLO category /
    source line and print the top entries per step (shared parser:
    ``utils/profiling.py::parse_device_trace``)."""
    import collections

    from mingraph_unet_tpu.utils.profiling import parse_device_trace

    all_rows = parse_device_trace(trace_dir, steps)
    if not all_rows:
        print("[profile] no trace.json.gz found", file=sys.stderr)
        return None
    cat = collections.Counter()
    for r in all_rows:
        cat[r["category"] or "?"] += r["us_per_step"]
    print("== time by HLO category (ms/step) ==")
    for c, d in cat.most_common(10):
        print(f"{d / 1e3:8.3f}  {c}")
    print("== top ops (us/step) ==")
    rows = []
    for r in all_rows[:top]:
        src = r["source"].split("/")[-1]
        row = {
            "us_per_step": round(r["us_per_step"], 1),
            "op": r["op"],
            "category": r["category"],
            "source": src,
            "long_name": r["long_name"][:160],
        }
        rows.append(row)
        print(
            f"{row['us_per_step']:8.1f}  {r['op']:30s} {row['category'][:18]:18s} "
            f"{src[:24]:24s} {row['long_name'][:48]}"
        )
    total = sum(r["us_per_step"] for r in all_rows)
    print(f"TOTAL accounted: {total / 1e3:.2f} ms/step")
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="unet", choices=("unet", "pipeline"))
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default="outputs/profile")
    args = ap.parse_args()

    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=False)

    trace_dir = os.path.abspath(os.path.join(args.out, args.what))
    os.makedirs(trace_dir, exist_ok=True)
    capture(args.what, args.steps, trace_dir)
    rows = summarize(trace_dir, args.steps)
    if rows is None:
        return
    out_path = os.path.join(trace_dir, "hlo_stats.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[profile] wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
