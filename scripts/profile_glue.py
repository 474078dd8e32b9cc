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


def summarize(trace_dir: str, top: int = 40):
    """Parse the xplane with tensorboard_plugin_profile and print per-op
    self-times."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("[profile] no xplane.pb found", file=sys.stderr)
        return None
    path = max(paths, key=os.path.getmtime)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("hlo_stats", "op_stats", "hlo_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([path], tool, {})
            break
        except Exception as e:
            print(f"[profile] tool {tool!r} failed: {e}", file=sys.stderr)
            data = None
    if data is None:
        return None
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    return data


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
    data = summarize(trace_dir)
    if data is None:
        return
    out_path = os.path.join(trace_dir, "hlo_stats.json")
    with open(out_path, "w") as f:
        f.write(data if isinstance(data, str) else json.dumps(data))
    print(f"[profile] wrote {out_path}", file=sys.stderr)
    # hlo_stats is a JSON table; print the top rows by self time.
    try:
        tbl = json.loads(data)
        rows = tbl[0]["rows"] if isinstance(tbl, list) else tbl["rows"]
        cols = [c["label"] if isinstance(c, dict) else c for c in
                (tbl[0]["cols"] if isinstance(tbl, list) else tbl["cols"])]
        print("\t".join(cols))
        for r in rows[:40]:
            vals = [str(c.get("v") if isinstance(c, dict) else c) for c in r["c"]]
            print("\t".join(vals))
    except Exception as e:
        print(f"[profile] raw dump (parse fallback: {e}); see {out_path}")


if __name__ == "__main__":
    main()
