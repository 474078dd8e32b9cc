#!/usr/bin/env python
"""Training-step benchmark: the psconv custom_vjp A/B (ROADMAP item 3,
VERDICT r3 #3 "Done =" criterion).

Times the FULL jitted ``make_e2e_train_step`` (pipeline forward + all seven
losses + backward + optimizer update, reference workload
``scripts/train_end_to_end.py:105-508``) at the two training-relevant
configs:

- 512² batch 8 — the flagship inference shape, trained;
- 128² batch 16 — the RESULTS/value-study training config.

Arms: ``MG_PSCONV_TRAIN=off`` (XLA dense-s2d convs — the production
default: the r4 A/B measured the kernel losing in training, see
``ConvBlock._psconv_train_on``) vs ``on`` (the phase-select Pallas
kernel's custom_vjp from ``ops/pallas/psconv.py`` — fwd/dx at 16/9× FLOPs,
dK via the s2d-tap einsum; grad parity is tested in
``tests/test_pallas_kernels.py``). r4 result (v5e, post the scatter-free
instancing fix that unmasked the conv cost): 512² b8 94.8 (off) vs 102.0
(on) ms/step; 128² b16 10.5 vs 10.3 (gate below threshold both arms —
noise).

Methodology (memory: slope-time everything; fresh jit per A/B arm):

- Each arm runs in a FRESH subprocess — the dispatch gate reads the env var
  at trace time and a shared process would also share the jit cache.
- Per arm, the step runs inside one jitted ``lax.scan`` with the TrainState
  as carry (steady-state training, nothing hoistable), at two loop lengths;
  the reported ms/step is the slope, so fixed per-dispatch relay cost
  cancels exactly as in ``bench.py``.

Run: ``python scripts/bench_train.py`` (all arms → table +
``outputs/bench_train.json``); ``--cpu --smoke`` for a tiny CPU check.
One arm in-process: ``--one SIZE BATCH`` (reads MG_PSCONV_TRAIN itself).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARMS = ("off", "on")
CONFIGS = ((512, 8), (128, 16))


def measure_one(size: int, batch: int, *, cpu: bool = False,
                iters: int = 8, reps: int = 3) -> dict:
    """Slope-timed ms/step of the jitted e2e train step at (size, batch)."""
    from mingraph_unet_tpu.utils.env import setup_host

    setup_host(force_cpu=cpu)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mingraph_unet_tpu.config import PipelineConfig
    from mingraph_unet_tpu.train.common import TrainState, make_optimizer
    from mingraph_unet_tpu.train.end_to_end import (
        build_mingraph_unet, make_e2e_train_step,
    )

    import dataclasses

    cfg = PipelineConfig()
    cfg.preprocessing = dataclasses.replace(cfg.preprocessing, resize_dim=(size, size))
    cfg.training = dataclasses.replace(cfg.training, batch_size=batch, bf16=True)

    model = build_mingraph_unet(cfg)
    tx, _ = make_optimizer(cfg.training, steps_per_epoch=100)
    train_step = make_e2e_train_step(model, tx, cfg, augment=True, train_detection=True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8))
    masks = jnp.asarray(
        (rng.uniform(size=(batch, size, size)) < 0.07).astype(np.uint8)
    )
    key = jax.random.key(0)

    sample = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), sample)
    state = TrainState.create(variables, tx)

    from functools import partial

    @partial(jax.jit, static_argnames=("length",))
    def loop(state, images, masks, key, length):
        def body(carry, _):
            new_state, aux = train_step(carry, images, masks, key)
            return new_state, None

        final, _ = jax.lax.scan(body, state, None, length=length)
        return final.step, jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum().astype(jnp.float32), final.params, jnp.float32(0)
        )

    def timed(length):
        t0 = time.perf_counter()
        s, chk = loop(state, images, masks, key, length=length)
        s, chk = int(s), float(chk)
        compile_t = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            s, chk = loop(state, images, masks, key, length=length)
            int(s), float(chk)
            best = min(best, time.perf_counter() - t0)
        return best, compile_t

    t_short, compile_short = timed(iters)
    t_long, compile_long = timed(3 * iters)
    ms = (t_long - t_short) / (2 * iters) * 1e3

    # Per-component breakdown from a device trace of the long loop
    # (VERDICT r4 #4): components are attributed by HLO source file, so
    # fwd+bwd conv work lands in "unet", the in-step CC instancing in
    # "cc_instancing", loss math in "losses", optimizer update in
    # "optimizer", augmentation in "preprocess". Sums to device_total;
    # dispatch_gap = wall step - device busy.
    stage_ms = None
    try:
        import shutil
        import tempfile

        from mingraph_unet_tpu.utils.profiling import (
            attribute_stages,
            parse_device_trace,
        )

        trace_dir = tempfile.mkdtemp(prefix="mgu_bench_train_trace_")
        try:
            with jax.profiler.trace(trace_dir):
                s, chk = loop(state, images, masks, key, length=3 * iters)
                int(s), float(chk)
            rows = parse_device_trace(trace_dir, 3 * iters)
        finally:
            shutil.rmtree(trace_dir, ignore_errors=True)
        if rows:
            stage_ms = attribute_stages(rows, [
                ("unet", ("models/unet.py", "pallas/psconv.py",
                          "pallas/wconv.py", "pallas/pool.py",
                          "ops/s2d.py")),
                ("cc_instancing", ("ops/cc.py",)),
                ("losses", ("models/losses.py", "models/detection.py")),
                ("graph_fusion", ("models/gat.py", "models/mincut.py",
                                  "models/fusion.py", "ops/segment.py",
                                  "ops/patches.py", "models/pipeline.py")),
                ("preprocess", ("data/dataset.py", "ops/image.py",
                                "ops/filters.py")),
                ("optimizer", ("optax", "train/common.py")),
            ])
            stage_ms["device_total"] = round(sum(stage_ms.values()), 3)
            stage_ms["dispatch_gap"] = round(ms - stage_ms["device_total"], 3)
    except Exception as e:  # pragma: no cover - trace capture is best-effort
        print(f"[bench_train] trace breakdown failed: {e}", file=sys.stderr)

    return {
        "size": size,
        "batch": batch,
        "mode": os.environ.get("MG_PSCONV_TRAIN", "off"),
        "ms_per_step": ms,
        "images_per_s": batch / (ms / 1e3),
        "compile_s": compile_short + compile_long,
        "platform": jax.devices()[0].platform,
        "stage_ms": stage_ms,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--one", nargs=2, type=int, metavar=("SIZE", "BATCH"),
                    help="measure one arm in-process and print its JSON line")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes (64², b2) to check the harness itself")
    ap.add_argument("--timeout", type=float, default=2400.0)
    args = ap.parse_args()

    if args.smoke:
        global CONFIGS
        CONFIGS = ((64, 2),)

    if args.one:
        row = measure_one(args.one[0], args.one[1], cpu=args.cpu,
                          iters=2 if args.smoke else 8,
                          reps=1 if args.smoke else 3)
        print(json.dumps(row))
        return

    rows = []
    for size, batch in CONFIGS:
        for mode in ARMS:
            env = dict(os.environ, MG_PSCONV_TRAIN=mode)
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--one", str(size), str(batch)]
            if args.cpu:
                cmd.append("--cpu")
            if args.smoke:
                cmd.append("--smoke")
            print(f"[bench_train] {size}² b{batch} MG_PSCONV_TRAIN={mode} ...",
                  flush=True)
            try:
                proc = subprocess.run(cmd, env=env, text=True,
                                      capture_output=True, timeout=args.timeout)
            except subprocess.TimeoutExpired:
                rows.append({"size": size, "batch": batch, "mode": mode,
                             "error": f"timeout {args.timeout:.0f}s"})
                continue
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("{")), None)
            if proc.returncode != 0 or line is None:
                tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
                rows.append({"size": size, "batch": batch, "mode": mode,
                             "error": " | ".join(tail)})
            else:
                rows.append(json.loads(line))
            print(f"[bench_train]   -> {json.dumps(rows[-1])}", flush=True)

    os.makedirs(os.path.join(REPO, "outputs"), exist_ok=True)
    out = os.path.join(REPO, "outputs", "bench_train.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)

    print(f"\n[bench_train] {'config':>10} | {'off (XLA) ms':>14} | "
          f"{'on (psconv) ms':>16} | speedup")
    by = {(r.get("size"), r.get("batch"), r.get("mode")): r for r in rows}
    for size, batch in CONFIGS:
        a = by.get((size, batch, "off"), {})
        b = by.get((size, batch, "on"), {})
        if "ms_per_step" in a and "ms_per_step" in b:
            print(f"[bench_train] {size}² b{batch:>3} | {a['ms_per_step']:>14.2f} | "
                  f"{b['ms_per_step']:>16.2f} | "
                  f"{a['ms_per_step'] / b['ms_per_step']:.3f}×")
        else:
            print(f"[bench_train] {size}² b{batch:>3} | "
                  f"{a.get('error', '?')} | {b.get('error', '?')} |")
    print(f"[bench_train] wrote {out}")


if __name__ == "__main__":
    main()
