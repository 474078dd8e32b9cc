"""Profiling / tracing hooks (absent from the reference; SURVEY §5).

Thin wrappers around ``jax.profiler`` plus a wall-clock step timer. Traces are
viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace_if", "step_timer", "StepTimer", "parse_device_trace",
           "attribute_stages"]


@contextlib.contextmanager
def trace_if(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``trace_dir`` if it is non-None."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StepTimer:
    """Rolling wall-clock step timer (blocks on device completion)."""

    def __init__(self):
        self._t0 = None
        self.last_ms = float("nan")

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, *sync_arrays) -> float:
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.last_ms = (time.perf_counter() - self._t0) * 1e3
        return self.last_ms


@contextlib.contextmanager
def step_timer() -> Iterator[StepTimer]:
    t = StepTimer()
    t.start()
    yield t


def parse_device_trace(trace_dir: str, steps: int):
    """Parse the newest Chrome-trace export under ``trace_dir`` and return
    per-XLA-op rows ``{op, us_per_step, category, source, long_name}``.

    Device-side "XLA Ops" threads only; the ``while``-loop wrapper event is
    skipped (it double-counts its body). No tensorboard_plugin_profile
    dependency — the trace.json.gz is parsed directly.
    """
    import collections
    import glob as _glob
    import gzip
    import json as _json
    import os as _os

    paths = _glob.glob(
        _os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        return []
    path = max(paths, key=_os.path.getmtime)
    with gzip.open(path) as f:
        tr = _json.load(f)
    ev = tr["traceEvents"]
    dev_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    op_tids = {
        (e["pid"], e["tid"])
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e["pid"] in dev_pids
        and e["args"].get("name") == "XLA Ops"
    }
    agg = collections.Counter()
    meta = {}
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        if e["name"].startswith("while"):
            continue
        agg[e["name"]] += e.get("dur", 0)
        meta.setdefault(e["name"], e.get("args", {}))
    rows = []
    for n, d in agg.most_common():
        a = meta[n]
        rows.append({
            "op": n,
            "us_per_step": d / steps,
            "category": a.get("hlo_category", ""),
            "source": str(a.get("source", "")),
            "long_name": a.get("long_name", ""),
        })
    return rows


def attribute_stages(rows, stage_rules, default: str = "other"):
    """Fold per-op rows into per-stage ms/step by source-file substring.

    ``stage_rules`` is an ordered list of ``(stage_name, (substr, ...))``;
    the first rule whose substring appears in the op's source attribution
    wins. Fused ops carry ONE source line, so attribution is approximate at
    fusion boundaries — but the stage sums equal the device total by
    construction (every op lands somewhere).
    """
    out = {}
    for r in rows:
        src = r["source"]
        stage = default
        for name, subs in stage_rules:
            if any(s in src for s in subs):
                stage = name
                break
        out[stage] = out.get(stage, 0.0) + r["us_per_step"] / 1e3
    return {k: round(v, 3) for k, v in out.items()}
