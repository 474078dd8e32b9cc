"""Host/runtime environment setup for CLI entry points.

Centralizes two things every script wants:

- A persistent XLA compilation cache (first compiles are expensive —
  especially on the single-core dev hosts and on TPU where the initial
  compile is 20-40s; cached afterwards).
- Backend selection: this machine force-sets ``JAX_PLATFORMS=axon`` via
  sitecustomize; ``force_cpu=True`` overrides it *before* jax initializes.
"""

from __future__ import annotations

import os

__all__ = ["setup_host"]


def setup_host(force_cpu: bool = False, cache_dir: str = "~/.cache/mingraph_unet_tpu/xla") -> None:
    cache = os.path.expanduser(cache_dir)
    os.makedirs(cache, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    if force_cpu:
        # Env alone is not enough on hosts whose sitecustomize imports jax at
        # interpreter start (the env default is baked at import time) — the
        # config update is the authoritative switch.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
