"""Shared utilities: structured logging, profiling hooks, PRNG helpers."""

from mingraph_unet_tpu.utils.logging import MetricsLogger  # noqa: F401
from mingraph_unet_tpu.utils.profiling import step_timer, trace_if  # noqa: F401
