"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are exercised on a virtual 8-device CPU mesh
(the TPU-native substitute for distributed tests; SURVEY §4.4). Must run
before the first ``import jax`` anywhere in the test session.
"""

import os
import sys

# NOTE: the environment force-sets JAX_PLATFORMS=axon (TPU tunnel) via a
# sitecustomize that imports jax at interpreter start — so the env var is
# already baked in and only jax.config.update can override the platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Single-core box: persistent compilation cache makes repeated test runs
# tractable (XLA CPU compiles dominate wall-clock otherwise).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

REFERENCE_ROOT = "/root/reference/MinGraph-UNet"

import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="PyTorch reference checkout not available"
)


@pytest.fixture(scope="session")
def reference_path() -> str:
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return REFERENCE_ROOT
