"""Driver-contract guards: entry() shape-checks and stays jittable, and
dryrun_multichip() self-configures exactly the way the driver invokes it."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest


def test_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    logits, bboxes, conf, l_part = out
    assert logits.shape == (2, 128, 128, 2)
    assert bboxes.shape == (2, 4)
    assert conf.shape == (2, 1)
    assert l_part.shape == (2,)


def test_dryrun_parent_never_initializes_jax(monkeypatch):
    """Outage-proofing contract (VERDICT r3 #1): in the driver's process,
    dryrun_multichip must route to the CPU subprocess WITHOUT initializing
    any JAX backend — a wedged axon relay turns backend init into a
    ~30-minute hang (MULTICHIP_r03.json rc=124)."""
    import __graft_entry__ as g

    monkeypatch.delenv("_MGU_DRYRUN_CHILD", raising=False)
    calls = []
    monkeypatch.setattr(g, "_dryrun_in_subprocess", lambda n: calls.append(n))
    g.dryrun_multichip(8)
    assert calls == [8]

    env = g._child_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["_MGU_DRYRUN_CHILD"] == "1"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    # Pre-existing device-count flags must be replaced, not accumulated.
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=2 --foo")
    env = g._child_env(8)
    assert env["XLA_FLAGS"].count("host_platform_device_count") == 1
    assert "--foo" in env["XLA_FLAGS"]


@pytest.mark.slow
def test_dryrun_multichip_driver_shaped():
    """The exact driver invocation: fresh process, NO virtual-device env —
    dryrun_multichip must self-configure (round-1 failure mode,
    MULTICHIP_r01.json rc=1). Relay-independent since round 4: the parent
    never imports jax, so a wedged TPU tunnel cannot hang this test."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Simulate the driver environment: no pre-set virtual devices, possibly
    # a forced non-CPU platform from the host sitecustomize.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("_MGU_DRYRUN_CHILD", None)
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo,
        env=env,
        text=True,
        capture_output=True,
        timeout=700,  # internal child deadline is 600s; normal runtime ~135s
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "one sharded e2e step OK" in proc.stdout
