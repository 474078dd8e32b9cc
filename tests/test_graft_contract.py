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


@pytest.mark.slow
def test_dryrun_multichip_driver_shaped():
    """The exact driver invocation: fresh process, NO virtual-device env —
    dryrun_multichip must self-configure (round-1 failure mode,
    MULTICHIP_r01.json rc=1)."""
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
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "one sharded e2e step OK" in proc.stdout
