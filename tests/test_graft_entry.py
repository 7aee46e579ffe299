"""Driver-contract tests for __graft_entry__.

The driver imports the module on a host with ONE real chip and calls
``dryrun_multichip(8)`` with no env pre-set — the function must self-host
its 8 virtual devices (VERDICT.md round-1 item 1). These tests reproduce
that invocation in a fresh subprocess (the in-process conftest already
forces 8 CPU devices, which would mask the failure mode)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_fresh(code, extra_env=None, timeout=900):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # Keep the test off the real TPU, but do NOT force a device count —
    # a single CPU device is exactly the driver's "1 real chip" shape.
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_multichip_self_hosts_from_one_device():
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) < 8, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = _run_fresh(code)
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip ok" in proc.stdout
    assert "'factor': 2" in proc.stdout  # the 2-D DP+TP mesh really ran


def test_dryrun_child_guard():
    """The recursion guard: a child that STILL can't see n devices must
    raise instead of forking forever."""
    import __graft_entry__ as g

    before = os.environ.get(g._CHILD_ENV_FLAG)
    os.environ[g._CHILD_ENV_FLAG] = "1"
    try:
        with pytest.raises(RuntimeError, match="self-hosted child"):
            g.dryrun_multichip(512)  # far more than the 8 CPU devices
    finally:
        if before is None:
            os.environ.pop(g._CHILD_ENV_FLAG, None)
        else:
            os.environ[g._CHILD_ENV_FLAG] = before
