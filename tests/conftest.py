"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes (SURVEY.md §4: multi-chip
testing without a pod).

Real-device lane (round-2 verdict item 6): ``GPZOO_TPU_TESTS=1 pytest -m
tpu`` leaves the backend alone (real TPU, float32, platform-default
precision) and runs only the ``tpu``-marked tests — Mosaic-compiled
Pallas verification + one smoke step of each production fast loss on
device (tests/test_tpu_device.py). The default CPU lane excludes them
via addopts ``-m "not tpu"`` (pyproject.toml)."""

import os

TPU_LANE = os.environ.get("GPZOO_TPU_TESTS") == "1"

if not TPU_LANE:
    # Env-var JAX_PLATFORMS is overridden by the environment's site
    # config; jax.config.update below is the authoritative switch.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    # The parity harness checks against the float64 torch reference at
    # 1e-5 (BASELINE.json); tests run in x64. The TPU path is float32 —
    # bench.py, __graft_entry__.py and the tpu lane exercise that
    # configuration.
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
