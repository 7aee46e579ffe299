"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes (SURVEY.md §4: multi-chip
testing without a pod)."""

import os

# Env-var JAX_PLATFORMS is overridden by the environment's site config;
# jax.config.update below is the authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# The parity harness checks against the float64 torch reference at 1e-5
# (BASELINE.json); tests run in x64. The TPU path is float32 — bench.py and
# __graft_entry__.py exercise that configuration.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
