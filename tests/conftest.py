"""Test harness config: run JAX on CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding tests use
`xla_force_host_platform_device_count=8` per SURVEY.md §4 item 4.

NOTE: some pytest plugins import jax before this conftest runs, so setting
JAX_PLATFORMS via os.environ alone is NOT reliable (jax snapshots it at
import).  We also force the config explicitly and verify the backend —
otherwise tests silently run over the slow remote-TPU tunnel.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
