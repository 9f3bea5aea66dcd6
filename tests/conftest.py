"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver environment boots an `axon` TPU-tunnel backend from
sitecustomize.py and force-selects it via jax.config (overriding
JAX_PLATFORMS), so tests must re-force CPU through jax.config *after* jax
imports but before any backend is used. Virtual devices come from
--xla_force_host_platform_device_count (the standard JAX fake-cluster
technique; the reference has no tests at all — SURVEY §4).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("QCE_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
# The reference is float64 end-to-end; CPU parity tests need f64 available
# (framework code is dtype-polymorphic, complex64 by default on TPU).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_cache():
    """Drop jit/compilation caches at module boundaries: a single full-suite
    process otherwise accumulates ~300 compiled CPU programs and XLA's
    compiler segfaults near the end of the run (reproduced twice at
    tests/test_vae.py with 128 GB free RAM — compiler-state exhaustion, not
    OOM; either half of the suite passes). Costs per-module recompiles of
    shared fixtures, keeps the one-process `pytest tests/` invocation
    reliable."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
