"""Test configuration: run everything on a virtual 8-device CPU mesh.

Set platform env vars BEFORE jax is imported anywhere so sharding logic is
testable without TPU hardware (the fake-backend mechanism the reference lacks;
SURVEY.md §4).
"""

import os

# Escape hatch for the on-hardware kernel parity tests
# (tests/test_tpu_kernels.py): NERF_TPU_TESTS_ON_TPU=1 keeps the real TPU
# backend. Run ONLY that file under it — the rest of the suite expects the
# 8-device CPU mesh (and a TPU run would serialize on the single chip claim).
_ON_TPU = os.environ.get("NERF_TPU_TESTS_ON_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize programmatically sets
# jax_platforms="axon,cpu", which overrides the env var — force CPU back
# explicitly before any backend initializes.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not _ON_TPU:
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
