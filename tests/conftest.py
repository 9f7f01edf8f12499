"""Test configuration: run the suite on a virtual 8-device CPU mesh.

TPU hardware is exercised by bench.py and __graft_entry__.py; unit tests run
on CPU with ``xla_force_host_platform_device_count=8`` so sharding/collective
code paths (shard_map / pjit over a Mesh) are validated without a pod slice.

NOTE: this environment pre-registers a remote TPU backend via sitecustomize
(jax is already imported when conftest runs), so plain env vars are too late —
the platform must be forced through ``jax.config``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
