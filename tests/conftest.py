"""Test configuration: force an 8-device virtual CPU platform.

Multi-device collective behavior (data-parallel contrastive gather, sharded
train steps) is exercised on a virtual CPU mesh, per SURVEY.md §4's
"implication for the TPU build". Must run before JAX creates any backend.

Note: the ambient environment may point JAX at a real TPU via an
experimental PJRT plugin (JAX_PLATFORMS=axon) that ignores the env override,
so we force the platform through jax.config instead.
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

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
