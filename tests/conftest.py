"""Test harness configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding code
paths (jax.sharding.Mesh / shard_map) are exercised without TPU hardware,
as the driver does for dryrun_multichip. Set PGV_TEST_PLATFORM=tpu to run
against real hardware instead.
"""

import os

if os.environ.get("PGV_TEST_PLATFORM", "cpu") == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The environment's TPU plugin (axon) re-registers itself via
    # sitecustomize and overrides JAX_PLATFORMS through jax.config, so
    # force the config back to an 8-device CPU mesh here, before any
    # backend initialization.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
