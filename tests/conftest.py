"""Test config: force an 8-virtual-device CPU platform.

jax is pre-imported at interpreter start in this environment (sitecustomize
registers the axon TPU backend), so env vars set here would be too late for
import — but backend *selection* is lazy, so jax.config.update + XLA_FLAGS
still take effect as long as no device has been touched yet.

The 8-device CPU mesh is the TPU-native substitute for multi-node testing
(SURVEY.md §4): sharding/collective code paths run exactly as on a v5e-8.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
