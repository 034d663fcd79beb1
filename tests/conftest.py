"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of the reference's ddp_sim debugging config
(configs/trainer/ddp_sim.yaml — DDP spawned on CPU): multi-device sharding
paths are exercised without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
