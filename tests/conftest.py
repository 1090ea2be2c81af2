"""Test configuration: force an 8-virtual-device CPU platform.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(nrtsearch_tpu.parallel) are exercised without TPU hardware, per the driver's
dryrun contract. Must run before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_device_mesh():
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices()).reshape(4, 2)
    return Mesh(devs, ("shard", "data"))
