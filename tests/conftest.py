"""Test configuration: force an 8-virtual-device CPU platform.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(nrtsearch_tpu.parallel) are exercised without TPU hardware, per the driver's
dryrun contract. The axon TPU plugin prepends itself to jax_platforms, so the
env var alone is not enough — we override the config before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_device_mesh():
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices()).reshape(4, 2)
    return Mesh(devs, ("shard", "data"))
