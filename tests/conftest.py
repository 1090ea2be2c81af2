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


@pytest.fixture(autouse=True, scope="module")
def _stop_leaked_server_threads():
    """Stop refresh-ticker / poller / batcher threads leaked by module-level
    server fixtures. Many tests cache Handlers/GlobalState objects without
    stopping them; hundreds of lingering ticker threads kept firing
    refresh() on stale runtimes for the rest of the run, destabilizing the
    process (observed intermittent SIGSEGV around the 70% mark)."""
    yield
    try:
        from nrtsearch_tpu.server import batcher as _bt
        from nrtsearch_tpu.server import index_runtime as _ir

        for rt in list(_ir._LIVE_RUNTIMES):
            try:
                rt.stop()
            except Exception:
                pass
        for b in list(_bt._LIVE_BATCHERS):
            try:
                b.stop()
            except Exception:
                pass
    except Exception:
        pass
