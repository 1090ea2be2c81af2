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
# The persistent compilation cache is DISABLED for tests: on the 1-core
# Xeon rig XLA:CPU segfaults inside backend_compile_and_load after several
# hundred in-process compilations (deterministically around
# test_maxscore.py::test_escalation_on_window_overflow, both with the cache
# writing and with it off — the crash is in LLVM JIT codegen state, not the
# cache). Mitigations: no persistent cache (removes one crash surface) plus
# per-module jax.clear_caches() below (bounds live-executable accumulation).
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

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
    # Bound in-process compiled-executable accumulation: the 1-core rig's
    # XLA:CPU crashes in backend_compile_and_load after ~hundreds of live
    # jitted programs (see header comment). Each module recompiles its own
    # programs anyway; dropping the previous module's keeps the LLVM JIT
    # footprint flat across the 60+ module suite.
    try:
        jax.clear_caches()
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 #10): the full suite is the gate; the fast tier
# (-m "not slow") keeps the edit loop under ~3 minutes by excluding the
# module-scope server/replication/matrix suites that dominate wall time.
# Membership is by module, from measured --durations on the CPU rig.
# ---------------------------------------------------------------------------

# From the measured --durations=60 of the full run (pytest_r4_full2):
# these modules each contribute >=15s of wall time on the 1-core CPU rig
# (kernel parity sweeps, module-scope gRPC servers, soak-style matrices).
SLOW_MODULES = {
    "test_maxscore",
    "test_dense_head",
    "test_dense_merge",
    "test_dense_server_path",
    "test_distributed",
    "test_bucket_retrieval",
    "test_cutoffs",
    "test_packed_view",
    "test_kernel_reductions",
    "test_batcher",
    "test_concurrent_stress",
    "test_collector_matrix",
    "test_multi_sort",
    "test_replication_concurrent_load",
    "test_virtual_shards_server",
    "test_cross_index",
    "test_fast_path",
    "test_merge_scoring",
    "test_property_matrix",
    "test_wire_compat",
    "test_cli_matrix",
    "test_remote_contract",
    "test_verdict_r4_fixes",
    "test_tools",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(_pytest.mark.slow)
