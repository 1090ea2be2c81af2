"""Cluster and index state management.

Reference equivalents: server/state/GlobalState.java:44 (index registry),
server/index/IndexStateManager + ImmutableIndexState (copy-on-write state
snapshots versioned by gen), server/state/backend/ (durable local/remote
state). Concurrency model mirrors the reference: state objects are immutable
snapshots swapped atomically; mutation goes through the manager.
"""

from nrtsearch_tpu.state.index_state import IndexStateInfo
from nrtsearch_tpu.state.backend import LocalStateBackend, StateBackend

__all__ = ["IndexStateInfo", "LocalStateBackend", "StateBackend"]


def __getattr__(name):
    # GlobalState imports server.index_runtime which imports state.index_state;
    # lazy re-export breaks the cycle
    if name == "GlobalState":
        from nrtsearch_tpu.state.global_state import GlobalState

        return GlobalState
    raise AttributeError(name)
