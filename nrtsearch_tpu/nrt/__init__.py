"""NRT segment replication: primary publishes immutable segment files,
replicas copy and hot-swap searchers.

Reference: server/nrt/ (NRTPrimaryNode, NRTReplicaNode, NrtDataManager,
copy jobs) — SURVEY.md §2.6 and §3.4. The TPU re-expression: a "searcher
swap" is an atomic pointer swap onto a new list of device-resident segments;
file copy ships the packed-array files from core/directory.py.
"""

from nrtsearch_tpu.nrt.point_state import NrtPointState

__all__ = ["NrtPointState"]
