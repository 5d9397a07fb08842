from .jobs import JobsState, claim_batch, drain_jobs, prune_stale_jobs
from .snapshots import SnapshotInfo, SnapshotManager

__all__ = [
    "JobsState",
    "claim_batch",
    "drain_jobs",
    "prune_stale_jobs",
    "SnapshotInfo",
    "SnapshotManager",
]
