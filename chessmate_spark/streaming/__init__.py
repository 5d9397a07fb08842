from .jobs import JobsState, claim_batch, drain_jobs, prune_stale_jobs
from .sessions import sessionize_batch, sessionize_stream
from .snapshots import SnapshotInfo, SnapshotManager

__all__ = [
    "JobsState",
    "claim_batch",
    "drain_jobs",
    "prune_stale_jobs",
    "sessionize_batch",
    "sessionize_stream",
    "SnapshotInfo",
    "SnapshotManager",
]
