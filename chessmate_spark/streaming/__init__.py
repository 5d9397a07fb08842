from .jobs import JobsState, claim_batch, drain_jobs, prune_stale_jobs

__all__ = ["JobsState", "claim_batch", "drain_jobs", "prune_stale_jobs"]
