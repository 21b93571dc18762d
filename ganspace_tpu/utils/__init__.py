from ganspace_tpu.utils.imaging import pad_frames, prettify_name, to_uint8
from ganspace_tpu.utils.jobs import (
    claim_job, exit_if_job_done, job_done, mark_job_done, pending_jobs,
    release_job,
)
from ganspace_tpu.utils.progress import (
    default_progress, desc_progress, post_progress, print_progress,
    verbose_progress,
)
from ganspace_tpu.utils.workerpool import WorkerBase, WorkerPool

__all__ = [
    "pad_frames", "prettify_name", "to_uint8",
    "claim_job", "exit_if_job_done", "job_done", "mark_job_done",
    "pending_jobs", "release_job",
    "default_progress", "desc_progress", "post_progress", "print_progress",
    "verbose_progress", "WorkerBase", "WorkerPool",
]
