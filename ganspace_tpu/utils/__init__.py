from ganspace_tpu.utils.imaging import pad_frames, prettify_name, to_uint8
from ganspace_tpu.utils.jobs import (
    claim_job, exit_if_job_done, job_done, mark_job_done, pending_jobs,
    release_job,
)
from ganspace_tpu.utils.progress import (
    default_progress, desc_progress, post_progress, print_progress,
    verbose_progress,
)
from ganspace_tpu.utils.downloads import (
    DownloadUnavailable, download_ckpt, download_google_drive, download_url,
)
from ganspace_tpu.utils.statedict import (
    flatten_tree, load_state_dict, numpy_state_dict, save_state_dict,
    unflatten_tree,
)
from ganspace_tpu.utils.workerpool import WorkerBase, WorkerPool

__all__ = [
    "pad_frames", "prettify_name", "to_uint8",
    "claim_job", "exit_if_job_done", "job_done", "mark_job_done",
    "pending_jobs", "release_job",
    "default_progress", "desc_progress", "post_progress", "print_progress",
    "verbose_progress", "WorkerBase", "WorkerPool",
    "DownloadUnavailable", "download_ckpt", "download_google_drive",
    "download_url", "flatten_tree", "unflatten_tree", "save_state_dict",
    "load_state_dict", "numpy_state_dict",
]
