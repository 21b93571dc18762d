"""Job-claiming, worker-pool, and progress infra
(reference ``netdissect/{pidfile,workerpool,progress}.py``)."""

import multiprocessing
import os
import time
from pathlib import Path

import pytest

from ganspace_tpu.utils import jobs
from ganspace_tpu.utils.workerpool import WorkerBase, WorkerPool
from ganspace_tpu.utils.progress import (
    default_progress, post_progress, verbose_progress,
)


def test_claim_and_done(tmp_path):
    d = tmp_path / "job1"
    assert jobs.claim_job(d)
    # second claim from the same live pid is refused (lock exists, not stale)
    assert not jobs.claim_job(d)
    jobs.mark_job_done(d, "finished")
    assert jobs.job_done(d)
    assert not jobs.claim_job(d)          # done jobs can't be claimed
    assert (d / jobs.DONE_NAME).read_text().startswith("finished")
    assert not (d / jobs.LOCK_NAME).exists()


def test_stale_lock_broken(tmp_path):
    d = tmp_path / "job2"
    d.mkdir()
    # forge a lock from a dead pid on this host
    import socket
    (d / jobs.LOCK_NAME).write_text(f"{socket.gethostname()} 999999999\n")
    assert jobs.claim_job(d)
    jobs.release_job(d)


def test_foreign_host_lock_respected(tmp_path):
    d = tmp_path / "job3"
    d.mkdir()
    (d / jobs.LOCK_NAME).write_text("some-other-host 1\n")
    assert not jobs.claim_job(d)


def test_pending_jobs(tmp_path):
    ds = [tmp_path / f"j{i}" for i in range(3)]
    for d in ds:
        d.mkdir()
    jobs.mark_job_done(ds[0])
    assert jobs.claim_job(ds[1])
    pend = jobs.pending_jobs(ds)
    assert pend == [ds[2]]
    jobs.release_job(ds[1])


class _SquareWorker(WorkerBase):
    def __init__(self, i, process_count, queue, inline, outdir=None):
        self.outdir = Path(outdir)
        super().__init__(i, process_count, queue, inline)

    def work(self, x):
        (self.outdir / f"{x}.txt").write_text(str(x * x))


@pytest.mark.parametrize("nproc", [0, 2])
def test_workerpool(tmp_path, nproc):
    pool = WorkerPool(_SquareWorker, process_count=nproc, outdir=tmp_path)
    for x in range(8):
        pool.add(x)
    pool.join()
    for x in range(8):
        assert (tmp_path / f"{x}.txt").read_text() == str(x * x)


def test_progress_passthrough():
    verbose_progress(False)
    items = list(default_progress()(range(5)))
    assert items == [0, 1, 2, 3, 4]
    post_progress(loss=1.0)           # no-op, must not raise
    verbose_progress(True)
    items = list(default_progress()(range(5), desc="t"))
    assert items == [0, 1, 2, 3, 4]
    verbose_progress(False)
