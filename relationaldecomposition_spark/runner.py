"""Execution harness (B18): concurrent decomposition jobs with LRU result
cache + cancellation, and a timeout wrapper for mining runs.

Re-expresses the reference's harness Spark-first:
- `entropy/NewSmallDBInMemory.java:61-178,295-352` — worker threads each
  owning an in-memory SQLite copy, a BlockingQueue of cluster-set jobs, an
  access-ordered LRU statusMap (cache 100), PENDING/RUNNING/FINISHED/
  FAILED/CANCELED lifecycle, cancelJob interrupting the running statement.
  Here: a ThreadPoolExecutor submits Spark jobs against the one shared
  (cached) base DataFrame; each job runs under a Spark *job group* so
  cancellation maps to ``sc.cancelJobGroup`` (interrupt-on-cancel), and the
  LRU lives in the driver.
- `Main.java:70-147` + `search/MinimalJDGenerator.java:991-1033` — per-run
  FutureTask + timeout with a cooperative global STOP flag. Here:
  ``TimeoutRunner`` wraps any callable, hands it a stop-flag callable
  (JDMiner and the searches poll it), and cancels the job group on timeout.

Scale notes: concurrency across *jobs* (not within) is the right unit on a
shared cluster — the FAIR scheduler pool keeps one giant decomposition from
starving the small ones. Each worker thread only coordinates; all heavy
lifting stays on executors.
"""

from __future__ import annotations

import enum
import threading
import uuid
from collections import OrderedDict
from collections.abc import Callable
from concurrent.futures import Future, ThreadPoolExecutor, TimeoutError as FutureTimeout
from dataclasses import dataclass, field

from .engine.decompose import DecompositionInfo, DecompositionValidator


class JobStatus(enum.Enum):
    PENDING = "PENDING"
    RUNNING = "RUNNING"
    FINISHED = "FINISHED"
    FAILED = "FAILED"
    CANCELED = "CANCELED"


class CanceledJobError(RuntimeError):
    pass


@dataclass
class DecompositionJob:
    key: frozenset
    status: JobStatus = JobStatus.PENDING
    info: DecompositionInfo | None = None
    error: BaseException | None = None
    group_id: str = field(default_factory=lambda: f"decomp-{uuid.uuid4().hex[:12]}")
    future: Future | None = None


class DecompositionService:
    """Concurrent spurious-tuple validation with an LRU result cache keyed
    by the (frozen) cluster set — submitJob/submitJobSynchronous/cancelJob
    of NewSmallDBInMemory, on Spark."""

    def __init__(self, validator: DecompositionValidator,
                 max_workers: int = 4, cache_size: int = 100):
        if max_workers < 1 or cache_size < 1:
            raise ValueError("max_workers and cache_size must be >= 1")
        self.validator = validator
        self.spark = validator.base.sparkSession
        self.cache_size = cache_size
        self._jobs: OrderedDict[frozenset, DecompositionJob] = OrderedDict()
        self._lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=max_workers,
                                        thread_name_prefix="decomp")
        self.compute_count = 0  # instrumentation: actual (non-cached) runs

    @staticmethod
    def _key(clusters) -> frozenset:
        return frozenset(frozenset(c) for c in clusters)

    def submit(self, clusters) -> DecompositionJob:
        """Queue (or return the cached/running job for) a cluster set."""
        key = self._key(clusters)
        with self._lock:
            job = self._jobs.get(key)
            # CANCELED and FAILED both resubmit: a transient Spark failure
            # must not poison the cache for this cluster set
            if job is not None and job.status not in (JobStatus.CANCELED,
                                                      JobStatus.FAILED):
                self._jobs.move_to_end(key)  # LRU touch
                return job
            job = DecompositionJob(key)
            self._jobs[key] = job
            self._jobs.move_to_end(key)
            if len(self._jobs) > self.cache_size:
                # evict oldest finished entries, skipping live jobs: a
                # long-running job at the LRU head must not pin every
                # younger finished entry in the cache
                evictable = [k for k, j in self._jobs.items()
                             if j.status not in (JobStatus.PENDING,
                                                 JobStatus.RUNNING)]
                for k in evictable[:len(self._jobs) - self.cache_size]:
                    del self._jobs[k]
            job.future = self._pool.submit(self._run, job)
        return job

    def _run(self, job: DecompositionJob) -> None:
        with self._lock:
            if job.status is JobStatus.CANCELED:
                return
            job.status = JobStatus.RUNNING
        sc = self.spark.sparkContext
        sc.setJobGroup(job.group_id, f"decomposition {sorted(map(sorted, job.key))}",
                       interruptOnCancel=True)
        try:
            self.compute_count += 1
            info = self.validator.process_decomposition(
                list(job.key),
                should_stop=lambda: job.status is JobStatus.CANCELED)
            with self._lock:
                if job.status is not JobStatus.CANCELED:
                    job.info = info
                    job.status = JobStatus.FINISHED
        except BaseException as e:  # noqa: BLE001 - job boundary
            with self._lock:
                if job.status is not JobStatus.CANCELED:
                    job.error = e
                    job.status = JobStatus.FAILED
        finally:
            sc.setJobGroup(None, None)

    def submit_sync(self, clusters, timeout: float | None = None) -> DecompositionInfo:
        job = self.submit(clusters)
        try:
            job.future.result(timeout=timeout)
        except FutureTimeout:
            self.cancel(clusters)
            raise
        if job.status is JobStatus.FINISHED:
            return job.info
        if job.status is JobStatus.CANCELED:
            raise CanceledJobError(f"job canceled: {sorted(map(sorted, job.key))}")
        raise job.error

    def cancel(self, clusters) -> bool:
        """Cancel a pending/running job: flips status and kills its Spark
        job group (running stages interrupt)."""
        key = self._key(clusters)
        with self._lock:
            job = self._jobs.get(key)
            if job is None or job.status not in (JobStatus.PENDING, JobStatus.RUNNING):
                return False
            job.status = JobStatus.CANCELED
        self.spark.sparkContext.cancelJobGroup(job.group_id)
        return True

    def status(self, clusters) -> JobStatus | None:
        job = self._jobs.get(self._key(clusters))
        return job.status if job else None

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)


class TimeoutRunner:
    """Per-run timeout + cooperative-stop harness (Main.java:101-121).

    ``run(fn, timeout)`` executes ``fn(stop_flag)`` in a worker thread; on
    timeout the stop flag flips (search loops poll it, mirroring the
    reference's global STOP) and the run's Spark job group is cancelled so
    in-flight stages die too. Partial results are whatever ``fn`` returned
    into its own structures before stopping.
    """

    def __init__(self, spark):
        self.spark = spark

    def run(self, fn: Callable[[Callable[[], bool]], object],
            timeout: float) -> object:
        stop = threading.Event()
        group = f"timed-{uuid.uuid4().hex[:12]}"
        sc = self.spark.sparkContext

        def target():
            sc.setJobGroup(group, "timed run", interruptOnCancel=True)
            try:
                return fn(stop.is_set)
            finally:
                sc.setJobGroup(None, None)

        # no context manager: ThreadPoolExecutor.__exit__ would join the
        # worker (shutdown(wait=True)) and delay the TimeoutError until the
        # stalled fn actually finishes
        pool = ThreadPoolExecutor(max_workers=1)
        fut = pool.submit(target)
        try:
            result = fut.result(timeout=timeout)
            pool.shutdown(wait=True)
            return result
        except FutureTimeout:
            stop.set()
            sc.cancelJobGroup(group)
            pool.shutdown(wait=False)
            raise TimeoutError(
                f"run exceeded {timeout}s (job group {group} cancelled)") from None
