"""In-process job state store, optionally persisted to SQLite.

The reference tracks job state in Redis via tasqueue (states PENDING /
STARTED / FAILURE / SUCCESS / RETRY, reference: internal/core/
core.go:574-599) and stores a single integer result — the written row
count — per job (core.go:436). This store keeps the same state machine
and payloads in-process with atomic check-and-set, fixing the
reference's read-then-enqueue race on single-flight IDs
(core.go:331-339).

Persistence closes the reference's durability story (its Redis broker
survives server restarts, README "Multiple queues, workers and job
distribution"): with ``persist_path`` set, every mutation writes
through to a SQLite file, and a restarted Core recovers terminal job
status and result locations. Jobs caught mid-flight by the crash
(PENDING/STARTED/RETRY) are marked FAILURE on recovery — their worker
threads died with the process, and honest failure beats a forever-
PENDING ghost.
"""

from __future__ import annotations

import json
import sqlite3
import threading
import time
from dataclasses import asdict, dataclass, field

# Job states (core.go:574-580).
PENDING = "PENDING"
STARTED = "STARTED"
FAILURE = "FAILURE"
SUCCESS = "SUCCESS"
RETRY = "RETRY"

_ACTIVE = (PENDING, STARTED, RETRY)
_TERMINAL = (SUCCESS, FAILURE)


@dataclass
class JobRecord:
    job_id: str
    task: str
    queue: str
    state: str = PENDING
    count: int = 0
    error: str = ""
    args: list = field(default_factory=list)
    db: str = ""
    ttl: int = 0
    eta: float | None = None  # unix seconds; run no earlier
    max_retries: int = 0
    attempts: int = 0
    group_id: str = ""
    result_backend: str = ""
    result_path: str = ""
    created_at: float = field(default_factory=time.time)
    finished_at: float | None = None  # set on SUCCESS/FAILURE
    cancelled: bool = False


class SingleFlightError(Exception):
    """Same job_id already Processing/Retrying (core.go:331-339)."""


class JobStore:
    """Thread-safe job/group registry.

    Job IDs are caller-suppliable and *non-unique* across completed
    runs (a re-post of a finished ID overwrites it, like the reference
    re-enqueueing the same ID); only one instance of an ID may be
    active at a time — enforced atomically here.
    """

    def __init__(
        self, persist_path: str | None = None, recover_inflight: bool = True
    ) -> None:
        """``recover_inflight=True`` (the restart flow) marks persisted
        active jobs FAILURE at startup — their workers died with the
        previous process. A SECONDARY process attaching to a live
        store (worker-only sidecar) must pass False: the primary's
        active jobs are still running, and failing them from the
        outside would corrupt its state."""
        self._jobs: dict[str, JobRecord] = {}
        self._groups: dict[str, list[str]] = {}
        self._lock = threading.RLock()
        self._recover_inflight = recover_inflight
        self._db: sqlite3.Connection | None = None
        if persist_path:
            # One shared connection, serialized by self._lock (worker
            # threads all mutate through store methods). Autocommit
            # (isolation_level=None) so the explicit BEGIN IMMEDIATE in
            # create() owns its transaction boundaries.
            self._db = sqlite3.connect(
                persist_path, check_same_thread=False, isolation_level=None
            )
            self._db.execute(
                "CREATE TABLE IF NOT EXISTS jobs (job_id TEXT PRIMARY KEY, data TEXT)"
            )
            self._db.execute(
                "CREATE TABLE IF NOT EXISTS groups (group_id TEXT PRIMARY KEY, job_ids TEXT)"
            )
            self._db.commit()
            self._recover()

    # -- persistence --------------------------------------------------
    def _recover(self) -> None:
        """Load persisted state; fail jobs the crash caught mid-flight."""
        assert self._db is not None
        for (data,) in self._db.execute("SELECT data FROM jobs"):
            rec = JobRecord(**json.loads(data))
            if rec.state in _ACTIVE and self._recover_inflight:
                rec.state = FAILURE
                rec.error = "interrupted by engine restart"
                rec.finished_at = rec.finished_at or time.time()
                self._persist(rec)
            self._jobs[rec.job_id] = rec
        for gid, ids in self._db.execute("SELECT group_id, job_ids FROM groups"):
            self._groups[gid] = json.loads(ids)

    def _persist(self, rec: JobRecord) -> None:
        if self._db is None:
            return
        self._db.execute(
            "INSERT OR REPLACE INTO jobs (job_id, data) VALUES (?, ?)",
            (rec.job_id, json.dumps(asdict(rec))),
        )
        self._db.commit()

    def _persist_group(self, group_id: str, job_ids: list[str]) -> None:
        if self._db is None:
            return
        self._db.execute(
            "INSERT OR REPLACE INTO groups (group_id, job_ids) VALUES (?, ?)",
            (group_id, json.dumps(job_ids)),
        )
        self._db.commit()

    def close(self) -> None:
        with self._lock:
            if self._db is not None:
                self._db.close()
                self._db = None

    # -- jobs ---------------------------------------------------------
    def create(self, rec: JobRecord) -> JobRecord:
        with self._lock:
            existing = self._jobs.get(rec.job_id)
            if existing is not None and existing.state in (STARTED, RETRY, PENDING):
                raise SingleFlightError(
                    f"job {rec.job_id} is already running: {existing.state}"
                )
            if self._db is not None:
                # Cross-process single-flight: another engine process
                # sharing this store file may own an active instance of
                # the ID. BEGIN IMMEDIATE takes the writer lock, so the
                # check-and-insert is atomic against concurrent
                # creators (the reference gets the same guarantee from
                # Redis, core.go:331-339).
                self._db.execute("BEGIN IMMEDIATE")
                try:
                    row = self._db.execute(
                        "SELECT data FROM jobs WHERE job_id = ?", (rec.job_id,)
                    ).fetchone()
                    if row is not None:
                        state = json.loads(row[0]).get("state")
                        # Our own in-memory copy already passed the
                        # active check above (and write-through keeps
                        # it in sync with the DB), so an active DB row
                        # here can only belong to another process.
                        if state in _ACTIVE:
                            raise SingleFlightError(
                                f"job {rec.job_id} is already running "
                                f"in another process: {state}"
                            )
                    self._db.execute(
                        "INSERT OR REPLACE INTO jobs (job_id, data) VALUES (?, ?)",
                        (rec.job_id, json.dumps(asdict(rec))),
                    )
                    self._db.commit()
                except BaseException:
                    self._db.rollback()
                    raise
                self._jobs[rec.job_id] = rec
                return rec
            self._jobs[rec.job_id] = rec
            return rec

    def get(self, job_id: str) -> JobRecord:
        with self._lock:
            try:
                return self._jobs[job_id]
            except KeyError:
                raise KeyError(f"unknown job: {job_id}") from None

    def exists(self, job_id: str) -> bool:
        with self._lock:
            return job_id in self._jobs

    def set_state(
        self,
        job_id: str,
        state: str,
        *,
        count: int | None = None,
        error: str | None = None,
    ) -> None:
        with self._lock:
            rec = self._jobs[job_id]
            rec.state = state
            if state in _TERMINAL:
                rec.finished_at = time.time()
            if count is not None:
                rec.count = count
            if error is not None:
                rec.error = error
            self._persist(rec)

    def touch(self, job_id: str) -> None:
        """Re-persist a record mutated in place (result_path, group_id)."""
        with self._lock:
            rec = self._jobs.get(job_id)
            if rec is not None:
                self._persist(rec)

    def mark_cancelled(self, job_id: str) -> JobRecord:
        with self._lock:
            rec = self.get(job_id)
            rec.cancelled = True
            self._persist(rec)
            return rec

    def delete(self, job_id: str) -> None:
        with self._lock:
            self._jobs.pop(job_id, None)
            if self._db is not None:
                self._db.execute("DELETE FROM jobs WHERE job_id = ?", (job_id,))
                self._db.commit()

    def pending(self, queue: str) -> list[JobRecord]:
        """Pending jobs on a queue, oldest first (core.go:149-162 —
        the reference fetches newest-first then reverses)."""
        with self._lock:
            recs = [
                r
                for r in self._jobs.values()
                if r.queue == queue and r.state == PENDING
            ]
        return sorted(recs, key=lambda r: r.created_at)

    def counts_by_state(self) -> dict[str, int]:
        """Job counts keyed by state (for the /metrics gauges)."""
        with self._lock:
            counts: dict[str, int] = {}
            for rec in self._jobs.values():
                counts[rec.state] = counts.get(rec.state, 0) + 1
            return counts

    def expired(self, now: float) -> list[JobRecord]:
        """Terminal jobs whose results outlived their TTL.

        The reference accepts a per-job ``ttl`` but its SQL backend
        ignores it (core.go:354-357; README: "NOT supported by the
        default SQL DB result backend"). Here TTL is honored: the
        reaper collects these and deletes their result tables.
        ``ttl <= 0`` means keep forever.
        """
        with self._lock:
            return [
                r
                for r in self._jobs.values()
                if r.state in _TERMINAL
                and r.ttl > 0
                and r.result_path
                and r.finished_at is not None
                and r.finished_at + r.ttl <= now
            ]

    # -- groups -------------------------------------------------------
    def create_group(self, group_id: str, job_ids: list[str]) -> None:
        with self._lock:
            self._groups[group_id] = list(job_ids)
            self._persist_group(group_id, list(job_ids))
            for jid in job_ids:  # members' group_id was set in place
                self.touch(jid)

    def group_jobs(self, group_id: str) -> list[str]:
        with self._lock:
            try:
                return list(self._groups[group_id])
            except KeyError:
                raise KeyError(f"unknown group: {group_id}") from None

    def group_state(self, group_id: str) -> str:
        """Aggregate member states (core.go:206-241): all SUCCESS →
        SUCCESS; any FAILURE → FAILURE; else PENDING."""
        states = [self.get(j).state for j in self.group_jobs(group_id)]
        if states and all(s == SUCCESS for s in states):
            return SUCCESS
        if any(s == FAILURE for s in states):
            return FAILURE
        return PENDING

    def delete_group(self, group_id: str) -> None:
        with self._lock:
            self._groups.pop(group_id, None)
            if self._db is not None:
                self._db.execute(
                    "DELETE FROM groups WHERE group_id = ?", (group_id,)
                )
                self._db.commit()
