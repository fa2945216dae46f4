"""Job state store + cross-process backlog, optionally SQLite-backed.

The reference tracks job state in Redis via tasqueue (states PENDING /
STARTED / FAILURE / SUCCESS / RETRY, reference: internal/core/
core.go:574-599), stores a single integer result — the written row
count — per job (core.go:436), and uses the Redis broker to hand jobs
to whichever worker process polls them first (core.go:403-447; README
"Multiple queues, workers and job distribution"). This store plays
both roles for the rebuild:

- **State store.** Same state machine, same payloads. Every mutation
  is a read-modify-write through a store method, so with a persistent
  file the SQLite row is authoritative and any process sharing the
  file sees the same truth (fixing the reference's read-then-enqueue
  race on single-flight IDs, core.go:331-339, with a real atomic
  check-and-set).
- **Broker.** ``create`` = INSERT of a PENDING row; ``claim`` = an
  atomic owner-stamping UPDATE under SQLite's writer lock. A server
  process and any number of ``--worker-only`` processes pointed at the
  same ``jobstore_path`` share one backlog: whoever claims a job first
  owns it — the Spark-native answer to the reference's Redis-brokered
  worker distribution.

Restart semantics (``recover`` modes, applied to rows the previous
process left non-terminal):

- ``"fail"`` — single-process engine: the in-proc work queue died with
  the process, so non-terminal jobs can never finish; mark FAILURE
  (honest failure beats a forever-PENDING ghost).
- ``"requeue"`` — distributed engine: the SQLite file IS the broker
  and PENDING rows are durable backlog; keep them, and return
  STARTED/RETRY rows to the backlog (owner cleared) for re-delivery —
  the same at-least-once semantics a Redis broker gives the reference
  after a worker crash.
- ``"attach"`` — worker-only sidecar joining a live store: touch
  nothing; the rows belong to the running primary.

Cross-process cancellation is purge-level: DELETE /jobs/{id} removes
the row, so an unclaimed job is never picked up, and the eventual
terminal write from a remote owner is dropped (no resurrect). Stage
interruption via ``cancelJobGroup`` only reaches jobs running in the
process that receives the cancel — mirroring the reference, whose
MySQL path cannot interrupt server-side either (README DELETE caveat).
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
    owner: str = ""  # claiming process id ("host:pid"); "" = unclaimed
    heartbeat_at: float | None = None  # owner liveness stamp (lease reclaim)


class SingleFlightError(Exception):
    """Same job_id already Processing/Retrying (core.go:331-339)."""


class JobStore:
    """Thread-safe (and, when persistent, process-shared) job registry.

    Job IDs are caller-suppliable and *non-unique* across completed
    runs (a re-post of a finished ID overwrites it, like the reference
    re-enqueueing the same ID); only one instance of an ID may be
    active at a time — enforced atomically here, across processes when
    a shared SQLite file is configured.
    """

    def __init__(
        self,
        persist_path: str | None = None,
        recover: str = "fail",
        recover_inflight: bool | None = None,
        requeue_lease: float = 0.0,
    ) -> None:
        """``recover`` picks the restart policy (module docstring).
        ``recover_inflight=False`` is the pre-distribution spelling of
        ``recover="attach"`` (worker sidecar), kept as an alias.

        ``requeue_lease`` scopes the "requeue" policy: rows whose
        owner heartbeat is fresher than the lease belong to a LIVE
        sibling process and are left alone (stealing them would
        double-execute); only stale/unowned rows return to the
        backlog. 0 = reset every in-flight row (correct when lease
        reclaim is disabled — nothing else would ever recover them).
        """
        if recover_inflight is not None and not recover_inflight:
            recover = "attach"
        if recover not in ("fail", "requeue", "attach"):
            raise ValueError(f"unknown recover mode: {recover!r}")
        self._requeue_lease = requeue_lease
        self._jobs: dict[str, JobRecord] = {}
        self._groups: dict[str, list[str]] = {}
        self._lock = threading.RLock()
        self._db: sqlite3.Connection | None = None
        if persist_path:
            # One shared connection, serialized by self._lock within
            # the process. Autocommit (isolation_level=None) so the
            # explicit BEGIN IMMEDIATE transactions below own their
            # boundaries. WAL + busy_timeout make concurrent access
            # from sibling processes safe instead of "database is
            # locked" roulette.
            self._db = sqlite3.connect(
                persist_path, check_same_thread=False, isolation_level=None
            )
            self._db.execute("PRAGMA journal_mode=WAL")
            self._db.execute("PRAGMA busy_timeout=10000")
            self._db.execute(
                "CREATE TABLE IF NOT EXISTS jobs (job_id TEXT PRIMARY KEY, data TEXT)"
            )
            self._db.execute(
                "CREATE TABLE IF NOT EXISTS groups (group_id TEXT PRIMARY KEY, job_ids TEXT)"
            )
            self._recover(recover)

    # -- persistence helpers ------------------------------------------
    def _recover(self, mode: str) -> None:
        """Apply the restart policy to rows a dead process left active."""
        assert self._db is not None
        # fetchall() first: INSERT OR REPLACE is a delete+reinsert (new
        # rowid), so mutating the table under a live SELECT cursor can
        # skip or revisit rows — exactly the in-flight rows this scan
        # exists to recover.
        for (data,) in self._db.execute("SELECT data FROM jobs").fetchall():
            rec = JobRecord(**json.loads(data))
            if rec.state in _ACTIVE and mode == "fail":
                rec.state = FAILURE
                rec.error = "interrupted by engine restart"
                rec.finished_at = rec.finished_at or time.time()
                self._write(rec)
            elif rec.state in (STARTED, RETRY) and mode == "requeue":
                # Only reclaim rows no live process owns: a fresh heartbeat
                # means a live sibling worker is mid-job — stealing it
                # here would double-execute. (Stale rows also remain
                # covered by lease reclaim in claim(); resetting them at
                # startup is just the fast path.) NOTE: requeue_lease=0
                # with live sibling processes therefore GUARANTEES
                # double execution of their in-flight jobs — configure a
                # lease whenever sidecars share the store file.
                stale = (
                    self._requeue_lease <= 0
                    or not rec.owner
                    or (rec.heartbeat_at or 0.0)
                    <= time.time() - self._requeue_lease
                )
                if stale:
                    # Per-row RMW under the writer lock, re-checking
                    # state: an owner's terminal write landing between
                    # our scan and this reset must win — blindly
                    # re-PENDING a SUCCESS row would re-execute a
                    # completed job.
                    self._db.execute("BEGIN IMMEDIATE")
                    try:
                        cur = self._row(rec.job_id)
                        if cur is not None and cur.state in (STARTED, RETRY):
                            cur.state = PENDING
                            cur.owner = ""
                            self._write(cur)
                            rec = cur
                        elif cur is not None:
                            rec = cur
                        self._db.execute("COMMIT")
                    except BaseException:
                        self._db.execute("ROLLBACK")
                        raise
            self._jobs[rec.job_id] = rec
        for gid, ids in self._db.execute("SELECT group_id, job_ids FROM groups"):
            self._groups[gid] = json.loads(ids)

    def _write(self, rec: JobRecord) -> None:
        assert self._db is not None
        self._db.execute(
            "INSERT OR REPLACE INTO jobs (job_id, data) VALUES (?, ?)",
            (rec.job_id, json.dumps(asdict(rec))),
        )

    def _row(self, job_id: str) -> JobRecord | None:
        assert self._db is not None
        row = self._db.execute(
            "SELECT data FROM jobs WHERE job_id = ?", (job_id,)
        ).fetchone()
        return None if row is None else JobRecord(**json.loads(row[0]))

    def close(self) -> None:
        with self._lock:
            if self._db is not None:
                self._db.close()
                self._db = None

    # -- jobs ---------------------------------------------------------
    def create(self, rec: JobRecord) -> JobRecord:
        with self._lock:
            if self._db is None:
                existing = self._jobs.get(rec.job_id)
                if existing is not None and existing.state in _ACTIVE:
                    raise SingleFlightError(
                        f"job {rec.job_id} is already running: {existing.state}"
                    )
                self._jobs[rec.job_id] = rec
                return rec
            # Cross-process single-flight: another engine process
            # sharing this store file may own an active instance of
            # the ID. BEGIN IMMEDIATE takes the writer lock, so the
            # check-and-insert is atomic against concurrent creators
            # (the reference gets the same guarantee from Redis,
            # core.go:331-339 — minus its read-then-enqueue race).
            self._db.execute("BEGIN IMMEDIATE")
            try:
                existing = self._row(rec.job_id)
                if existing is not None and existing.state in _ACTIVE:
                    local = self._jobs.get(rec.job_id)
                    where = (
                        ""
                        if local is not None and local.state in _ACTIVE
                        else " in another process"
                    )
                    raise SingleFlightError(
                        f"job {rec.job_id} is already running"
                        f"{where}: {existing.state}"
                    )
                self._write(rec)
                self._db.execute("COMMIT")
            except BaseException:
                self._db.execute("ROLLBACK")
                raise
            self._jobs[rec.job_id] = rec
            return rec

    def get(self, job_id: str) -> JobRecord:
        """Authoritative record: the SQLite row when persistent (a
        sibling process may have advanced it), else the local object."""
        with self._lock:
            if self._db is not None:
                rec = self._row(job_id)
                if rec is not None:
                    self._jobs[job_id] = rec
                    return rec
                self._jobs.pop(job_id, None)
                raise KeyError(f"unknown job: {job_id}")
            try:
                return self._jobs[job_id]
            except KeyError:
                raise KeyError(f"unknown job: {job_id}") from None

    def exists(self, job_id: str) -> bool:
        with self._lock:
            if self._db is not None:
                return self._row(job_id) is not None
            return job_id in self._jobs

    def set_state(
        self,
        job_id: str,
        state: str,
        *,
        count: int | None = None,
        error: str | None = None,
        result_path: str | None = None,
        result_backend: str | None = None,
        attempts: int | None = None,
        owner: str | None = None,
    ) -> bool:
        """Atomic read-modify-write of the job's status fields.

        Returns False (and drops the local cache entry) when the row
        has been purged by a cancel in this or another process — the
        caller's terminal write is dropped rather than resurrecting a
        cancelled job.
        """
        with self._lock:
            if self._db is not None:
                self._db.execute("BEGIN IMMEDIATE")
                try:
                    rec = self._row(job_id)
                    if rec is None:
                        self._db.execute("COMMIT")
                        self._jobs.pop(job_id, None)
                        return False
                    self._apply(
                        rec, state, count, error, result_path,
                        result_backend, attempts, owner,
                    )
                    self._write(rec)
                    self._db.execute("COMMIT")
                except BaseException:
                    self._db.execute("ROLLBACK")
                    raise
                self._jobs[job_id] = rec
                return True
            rec = self._jobs.get(job_id)
            if rec is None:
                return False
            self._apply(
                rec, state, count, error, result_path,
                result_backend, attempts, owner,
            )
            return True

    @staticmethod
    def _apply(
        rec: JobRecord,
        state: str,
        count: int | None,
        error: str | None,
        result_path: str | None,
        result_backend: str | None,
        attempts: int | None,
        owner: str | None,
    ) -> None:
        rec.state = state
        if state in _TERMINAL:
            rec.finished_at = time.time()
        if count is not None:
            rec.count = count
        if error is not None:
            rec.error = error
        if result_path is not None:
            rec.result_path = result_path
        if result_backend is not None:
            rec.result_backend = result_backend
        if attempts is not None:
            rec.attempts = attempts
        if owner is not None:
            rec.owner = owner

    def claim(
        self,
        queues: list[str],
        owner: str,
        now: float | None = None,
        lease: float = 0.0,
    ) -> JobRecord | None:
        """Atomically claim the oldest runnable job on ``queues``.

        Runnable = PENDING (or RETRY returned to the backlog), not
        cancelled, unclaimed, and past its ETA. The claim stamps
        ``owner`` + a heartbeat and moves the row to STARTED inside one
        writer-lock transaction, so two processes polling the same file
        can never claim the same job — the broker handoff the reference
        gets from Redis (core.go:403-447).

        With ``lease > 0``, a STARTED row whose owner's heartbeat is
        older than the lease is also runnable: a worker that died
        mid-job gets its jobs re-delivered to a live process without
        waiting for a primary restart — at-least-once, the same
        visibility-timeout semantics a Redis broker gives the
        reference. (A stalled-but-alive worker can therefore cause a
        double execution; results are overwrite tables, so the
        duplicate write is idempotent.)
        """
        now = time.time() if now is None else now

        def _runnable(r: JobRecord) -> bool:
            if r.queue not in queues or r.cancelled:
                return False
            if r.eta is not None and r.eta > now:
                return False
            if r.state in (PENDING, RETRY) and not r.owner:
                return True
            return (
                lease > 0
                and r.state == STARTED
                and bool(r.owner)
                and (r.heartbeat_at or 0.0) <= now - lease
            )

        with self._lock:
            if self._db is None:
                cands = [r for r in self._jobs.values() if _runnable(r)]
                if not cands:
                    return None
                rec = min(cands, key=lambda r: r.created_at)
                rec.owner = owner
                rec.state = STARTED
                rec.heartbeat_at = now
                return rec
            marks = ",".join("?" for _ in queues)
            lease_clause = (
                """
                OR (json_extract(data, '$.state') = 'STARTED'
                    AND json_extract(data, '$.owner') <> ''
                    AND COALESCE(json_extract(data, '$.heartbeat_at'), 0)
                        <= ? - ?)
                """
                if lease > 0
                else ""
            )
            lease_args = (now, lease) if lease > 0 else ()
            select_sql = f"""
                SELECT data FROM jobs
                WHERE json_extract(data, '$.queue') IN ({marks})
                  AND NOT json_extract(data, '$.cancelled')
                  AND (json_extract(data, '$.eta') IS NULL
                       OR json_extract(data, '$.eta') <= ?)
                  AND ((json_extract(data, '$.state') IN ('PENDING', 'RETRY')
                        AND json_extract(data, '$.owner') = '')
                       {lease_clause})
                ORDER BY json_extract(data, '$.created_at')
                LIMIT 1
                """
            select_args = (*queues, now, *lease_args)
            # Idle fast path: a plain read (WAL: no writer lock) before
            # paying for BEGIN IMMEDIATE. Claim pools poll continuously
            # across every process; an empty backlog must not serialize
            # them on the writer lock. The candidate is re-checked
            # inside the transaction, so the handoff stays exact.
            if self._db.execute(select_sql, select_args).fetchone() is None:
                return None
            self._db.execute("BEGIN IMMEDIATE")
            try:
                row = self._db.execute(select_sql, select_args).fetchone()
                if row is None:  # lost the race to another claimer
                    self._db.execute("COMMIT")
                    return None
                rec = JobRecord(**json.loads(row[0]))
                rec.owner = owner
                rec.state = STARTED
                rec.heartbeat_at = now
                self._write(rec)
                self._db.execute("COMMIT")
            except BaseException:
                self._db.execute("ROLLBACK")
                raise
            self._jobs[rec.job_id] = rec
            return rec

    def heartbeat(self, owner: str, now: float | None = None) -> None:
        """Refresh the liveness stamp on every job ``owner`` is
        currently running — called periodically by each worker process
        so its leases never expire while it's alive."""
        now = time.time() if now is None else now
        with self._lock:
            if self._db is not None:
                self._db.execute(
                    """
                    UPDATE jobs
                    SET data = json_set(data, '$.heartbeat_at', ?)
                    WHERE json_extract(data, '$.owner') = ?
                      AND json_extract(data, '$.state') = 'STARTED'
                    """,
                    (now, owner),
                )
            for rec in self._jobs.values():
                if rec.owner == owner and rec.state == STARTED:
                    rec.heartbeat_at = now

    def mark_cancelled(self, job_id: str) -> JobRecord:
        with self._lock:
            if self._db is not None:
                self._db.execute("BEGIN IMMEDIATE")
                try:
                    rec = self._row(job_id)
                    if rec is None:
                        self._db.execute("COMMIT")
                        raise KeyError(f"unknown job: {job_id}")
                    rec.cancelled = True
                    self._write(rec)
                    self._db.execute("COMMIT")
                except BaseException:
                    self._db.execute("ROLLBACK")
                    raise
                self._jobs[job_id] = rec
                return rec
            rec = self.get(job_id)
            rec.cancelled = True
            return rec

    def clear_result(self, job_id: str) -> None:
        """Forget a reaped job's result location (TTL reaper)."""
        with self._lock:
            if self._db is not None:
                self._db.execute("BEGIN IMMEDIATE")
                try:
                    rec = self._row(job_id)
                    if rec is not None:
                        rec.result_path = ""
                        self._write(rec)
                    self._db.execute("COMMIT")
                except BaseException:
                    self._db.execute("ROLLBACK")
                    raise
                if rec is not None:
                    self._jobs[job_id] = rec
                return
            rec = self._jobs.get(job_id)
            if rec is not None:
                rec.result_path = ""

    def delete(self, job_id: str) -> None:
        with self._lock:
            self._jobs.pop(job_id, None)
            if self._db is not None:
                self._db.execute("DELETE FROM jobs WHERE job_id = ?", (job_id,))

    def pending(self, queue: str) -> list[JobRecord]:
        """Pending jobs on a queue, oldest first (core.go:149-162 —
        the reference fetches newest-first then reverses). Filter and
        order run in SQL — metrics/pending polls must not deserialize
        the full (mostly terminal) job history."""
        with self._lock:
            if self._db is not None:
                return [
                    JobRecord(**json.loads(data))
                    for (data,) in self._db.execute(
                        """
                        SELECT data FROM jobs
                        WHERE json_extract(data, '$.queue') = ?
                          AND json_extract(data, '$.state') = 'PENDING'
                        ORDER BY json_extract(data, '$.created_at')
                        """,
                        (queue,),
                    )
                ]
            recs = list(self._jobs.values())
        return sorted(
            (r for r in recs if r.queue == queue and r.state == PENDING),
            key=lambda r: r.created_at,
        )

    def counts_by_state(self) -> dict[str, int]:
        """Job counts keyed by state (for the /metrics gauges)."""
        with self._lock:
            if self._db is not None:
                return {
                    state: n
                    for state, n in self._db.execute(
                        """
                        SELECT json_extract(data, '$.state'), COUNT(*)
                        FROM jobs GROUP BY 1
                        """
                    )
                }
            recs = list(self._jobs.values())
        counts: dict[str, int] = {}
        for rec in recs:
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
            if self._db is not None:
                return [
                    JobRecord(**json.loads(data))
                    for (data,) in self._db.execute(
                        """
                        SELECT data FROM jobs
                        WHERE json_extract(data, '$.state') IN ('SUCCESS', 'FAILURE')
                          AND json_extract(data, '$.ttl') > 0
                          AND json_extract(data, '$.result_path') <> ''
                          AND json_extract(data, '$.finished_at') IS NOT NULL
                          AND json_extract(data, '$.finished_at')
                              + json_extract(data, '$.ttl') <= ?
                        """,
                        (now,),
                    )
                ]
            recs = list(self._jobs.values())
        return [
            r
            for r in recs
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
            if self._db is not None:
                self._db.execute(
                    "INSERT OR REPLACE INTO groups (group_id, job_ids) VALUES (?, ?)",
                    (group_id, json.dumps(list(job_ids))),
                )
            for jid in job_ids:
                self.set_group(jid, group_id)

    def set_group(self, job_id: str, group_id: str) -> None:
        with self._lock:
            if self._db is not None:
                self._db.execute("BEGIN IMMEDIATE")
                try:
                    rec = self._row(job_id)
                    if rec is not None:
                        rec.group_id = group_id
                        self._write(rec)
                    self._db.execute("COMMIT")
                except BaseException:
                    self._db.execute("ROLLBACK")
                    raise
                if rec is not None:
                    self._jobs[job_id] = rec
                return
            rec = self._jobs.get(job_id)
            if rec is not None:
                rec.group_id = group_id

    def group_jobs(self, group_id: str) -> list[str]:
        with self._lock:
            if self._db is not None:
                row = self._db.execute(
                    "SELECT job_ids FROM groups WHERE group_id = ?", (group_id,)
                ).fetchone()
                if row is not None:
                    ids = json.loads(row[0])
                    self._groups[group_id] = list(ids)
                    return list(ids)
                self._groups.pop(group_id, None)
                raise KeyError(f"unknown group: {group_id}")
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
