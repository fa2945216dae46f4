"""Pluggable persistence backends for the job store/broker.

``JobStore`` (jobstore.py) owns broker *policy* — the state machine,
single-flight semantics, restart recovery, lease rules. This module
owns broker *storage*: the small set of atomic primitives a backend
must provide for that policy to be correct across processes (and, with
a server-backed implementation, across machines).

The reference accepts only a Redis broker for multi-worker deployments
(cmd/init.go:200-229); the file-SQLite backend here covers
multi-process-single-host (VERDICT r04: SQLite-over-NFS is NOT a safe
substitute for multi-machine). This seam is what makes a
Postgres/Redis backend a drop-in: implement ``BrokerBackend``, pass it
as ``JobStore(backend=...)``, and inherit the contract test class
(tests/test_broker_contract.py ``BrokerContract``) to prove the
atomicity obligations hold.

Obligations (enforced by the contract tests):

- ``check_and_put`` is atomic against concurrent callers: of N racing
  creates for one active job id, exactly one inserts.
- ``claim`` delivers each runnable job to exactly one caller, ever,
  across any number of backend instances on the same underlying store
  (modulo lease reclaim of stale owners, which is the documented
  at-least-once trade).
- ``mutate`` is a transactional read-modify-write: concurrent mutates
  of one row serialize, and a mutate of a deleted row returns None
  without resurrecting it.
- Threading: one backend instance is only ever called under its
  ``JobStore``'s lock — implementations need no internal locking for
  same-instance calls, but MUST be safe against *other instances* of
  themselves on the same store (other processes).

For a SQL server backend, ``claim``'s SQLite writer-lock transaction
maps to ``SELECT ... FOR UPDATE SKIP LOCKED``; for Redis, to a Lua
script or WATCH/MULTI. ``mutate`` takes a Python callable, which any
DB-API backend can run inside a row-locked transaction; a Redis
implementation would retry on WATCH conflict.
"""

from __future__ import annotations

import json
import sqlite3
from abc import ABC, abstractmethod
from collections.abc import Callable
from dataclasses import asdict
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # import cycle: jobstore imports this module
    from dungbeetle_spark.jobstore import JobRecord


def _record(data: str) -> "JobRecord":
    from dungbeetle_spark.jobstore import JobRecord

    return JobRecord(**json.loads(data))


class BrokerBackend(ABC):
    """Atomic storage primitives behind ``JobStore``. See module doc."""

    @abstractmethod
    def check_and_put(
        self, rec: "JobRecord", active_states: tuple[str, ...]
    ) -> "JobRecord | None":
        """Insert ``rec``, unless a row with the same job_id exists in
        one of ``active_states`` — then insert nothing and return that
        existing row (single-flight). Atomic across processes."""

    @abstractmethod
    def get(self, job_id: str) -> "JobRecord | None":
        """Current row, or None."""

    @abstractmethod
    def mutate(
        self, job_id: str, fn: Callable[["JobRecord"], None]
    ) -> "JobRecord | None":
        """Transactional read-modify-write: load the row, apply ``fn``
        (in-place mutation), persist, return the updated record. None
        (and no write) when the row does not exist."""

    @abstractmethod
    def claim(
        self, queues: list[str], owner: str, now: float, lease: float
    ) -> "JobRecord | None":
        """Atomically claim the oldest runnable job on ``queues``:
        stamp owner/STARTED/heartbeat inside one transaction so no two
        callers (in any process) ever claim the same job. Runnable =
        (PENDING or RETRY) unowned and past ETA and not cancelled; or,
        when ``lease > 0``, STARTED with a heartbeat staler than the
        lease (dead-owner reclaim)."""

    @abstractmethod
    def heartbeat(self, owner: str, now: float) -> None:
        """Refresh heartbeat_at on every STARTED row owned by
        ``owner``."""

    @abstractmethod
    def delete(self, job_id: str) -> None: ...

    @abstractmethod
    def scan(self) -> list["JobRecord"]:
        """Every row, materialized (restart recovery walks this while
        mutating — implementations must not return a live cursor)."""

    @abstractmethod
    def pending(self, queue: str) -> list["JobRecord"]:
        """PENDING rows on ``queue``, oldest first — filtered
        store-side (metrics polls must not deserialize the full
        history)."""

    @abstractmethod
    def counts_by_state(self) -> dict[str, int]: ...

    @abstractmethod
    def expired(self, now: float) -> list["JobRecord"]:
        """Terminal rows with ttl > 0, a result_path, and
        finished_at + ttl <= now (TTL reaper input)."""

    # -- groups -------------------------------------------------------
    @abstractmethod
    def put_group(self, group_id: str, job_ids: list[str]) -> None: ...

    @abstractmethod
    def get_group(self, group_id: str) -> list[str] | None: ...

    @abstractmethod
    def scan_groups(self) -> dict[str, list[str]]: ...

    @abstractmethod
    def delete_group(self, group_id: str) -> None: ...

    @abstractmethod
    def close(self) -> None: ...


class SqliteBroker(BrokerBackend):
    """File-SQLite backend: single-host, multi-process.

    WAL + busy_timeout make sibling-process access safe; BEGIN
    IMMEDIATE takes the writer lock for every atomic section. Rows are
    the JSON of the JobRecord dataclass keyed by job_id — schema
    evolution is adding dataclass fields with defaults.
    """

    def __init__(self, path: str) -> None:
        # Autocommit (isolation_level=None) so the explicit BEGIN
        # IMMEDIATE transactions own their boundaries.
        self._db = sqlite3.connect(
            path, check_same_thread=False, isolation_level=None
        )
        self._db.execute("PRAGMA journal_mode=WAL")
        self._db.execute("PRAGMA busy_timeout=10000")
        self._db.execute(
            "CREATE TABLE IF NOT EXISTS jobs (job_id TEXT PRIMARY KEY, data TEXT)"
        )
        self._db.execute(
            "CREATE TABLE IF NOT EXISTS groups (group_id TEXT PRIMARY KEY, job_ids TEXT)"
        )

    # -- helpers ------------------------------------------------------
    def _write(self, rec: "JobRecord") -> None:
        self._db.execute(
            "INSERT OR REPLACE INTO jobs (job_id, data) VALUES (?, ?)",
            (rec.job_id, json.dumps(asdict(rec))),
        )

    def _row(self, job_id: str) -> "JobRecord | None":
        row = self._db.execute(
            "SELECT data FROM jobs WHERE job_id = ?", (job_id,)
        ).fetchone()
        return None if row is None else _record(row[0])

    def _txn(self):
        self._db.execute("BEGIN IMMEDIATE")

    # -- BrokerBackend ------------------------------------------------
    def check_and_put(
        self, rec: "JobRecord", active_states: tuple[str, ...]
    ) -> "JobRecord | None":
        self._txn()
        try:
            existing = self._row(rec.job_id)
            if existing is not None and existing.state in active_states:
                self._db.execute("COMMIT")
                return existing
            self._write(rec)
            self._db.execute("COMMIT")
        except BaseException:
            self._db.execute("ROLLBACK")
            raise
        return None

    def get(self, job_id: str) -> "JobRecord | None":
        return self._row(job_id)

    def mutate(
        self, job_id: str, fn: Callable[["JobRecord"], None]
    ) -> "JobRecord | None":
        self._txn()
        try:
            rec = self._row(job_id)
            if rec is not None:
                fn(rec)
                self._write(rec)
            self._db.execute("COMMIT")
        except BaseException:
            self._db.execute("ROLLBACK")
            raise
        return rec

    def claim(
        self, queues: list[str], owner: str, now: float, lease: float
    ) -> "JobRecord | None":
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
        # them on the writer lock. The candidate is re-checked inside
        # the transaction, so the handoff stays exact.
        if self._db.execute(select_sql, select_args).fetchone() is None:
            return None
        self._txn()
        try:
            row = self._db.execute(select_sql, select_args).fetchone()
            if row is None:  # lost the race to another claimer
                self._db.execute("COMMIT")
                return None
            rec = _record(row[0])
            rec.owner = owner
            rec.state = "STARTED"  # jobstore.STARTED (SQL above matches)
            rec.heartbeat_at = now
            self._write(rec)
            self._db.execute("COMMIT")
        except BaseException:
            self._db.execute("ROLLBACK")
            raise
        return rec

    def heartbeat(self, owner: str, now: float) -> None:
        self._db.execute(
            """
            UPDATE jobs
            SET data = json_set(data, '$.heartbeat_at', ?)
            WHERE json_extract(data, '$.owner') = ?
              AND json_extract(data, '$.state') = 'STARTED'
            """,
            (now, owner),
        )

    def delete(self, job_id: str) -> None:
        self._db.execute("DELETE FROM jobs WHERE job_id = ?", (job_id,))

    def scan(self) -> list["JobRecord"]:
        # fetchall() first: callers mutate while walking, and REPLACE
        # is delete+reinsert — a live cursor could skip/revisit rows.
        return [
            _record(data)
            for (data,) in self._db.execute("SELECT data FROM jobs").fetchall()
        ]

    def pending(self, queue: str) -> list["JobRecord"]:
        return [
            _record(data)
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

    def counts_by_state(self) -> dict[str, int]:
        return {
            state: n
            for state, n in self._db.execute(
                "SELECT json_extract(data, '$.state'), COUNT(*) FROM jobs GROUP BY 1"
            )
        }

    def expired(self, now: float) -> list["JobRecord"]:
        return [
            _record(data)
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

    # -- groups -------------------------------------------------------
    def put_group(self, group_id: str, job_ids: list[str]) -> None:
        self._db.execute(
            "INSERT OR REPLACE INTO groups (group_id, job_ids) VALUES (?, ?)",
            (group_id, json.dumps(list(job_ids))),
        )

    def get_group(self, group_id: str) -> list[str] | None:
        row = self._db.execute(
            "SELECT job_ids FROM groups WHERE group_id = ?", (group_id,)
        ).fetchone()
        return None if row is None else list(json.loads(row[0]))

    def scan_groups(self) -> dict[str, list[str]]:
        return {
            gid: json.loads(ids)
            for gid, ids in self._db.execute(
                "SELECT group_id, job_ids FROM groups"
            ).fetchall()
        }

    def delete_group(self, group_id: str) -> None:
        self._db.execute("DELETE FROM groups WHERE group_id = ?", (group_id,))

    def close(self) -> None:
        self._db.close()
