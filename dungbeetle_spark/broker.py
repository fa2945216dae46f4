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


class DBAPIBroker(BrokerBackend):
    """Generic DBAPI-2.0 backend: the multi-machine broker.

    Works over any DBAPI connection factory — ``sqlite3.connect`` for
    tests/single-host, ``psycopg2.connect`` for a real served
    Postgres, where every machine in a worker fleet points at the same
    database. Hot fields live in real indexed columns (state, owner,
    queue, heartbeat) so claim/pending/expired run as plain SQL over
    any engine; the full record rides along as a JSON document that is
    rewritten on every row mutation (columns overlay the JSON on read,
    so the column-only fast paths — heartbeat — never go stale).

    Dialect differences are confined to two knobs:

    - ``paramstyle``: qmark (sqlite) vs format/%s (psycopg2) —
      auto-derived from the dialect.
    - claim/mutate locking: ``BEGIN IMMEDIATE`` writer lock on
      sqlite; ``SELECT ... FOR UPDATE [SKIP LOCKED]`` row locks on
      postgresql. SKIP LOCKED lets N claiming machines scan past each
      other instead of queueing on the head row — the server-grade
      delivery path the reference gets from Redis.

    sqlite factories must pass ``isolation_level=None`` (autocommit)
    so the explicit BEGIN IMMEDIATE owns its transaction. Validated
    end-to-end by the ``BrokerContract`` suite
    (tests/test_broker_contract.py) over the sqlite3 driver; the
    postgresql dialect changes only the SQL strings noted above.
    """

    _DIALECTS = ("sqlite", "postgresql")

    def __init__(self, connect, dialect: str = "sqlite") -> None:
        if dialect not in self._DIALECTS:
            raise ValueError(f"unknown dialect: {dialect!r}")
        self._dialect = dialect
        self._pg = dialect == "postgresql"
        self._db = connect()
        cur = self._db.cursor()
        real = "DOUBLE PRECISION" if self._pg else "REAL"
        cur.execute(
            f"""
            CREATE TABLE IF NOT EXISTS db_jobs (
                job_id TEXT PRIMARY KEY,
                queue TEXT NOT NULL,
                state TEXT NOT NULL,
                owner TEXT NOT NULL DEFAULT '',
                cancelled INTEGER NOT NULL DEFAULT 0,
                eta {real},
                created_at {real} NOT NULL,
                heartbeat_at {real},
                reaps_at {real},
                data TEXT NOT NULL
            )
            """
        )
        cur.execute(
            "CREATE INDEX IF NOT EXISTS db_jobs_claim "
            "ON db_jobs (queue, state, created_at)"
        )
        cur.execute(
            """
            CREATE TABLE IF NOT EXISTS db_groups (
                group_id TEXT PRIMARY KEY, job_ids TEXT NOT NULL
            )
            """
        )
        self._db.commit()

    # -- helpers ------------------------------------------------------
    def _q(self, sql: str) -> str:
        return sql.replace("?", "%s") if self._pg else sql

    def _begin(self, cur) -> None:
        if not self._pg:
            cur.execute("BEGIN IMMEDIATE")
        # postgresql: the DBAPI connection opens a transaction
        # implicitly at first statement; row locks come from FOR UPDATE

    @staticmethod
    def _reaps_at(rec: "JobRecord") -> float | None:
        if (
            rec.state in ("SUCCESS", "FAILURE")
            and rec.ttl > 0
            and rec.result_path
            and rec.finished_at is not None
        ):
            return rec.finished_at + rec.ttl
        return None

    def _upsert(self, cur, rec: "JobRecord") -> None:
        # INSERT .. ON CONFLICT DO UPDATE: identical syntax on
        # sqlite >= 3.24 and postgresql >= 9.5
        cur.execute(
            self._q(
                """
                INSERT INTO db_jobs (job_id, queue, state, owner, cancelled,
                                     eta, created_at, heartbeat_at, reaps_at, data)
                VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)
                ON CONFLICT (job_id) DO UPDATE SET
                    queue = excluded.queue, state = excluded.state,
                    owner = excluded.owner, cancelled = excluded.cancelled,
                    eta = excluded.eta, created_at = excluded.created_at,
                    heartbeat_at = excluded.heartbeat_at,
                    reaps_at = excluded.reaps_at, data = excluded.data
                """
            ),
            (
                rec.job_id, rec.queue, rec.state, rec.owner,
                1 if rec.cancelled else 0, rec.eta, rec.created_at,
                rec.heartbeat_at, self._reaps_at(rec),
                json.dumps(asdict(rec)),
            ),
        )

    @staticmethod
    def _overlay(row) -> "JobRecord":
        """JSON document + authoritative hot columns → record."""
        (job_id, queue, state, owner, cancelled, eta, created_at,
         heartbeat_at, _reaps, data) = row
        rec = _record(data)
        rec.state = state
        rec.owner = owner
        rec.cancelled = bool(cancelled)
        rec.heartbeat_at = heartbeat_at
        return rec

    _COLS = ("job_id, queue, state, owner, cancelled, eta, created_at, "
             "heartbeat_at, reaps_at, data")

    def _select_row(self, cur, job_id: str, lock: bool):
        sql = f"SELECT {self._COLS} FROM db_jobs WHERE job_id = ?"
        if lock and self._pg:
            sql += " FOR UPDATE"
        cur.execute(self._q(sql), (job_id,))
        return cur.fetchone()

    # -- BrokerBackend ------------------------------------------------
    def check_and_put(
        self, rec: "JobRecord", active_states: tuple[str, ...]
    ) -> "JobRecord | None":
        cur = self._db.cursor()
        try:
            self._begin(cur)
            row = self._select_row(cur, rec.job_id, lock=True)
            if row is not None and row[2] in active_states:
                self._db.commit()
                return self._overlay(row)
            self._upsert(cur, rec)
            self._db.commit()
        except BaseException:
            self._db.rollback()
            raise
        return None

    def get(self, job_id: str) -> "JobRecord | None":
        cur = self._db.cursor()
        row = self._select_row(cur, job_id, lock=False)
        if not self._pg:
            self._db.commit()  # close the implicit read txn
        return None if row is None else self._overlay(row)

    def mutate(
        self, job_id: str, fn: Callable[["JobRecord"], None]
    ) -> "JobRecord | None":
        cur = self._db.cursor()
        try:
            self._begin(cur)
            row = self._select_row(cur, job_id, lock=True)
            rec = None
            if row is not None:
                rec = self._overlay(row)
                fn(rec)
                self._upsert(cur, rec)
            self._db.commit()
        except BaseException:
            self._db.rollback()
            raise
        return rec

    def claim(
        self, queues: list[str], owner: str, now: float, lease: float
    ) -> "JobRecord | None":
        marks = ",".join("?" for _ in queues)
        lease_clause = (
            "OR (state = 'STARTED' AND owner <> '' "
            "    AND COALESCE(heartbeat_at, 0) <= ? - ?)"
            if lease > 0
            else ""
        )
        lease_args = (now, lease) if lease > 0 else ()
        select_sql = f"""
            SELECT {self._COLS} FROM db_jobs
            WHERE queue IN ({marks})
              AND cancelled = 0
              AND (eta IS NULL OR eta <= ?)
              AND ((state IN ('PENDING', 'RETRY') AND owner = '')
                   {lease_clause})
            ORDER BY created_at
            LIMIT 1
            """
        args = (*queues, now, *lease_args)
        cur = self._db.cursor()
        # Idle fast path (see SqliteBroker.claim): plain read first so
        # an empty backlog never takes the writer/row lock.
        cur.execute(self._q(select_sql), args)
        if cur.fetchone() is None:
            self._db.commit()
            return None
        locked_sql = select_sql + (" FOR UPDATE SKIP LOCKED" if self._pg else "")
        try:
            self._begin(cur)
            cur.execute(self._q(locked_sql), args)
            row = cur.fetchone()
            if row is None:  # lost the race to another claimer
                self._db.commit()
                return None
            rec = self._overlay(row)
            rec.owner = owner
            rec.state = "STARTED"
            rec.heartbeat_at = now
            self._upsert(cur, rec)
            self._db.commit()
        except BaseException:
            self._db.rollback()
            raise
        return rec

    def heartbeat(self, owner: str, now: float) -> None:
        cur = self._db.cursor()
        try:
            cur.execute(
                self._q(
                    "UPDATE db_jobs SET heartbeat_at = ? "
                    "WHERE owner = ? AND state = 'STARTED'"
                ),
                (now, owner),
            )
            self._db.commit()
        except BaseException:
            self._db.rollback()
            raise

    def delete(self, job_id: str) -> None:
        cur = self._db.cursor()
        try:
            cur.execute(
                self._q("DELETE FROM db_jobs WHERE job_id = ?"), (job_id,)
            )
            self._db.commit()
        except BaseException:
            self._db.rollback()
            raise

    def scan(self) -> list["JobRecord"]:
        cur = self._db.cursor()
        cur.execute(f"SELECT {self._COLS} FROM db_jobs")
        rows = cur.fetchall()
        if not self._pg:
            self._db.commit()
        return [self._overlay(r) for r in rows]

    def pending(self, queue: str) -> list["JobRecord"]:
        cur = self._db.cursor()
        cur.execute(
            self._q(
                f"SELECT {self._COLS} FROM db_jobs "
                "WHERE queue = ? AND state = 'PENDING' ORDER BY created_at"
            ),
            (queue,),
        )
        rows = cur.fetchall()
        if not self._pg:
            self._db.commit()
        return [self._overlay(r) for r in rows]

    def counts_by_state(self) -> dict[str, int]:
        cur = self._db.cursor()
        cur.execute("SELECT state, COUNT(*) FROM db_jobs GROUP BY state")
        out = {state: int(n) for state, n in cur.fetchall()}
        if not self._pg:
            self._db.commit()
        return out

    def expired(self, now: float) -> list["JobRecord"]:
        cur = self._db.cursor()
        cur.execute(
            self._q(
                f"SELECT {self._COLS} FROM db_jobs "
                "WHERE reaps_at IS NOT NULL AND reaps_at <= ?"
            ),
            (now,),
        )
        rows = cur.fetchall()
        if not self._pg:
            self._db.commit()
        return [self._overlay(r) for r in rows]

    # -- groups -------------------------------------------------------
    def put_group(self, group_id: str, job_ids: list[str]) -> None:
        cur = self._db.cursor()
        try:
            cur.execute(
                self._q(
                    """
                    INSERT INTO db_groups (group_id, job_ids) VALUES (?, ?)
                    ON CONFLICT (group_id) DO UPDATE SET
                        job_ids = excluded.job_ids
                    """
                ),
                (group_id, json.dumps(list(job_ids))),
            )
            self._db.commit()
        except BaseException:
            self._db.rollback()
            raise

    def get_group(self, group_id: str) -> list[str] | None:
        cur = self._db.cursor()
        cur.execute(
            self._q("SELECT job_ids FROM db_groups WHERE group_id = ?"),
            (group_id,),
        )
        row = cur.fetchone()
        if not self._pg:
            self._db.commit()
        return None if row is None else list(json.loads(row[0]))

    def scan_groups(self) -> dict[str, list[str]]:
        cur = self._db.cursor()
        cur.execute("SELECT group_id, job_ids FROM db_groups")
        rows = cur.fetchall()
        if not self._pg:
            self._db.commit()
        return {gid: json.loads(ids) for gid, ids in rows}

    def delete_group(self, group_id: str) -> None:
        cur = self._db.cursor()
        try:
            cur.execute(
                self._q("DELETE FROM db_groups WHERE group_id = ?"),
                (group_id,),
            )
            self._db.commit()
        except BaseException:
            self._db.rollback()
            raise

    def close(self) -> None:
        self._db.close()


def sqlite3_dbapi_connect(database: str):
    """Config-addressable sqlite3 connection factory for
    :class:`DBAPIBroker` (``job_store_dbapi =
    "dungbeetle_spark.broker:sqlite3_dbapi_connect"``): autocommit so
    BEGIN IMMEDIATE owns its transaction, cross-thread handles for the
    claim pool, WAL + busy timeout for multi-process writers. A real
    server deployment points the same seam at its driver instead
    (``psycopg2:connect`` with ``dialect = "postgresql"``)."""
    import sqlite3

    con = sqlite3.connect(
        database, check_same_thread=False, isolation_level=None
    )
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA busy_timeout=10000")
    return con
