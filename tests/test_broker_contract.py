"""Backend-agnostic broker contract (VERDICT r04 item 4).

``BrokerContract`` pins the atomicity obligations any
:class:`dungbeetle_spark.broker.BrokerBackend` must honor for the
distributed job layer to be correct. A new backend (Postgres, Redis)
gets validated by subclassing and implementing :meth:`make_stores` —
nothing else; every test drives the public ``JobStore`` API exactly
the way ``core.py`` does.

``TestSqliteBrokerContract`` binds the contract to the default
file-SQLite backend (and doubles as the regression suite for the
claim/lease/recovery SQL it inherits from pre-refactor jobstore.py).
"""

from __future__ import annotations

import threading
import time

import pytest

from dungbeetle_spark.jobstore import (
    FAILURE,
    PENDING,
    STARTED,
    SUCCESS,
    JobRecord,
    JobStore,
    SingleFlightError,
)


class BrokerContract:
    """Subclass per backend; implement make_stores."""

    def make_stores(self, tmp_path, n: int, **store_kwargs) -> list[JobStore]:
        """Return ``n`` JobStore instances sharing ONE underlying
        backend store (i.e. simulating n processes)."""
        raise NotImplementedError

    # -- delivery -----------------------------------------------------
    def test_concurrent_claim_exactly_once(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        for i in range(30):
            a.create(JobRecord(job_id=f"j{i}", task="t", queue="q"))
        claimed: list[str] = []
        lock = threading.Lock()

        def drain(store: JobStore) -> None:
            while True:
                rec = store.claim(["q"], f"o{id(store)}", lease=60.0)
                if rec is None:
                    return
                with lock:
                    claimed.append(rec.job_id)

        threads = [
            threading.Thread(target=drain, args=(s,))
            for s in (a, b)
            for _ in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(claimed) == sorted(f"j{i}" for i in range(30))

    def test_claim_empty_returns_none(self, tmp_path):
        (a,) = self.make_stores(tmp_path, 1)
        assert a.claim(["q"], "o", lease=60.0) is None

    def test_claim_oldest_first_and_respects_queue_eta_cancel(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        a.create(JobRecord(job_id="newer", task="t", queue="q", created_at=200.0))
        a.create(JobRecord(job_id="older", task="t", queue="q", created_at=100.0))
        a.create(JobRecord(job_id="otherq", task="t", queue="z", created_at=1.0))
        a.create(
            JobRecord(job_id="later", task="t", queue="q", created_at=1.0,
                      eta=time.time() + 3600)
        )
        a.create(JobRecord(job_id="gone", task="t", queue="q", created_at=1.0))
        a.mark_cancelled("gone")
        assert b.claim(["q"], "o").job_id == "older"
        assert b.claim(["q"], "o").job_id == "newer"
        assert b.claim(["q"], "o") is None

    # -- leases -------------------------------------------------------
    def test_fresh_lease_unstealable(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        a.create(JobRecord(job_id="f1", task="t", queue="q"))
        assert a.claim(["q"], "owner-a", lease=60.0).job_id == "f1"
        assert b.claim(["q"], "owner-b", lease=60.0) is None

    def test_stale_lease_reclaimed_once(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        a.create(JobRecord(job_id="s1", task="t", queue="q"))
        assert a.claim(["q"], "owner-a", lease=0.1).job_id == "s1"
        time.sleep(0.25)
        rec = b.claim(["q"], "owner-b", lease=0.1)
        assert rec is not None and rec.job_id == "s1" and rec.owner == "owner-b"

    def test_heartbeat_keeps_lease_alive(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        a.create(JobRecord(job_id="h1", task="t", queue="q"))
        a.claim(["q"], "owner-a", lease=0.3)
        time.sleep(0.2)
        a.heartbeat("owner-a")
        time.sleep(0.2)  # > lease from claim, < lease from heartbeat
        assert b.claim(["q"], "owner-b", lease=0.3) is None

    # -- single-flight ------------------------------------------------
    def test_single_flight_across_stores(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        a.create(JobRecord(job_id="sf", task="t", queue="q"))
        with pytest.raises(SingleFlightError):
            b.create(JobRecord(job_id="sf", task="t", queue="q"))
        # terminal state releases the id
        a.set_state("sf", SUCCESS)
        b.create(JobRecord(job_id="sf", task="t", queue="q"))

    def test_racing_creates_one_winner(self, tmp_path):
        stores = self.make_stores(tmp_path, 4)
        wins, errs = [], []
        barrier = threading.Barrier(len(stores))

        def racer(s: JobStore) -> None:
            barrier.wait()
            try:
                s.create(JobRecord(job_id="race", task="t", queue="q"))
                wins.append(s)
            except SingleFlightError:
                errs.append(s)

        threads = [threading.Thread(target=racer, args=(s,)) for s in stores]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(wins) == 1 and len(errs) == len(stores) - 1

    # -- mutation vs deletion ----------------------------------------
    def test_no_resurrect_after_cross_store_delete(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        a.create(JobRecord(job_id="c1", task="t", queue="q"))
        b.delete("c1")
        assert a.set_state("c1", SUCCESS) is False
        assert not a.exists("c1")

    def test_state_visible_across_stores(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        a.create(JobRecord(job_id="v1", task="t", queue="q"))
        a.set_state("v1", STARTED, owner="owner-a")
        rec = b.get("v1")
        assert rec.state == STARTED and rec.owner == "owner-a"
        b.set_state("v1", SUCCESS, count=7)
        rec2 = a.get("v1")
        assert rec2.state == SUCCESS and rec2.count == 7
        assert rec2.finished_at is not None

    # -- recovery -----------------------------------------------------
    def test_recover_fail_marks_all_inflight(self, tmp_path):
        (a,) = self.make_stores(tmp_path, 1)
        for i in range(40):
            a.create(JobRecord(job_id=f"j{i}", task="t", queue="q"))
            if i % 2 == 0:
                a.claim(["q"], "owner-a", lease=60.0)
        (c,) = self.make_stores(tmp_path, 1, recover="fail")
        for i in range(40):
            rec = c.get(f"j{i}")
            assert rec.state == FAILURE, (i, rec.state)
            assert "restart" in rec.error

    def test_recover_requeue_resets_stale_keeps_live(self, tmp_path):
        (a,) = self.make_stores(tmp_path, 1, requeue_lease=60.0)
        a.create(JobRecord(job_id="live", task="t", queue="q"))
        a.claim(["q"], "owner-a", lease=60.0)
        (d,) = self.make_stores(tmp_path, 1, recover="requeue",
                                requeue_lease=60.0)
        assert d.get("live").state == STARTED  # fresh heartbeat: untouched

        (e,) = self.make_stores(tmp_path, 1, requeue_lease=0.1)
        e.create(JobRecord(job_id="old", task="t", queue="q"))
        e.claim(["q"], "owner-a", lease=0.1)
        time.sleep(0.25)
        (f,) = self.make_stores(tmp_path, 1, recover="requeue",
                                requeue_lease=0.1)
        rec = f.get("old")
        assert rec.state == PENDING and rec.owner == ""

    def test_recover_attach_touches_nothing(self, tmp_path):
        (a,) = self.make_stores(tmp_path, 1)
        a.create(JobRecord(job_id="j1", task="t", queue="q"))
        a.claim(["q"], "owner-a", lease=60.0)
        (b,) = self.make_stores(tmp_path, 1, recover="attach")
        assert b.get("j1").state == STARTED

    # -- listings -----------------------------------------------------
    def test_pending_oldest_first_and_counts(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        a.create(JobRecord(job_id="p2", task="t", queue="q", created_at=2.0))
        a.create(JobRecord(job_id="p1", task="t", queue="q", created_at=1.0))
        a.create(JobRecord(job_id="d1", task="t", queue="q", created_at=0.5))
        a.set_state("d1", SUCCESS)
        assert [r.job_id for r in b.pending("q")] == ["p1", "p2"]
        assert b.counts_by_state() == {PENDING: 2, SUCCESS: 1}

    def test_expired_selection(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        a.create(JobRecord(job_id="e1", task="t", queue="q", ttl=10))
        a.set_state("e1", SUCCESS, result_path="warehouse/e1")
        a.create(JobRecord(job_id="keep", task="t", queue="q", ttl=0))
        a.set_state("keep", SUCCESS, result_path="warehouse/keep")
        future = time.time() + 3600
        assert [r.job_id for r in b.expired(future)] == ["e1"]
        assert b.expired(time.time() - 3600) == []

    # -- groups -------------------------------------------------------
    def test_groups_shared_across_stores(self, tmp_path):
        a, b = self.make_stores(tmp_path, 2)
        for i in range(3):
            a.create(JobRecord(job_id=f"g{i}", task="t", queue="q"))
        a.create_group("grp", ["g0", "g1", "g2"])
        assert b.group_jobs("grp") == ["g0", "g1", "g2"]
        assert b.get("g0").group_id == "grp"
        for i in range(3):
            a.set_state(f"g{i}", SUCCESS)
        assert b.group_state("grp") == SUCCESS
        b.delete_group("grp")
        with pytest.raises(KeyError):
            a.group_jobs("grp")


class TestSqliteBrokerContract(BrokerContract):
    """The default backend, via the persist_path convenience arg."""

    def make_stores(self, tmp_path, n: int, **store_kwargs) -> list[JobStore]:
        path = str(tmp_path / "broker.db")
        kwargs = {"recover": "attach", **store_kwargs}
        return [JobStore(persist_path=path, **kwargs) for _ in range(n)]


class TestSqliteBrokerExplicitBackend(BrokerContract):
    """Same backend passed explicitly via ``backend=`` — pins the
    injection seam a Postgres/Redis implementation would use."""

    def make_stores(self, tmp_path, n: int, **store_kwargs) -> list[JobStore]:
        from dungbeetle_spark.broker import SqliteBroker

        path = str(tmp_path / "broker.db")
        kwargs = {"recover": "attach", **store_kwargs}
        return [
            JobStore(backend=SqliteBroker(path), **kwargs) for _ in range(n)
        ]


class TestDBAPIBrokerContract(BrokerContract):
    """The generic DBAPI backend, driven through the stdlib sqlite3
    DBAPI driver — the same code path a psycopg2-backed multi-machine
    deployment runs (the postgresql dialect swaps paramstyle and uses
    FOR UPDATE SKIP LOCKED row locks in place of BEGIN IMMEDIATE)."""

    def make_stores(self, tmp_path, n: int, **store_kwargs) -> list[JobStore]:
        import sqlite3

        from dungbeetle_spark.broker import DBAPIBroker

        path = str(tmp_path / "dbapi.db")

        def connect():
            con = sqlite3.connect(
                path, check_same_thread=False, isolation_level=None
            )
            con.execute("PRAGMA journal_mode=WAL")
            con.execute("PRAGMA busy_timeout=10000")
            return con

        kwargs = {"recover": "attach", **store_kwargs}
        return [
            JobStore(backend=DBAPIBroker(connect, dialect="sqlite"), **kwargs)
            for _ in range(n)
        ]
