"""Pin the driver contract in ``__spark_entry__.py``.

The round driver smoke-checks ``entry(spark)`` (runs, >=0 rows, stable
schema) and zips ``queries()`` with ``oracle_sql()``. Nothing in the
local suite drove ``entry`` itself until r07 — a regression there
would surface only in the driver's per-round artifact, after the
round closed. These tests are that missing local gate.
"""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_runs_and_returns_rows(spark):
    df = E.entry(spark)
    # Stable schema the driver hashes against: names + order matter.
    assert [f.name for f in df.schema.fields] == ["total", "entry_date"]
    rows = df.collect()
    assert len(rows) > 0
    # The flagship is the reference's get_profit_summary shape mapped
    # onto events (SUM(amount) per day): totals must be non-null.
    assert all(r["total"] is not None for r in rows)


def test_entry_is_rerunnable(spark):
    """The driver may call entry() more than once in a round (retry
    after a transient failure). The job pipeline inside must not
    single-flight-collide with its own previous run or leak temp
    state: a second call returns the same result set."""
    a = {(r["entry_date"], r["total"]) for r in E.entry(spark).collect()}
    b = {(r["entry_date"], r["total"]) for r in E.entry(spark).collect()}
    assert a == b


def test_registry_shape_matches_driver_expectations():
    qs, osql = E.queries(), E.oracle_sql()
    # Every oracle key must have a query; every query should carry an
    # oracle (the registry has been 100% oracle-backed since r06 — a
    # rows-only entry reappearing is a coverage regression).
    assert set(osql) == set(qs)
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
