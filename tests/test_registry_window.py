"""Driver-window ordering invariants.

The driver's CORRECTNESS harness verifies exactly the FIRST 50 entries
of ``queries()`` per round. Since r09 the window is COMPUTED by
``queries.driver_priority()`` from the recorded CORRECTNESS_r*.json
driver rows (single source of truth — VERDICT r08 item 6); the only
hand-maintained input is ``queries.NEW_OR_CHANGED``. These tests pin
the mechanical properties of that computation rather than duplicating
the list: never-green and new/changed queries must occupy the window,
and nothing inside the window may be fresher than anything left
outside it.
"""

from __future__ import annotations

from dungbeetle_spark.queries import (
    NEW_OR_CHANGED,
    driver_priority,
    last_green_by_query,
    registry,
)

DRIVER_WINDOW = 50


def test_new_or_changed_names_exist_and_unique():
    specs = registry()
    unknown = [n for n in NEW_OR_CHANGED if n not in specs]
    assert not unknown, f"NEW_OR_CHANGED names not in registry: {unknown}"
    assert len(NEW_OR_CHANGED) == len(set(NEW_OR_CHANGED))


def test_registry_order_is_driver_priority():
    assert list(registry()) == driver_priority()


def test_window_covers_new_changed_and_never_green():
    """Any query without a full hash-green driver row, and anything
    added/changed this round, must sit inside the 50-entry window."""
    window = set(list(registry())[:DRIVER_WINDOW])
    last = last_green_by_query()
    never = [n for n, rnd in last.items() if rnd is None]
    missing = [n for n in set(never) | set(NEW_OR_CHANGED) if n not in window]
    assert not missing, f"outside the driver's window: {missing}"
    # Window-budget invariant: the computed head must fit. If this
    # fires, this round added more new/changed + never-green queries
    # than the driver can verify — prefer depth over count.
    assert len(set(never) | set(NEW_OR_CHANGED)) <= DRIVER_WINDOW


def test_window_fill_is_stalest_first():
    """No query outside the window may be staler than one inside it
    (new/changed excepted — they jump the queue by rule)."""
    names = list(registry())
    last = last_green_by_query()
    inside = [
        last[n] for n in names[:DRIVER_WINDOW]
        if n not in set(NEW_OR_CHANGED) and last[n] is not None
    ]
    outside = [last[n] for n in names[DRIVER_WINDOW:]]
    assert all(r is not None for r in outside), (
        "never-green query outside the window"
    )
    if inside and outside:
        assert max(inside) <= min(r for r in outside if r is not None), (
            f"window holds r{max(inside)} greens while r"
            f"{min(r for r in outside if r is not None)} waits outside"
        )


def test_all_queries_oracle_backed():
    """Since the r06 sketch rework, zero rows-only queries remain: the
    HLL/quantile sketch emits exact twin columns plus error-bound
    booleans the oracle pins to TRUE. A new rows-only query needs a
    written justification here before it may regress this."""
    missing = [n for n, s in registry().items() if not s.oracle]
    assert not missing, f"queries without a DuckDB oracle: {missing}"


def test_operators_md_in_sync():
    """OPERATORS.md is generated from the registry; its Total line
    drifting from len(registry()) was a VERDICT r03 finding. Any
    registry change must rerun tools/gen_operators.py.

    Since r10 the rendering is in stable name order, independent of
    the CORRECTNESS_r*.json artifact set on disk — the driver drops
    each round's artifact after the builder's last commit, which made
    an order-dependent rendering (and this test) red at the start of
    every round by construction (VERDICT r09 item 1). Exact string
    compare is therefore safe again."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import gen_operators

    path = os.path.join(os.path.dirname(__file__), "..", "OPERATORS.md")
    with open(path) as f:
        on_disk = f.read()
    assert on_disk == gen_operators.render(), (
        "OPERATORS.md is stale — run: python tools/gen_operators.py"
    )


def test_operators_md_row_order_is_stable_name_order():
    """The generated catalog must not depend on the mutable
    CORRECTNESS artifact set: rows render in sorted-name order, so a
    driver artifact landing after the last commit cannot invalidate
    the committed file (VERDICT r09 item 1)."""
    import os
    import re
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import gen_operators

    rows = re.findall(r"^\| \d+ \| `([^`]+)` \|", gen_operators.render(), re.M)
    assert rows == sorted(rows)
    assert set(rows) == set(registry())
