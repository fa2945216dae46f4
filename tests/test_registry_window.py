"""Driver-window ordering invariants.

The driver's CORRECTNESS harness verifies exactly the FIRST 50 entries
of ``queries()`` per round. ``DRIVER_PRIORITY`` (queries.py) owns that
window; these tests pin that (a) the list stays in sync with the
registry, and (b) the queries that most need a verification row —
never-verified through r03, plus anything changed this round — are
actually inside the window.
"""

from __future__ import annotations

from dungbeetle_spark.queries import DRIVER_PRIORITY, registry

DRIVER_WINDOW = 50

# After r06's sketch_user_stats rework every registry query is
# oracle-backed; nothing is rows-only-by-design any more, and every
# query has had at least one driver row (VERDICT r05).
NEVER_VERIFIED: list[str] = []

# Operators whose code or oracle changed in round 6, plus the nine
# new r06 queries. (anomaly_daily_zscore had a doc-only reword — no
# code/oracle bytes changed — so it keeps its r05 green.)
CHANGED_THIS_ROUND = [
    "sketch_user_stats",  # rows-only → checked form w/ full oracle
    "streaming_incremental_mv",  # MV accumulator widened to dec(38,2)
    "rfm_segments",  # new in r06
    "chisq_dow_independence",  # new in r06
    "session_path_topk",  # new in r06
    "mad_outliers",  # new in r06
    "dedup_savings_report",  # new in r06
    "dedup_containment",  # new in r06
    "readability_scores",  # new in r06
    "skipgram_pairs",  # new in r06
    "source_epoch_allocation",  # new in r06
]

# The r05-window displacement debt paid this round: these 39 queries'
# only prior driver rows were r03 (VERDICT r05 item 1); all are in
# the r06 window.
ROTATED_IN_R06 = [
    "dedup_ngram_jaccard",
    "distinct_part_suppliers",
    "doc_chunking",
    "embedding_array_stats",
    "events_json_extract",
    "gap_fill_daily",
    "hash_split_train_test",
    "heavy_hitters",
    "interval_overlap",
    "moving_avg_user_value",
    "order_priority_count",
    "parts_never_shipped",
    "pivot_event_counts",
    "profile_orders_columns",
    "profit_entries",
    "profit_entries_by_date",
    "profit_summary",
    "q10_returned_items",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q1_pricing_summary",
    "q22_idle_customers",
    "q2_min_price_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "rollup_sales",
    "salted_segment_activity",
    "stratified_sample",
    "text_stats",
    "tfidf_top_terms",
    "top_events_per_user",
    "udaf_median_value",
    "user_activity_stats",
    "user_event_sequence",
    "window_rank_family",
]


def test_priority_names_exist_and_unique():
    specs = registry()
    unknown = [n for n in DRIVER_PRIORITY if n not in specs]
    assert not unknown, f"DRIVER_PRIORITY names not in registry: {unknown}"
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY))


def test_window_covers_unverified_and_changed():
    window = list(registry())[:DRIVER_WINDOW]
    missing = [
        n
        for n in NEVER_VERIFIED + CHANGED_THIS_ROUND + ROTATED_IN_R06
        if n not in window
    ]
    assert not missing, f"outside the driver's first-{DRIVER_WINDOW} window: {missing}"


def test_all_queries_oracle_backed():
    """Since the r06 sketch rework, zero rows-only queries remain: the
    HLL/quantile sketch emits exact twin columns plus error-bound
    booleans the oracle pins to TRUE. A new rows-only query needs a
    written justification here before it may regress this."""
    missing = [n for n, s in registry().items() if not s.oracle]
    assert not missing, f"queries without a DuckDB oracle: {missing}"


def test_registry_is_priority_prefixed():
    names = list(registry())
    assert names[: len(DRIVER_PRIORITY)] == DRIVER_PRIORITY


def test_operators_md_in_sync():
    """OPERATORS.md is generated from the registry; its Total line
    drifting from len(registry()) was a VERDICT r03 finding. Any
    registry change must rerun tools/gen_operators.py."""
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


def test_window_covers_all_never_green_queries():
    """Mechanical form of the rotation rule, computed from the
    RECORDED driver files rather than a hand-maintained list: any
    query that has never earned a full hash-green driver row must sit
    inside the current 50-entry window (tools/window_rotation.py
    prints the full staleness ranking for the next rotation)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import window_rotation

    last = window_rotation.last_green_by_query()
    window = list(registry())[:DRIVER_WINDOW]
    never = [n for n, rnd in last.items() if rnd is None]
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"never-driver-verified queries outside the window: {missing}"
    )
