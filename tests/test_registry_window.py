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

# After r04 every query has had at least one driver row (VERDICT r04);
# the only one without a hash-green row ever is the rows-only-by-design
# HLL sketch — it stays windowed so its rows-check never goes stale.
NEVER_VERIFIED = ["sketch_user_stats"]

# Operators whose code or oracle changed in round 5: q12's oracle
# casts, the five rows-only → oracle conversions (md5_hash60 hashing),
# and the similarity-module neighbors sharing the changed
# _signatures/_plane_matrix helpers.
CHANGED_THIS_ROUND = [
    "repetition_stats",  # new in r05
    "semdedup",  # new in r05
    "kmeans_clusters",  # new in r05
    "dedup_exact_substring",  # new in r05
    "dsir_importance_weights",  # new in r05
    "quality_filter_funnel",  # new in r05
    "fuzzy_join_customers",  # new in r05
    "streaming_quality_filter",  # new in r05
    "cross_source_overlap_matrix",  # new in r05
    "curriculum_buckets",  # new in r05
    "lateral_topk_orders",  # new in r05
    "unpivot_user_metrics",  # new in r05
    "listagg_nation_suppliers",  # new in r05
    "ordered_set_event_stats",  # new in r05
    "recursive_daily_spine",  # new in r05
    "activity_streaks",  # new in r05
    "events_variant_stats",  # new in r05
    "collated_event_type_counts",  # new in r05
    "pagerank_trade_graph",  # new in r05
    "dedup_canonical_keep",  # new in r05
    "timeseries_topk_similar_users",  # new in r05
    "event_transition_matrix",  # new in r05
    "zorder_layout_stats",  # new in r05
    "join_skew_profile",  # new in r05
    "anomaly_daily_zscore",  # new in r05
    "incremental_agg_maintenance",  # new in r05
    "triangle_cohorts",  # new in r05
    "streaming_incremental_mv",  # new in r05
    "hybrid_rrf_retrieval",  # new in r05
    "bitmap_distinct_users",  # new in r05
    "funnel_time_bounded",  # new in r05
    "vocab_growth",  # new in r05
    "source_lang_drift",  # new in r05
    "scd2_user_type_history",  # new in r05
    "join_cardinality_forecast",  # new in r05
    "frequent_item_pairs",  # new in r05
    "ab_test_significance",  # new in r05
    "pareto_revenue_share",  # new in r05
    "integrity_audit",  # new in r05
    "interevent_gap_histogram",  # new in r05
    "user_value_trend",  # new in r05
    "q12_shipping_delay",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "multimodal_feature_stats",
    "sequence_pack",
    "ann_lsh_bucketed",
    "ann_ivf",
    "dedup_embedding_cosine",
]


def test_priority_names_exist_and_unique():
    specs = registry()
    unknown = [n for n in DRIVER_PRIORITY if n not in specs]
    assert not unknown, f"DRIVER_PRIORITY names not in registry: {unknown}"
    assert len(DRIVER_PRIORITY) == len(set(DRIVER_PRIORITY))


def test_window_covers_unverified_and_changed():
    window = list(registry())[:DRIVER_WINDOW]
    missing = [n for n in NEVER_VERIFIED + CHANGED_THIS_ROUND if n not in window]
    assert not missing, f"outside the driver's first-{DRIVER_WINDOW} window: {missing}"


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
