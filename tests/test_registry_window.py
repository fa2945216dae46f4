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

# Every registry query is oracle-backed and has had at least one
# driver row; "never verified" only holds brand-new queries now.
NEVER_VERIFIED: list[str] = [
    "anomaly_calendar_zscore",  # new in r07
    "token_gini_by_source",  # new in r07
    "dedup_cluster_histogram",  # new in r07
    "minhash_calibration",  # new in r07
    "ann_pq",  # new in r07
    "bloom_decontamination",  # new in r07
    "dataset_mix_temperature",  # new in r07
    "char_bigram_surprisal",  # new in r07
]

# Operators whose code or oracle changed in round 7.
CHANGED_THIS_ROUND = [
    "curriculum_buckets",  # global NTILE -> ranks.global_ntile prefix-sum
    "rfm_segments",  # three global NTILEs -> prefix-sum passes
    "sketch_user_stats",  # exact percentile split out of sketch aggregate
]

# The r04-staleness debt paid this round (VERDICT r06 item 4): 39 of
# the 44 queries whose last green row was r04, all code-unchanged, all
# in the r07 window so no green goes stale past two rounds. Five —
# doc_fingerprint, quality_score, lang_id, token_count,
# token_length_histogram — are displaced to r08 by the new>stale rule
# (the eight NEVER_VERIFIED queries outrank a code-unchanged stale
# green); they stay covered by the local oracle suite meanwhile.
ROTATED_IN_R07 = [
    "ann_cosine_topk",
    "asof_click_attribution",
    "cohort_retention",
    "corpus_clean",
    "countmin_sketch",
    "cube_order_stats",
    "customer_set_ops",
    "customer_status_except_all",
    "dataset_mix_weighted",
    "decontamination",
    "dedup_components",
    "dedup_exact",
    "dedup_incremental",
    "domain_quota_sample",
    "embedding_quantize",
    "funnel_conversion",
    "grouping_sets_sales",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "pii_scrub_stats",
    "q11_important_parts",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q17_small_quantity_revenue",
    "q20_qualified_suppliers",
    "q21_latest_shippers",
    "q8_market_share",
    "q9_product_profit",
    "range_join_order_context",
    "sessionize_events",
    "streaming_distinct_daily",
    "streaming_segment_volume",
    "streaming_sessionize",
    "streaming_stream_stream_join",
    "streaming_windowed_counts",
    "time_rollup_events",
    "udtf_sentences",
    "user_value_outliers",
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
        for n in NEVER_VERIFIED + CHANGED_THIS_ROUND + ROTATED_IN_R07
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
