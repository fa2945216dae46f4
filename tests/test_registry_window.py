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
# New r08 queries are appended here as they land (each must also be
# inserted at the top of DRIVER_PRIORITY).
NEVER_VERIFIED: list[str] = [
    "url_canonicalize",  # new in r08
    "epoch_ngram_novelty",  # new in r08
    "longest_dup_substring",  # new in r08
    "winnowing_fingerprints",  # new in r08
    "corpus_snapshot_diff",  # new in r08
    "embedding_drift_by_epoch",  # new in r08
    "shard_plan",  # new in r08
    "quality_threshold_calibration",  # new in r08
    "ann_recall_calibration",  # new in r08
    "length_matched_controls",  # new in r08
    "contamination_attribution",  # new in r08
    "boilerplate_lines",  # new in r08
    "script_mix_profile",  # new in r08
    "tokenizer_fertility",  # new in r08
    "context_window_waste",  # new in r08
    "split_leakage_audit",  # new in r08
    "rare_token_retention",  # new in r08
    "dedup_minhash_incremental",  # new in r08
    "token_freq_spectrum",  # new in r08
    "hard_negative_mining",  # new in r08
    "streaming_minhash_ingest_gate",  # new in r08
    "paragraph_dedup",  # new in r08
    "embedding_outlier_prune",  # new in r08
    "kl_divergence_by_source",  # new in r08
    "pmi_collocations",  # new in r08
    "lang_segments",  # new in r08
    "image_phash_dedup",  # new in r08
    "audio_fingerprint_dedup",  # new in r08
    "shard_interleave_audit",  # new in r08
    "hll_register_sketch",  # new in r08
    "template_spam_clusters",  # new in r08
    "split_doc_stitch",  # new in r08
    "streaming_hll_registers",  # new in r08
    "bpe_merge_ranks",  # new in r08
    "lsh_band_planner",  # new in r08
    "quality_gate_shadow_audit",  # new in r08
    "bpe_compression_by_source",  # new in r08
    "cross_source_ce_matrix",  # new in r08
    "corpus_fate_manifest",  # new in r08
    "lang_label_noise_audit",  # new in r08
]

# Operators whose code or oracle changed in round 8.
CHANGED_THIS_ROUND: list[str] = [
    # decode pass refactored onto the shared media_features dispatcher
    # (one feature contract for BMP/WAV hand parsers + pillow path)
    "multimodal_real_decode",
]

# The r08 rotation (VERDICT r07 item 3): pure staleness repayment —
# the 6 queries whose last green row is r04 (displaced from the r07
# window by the new>stale rule) plus the 3 oldest r05 greens, all
# code-unchanged (the cohort shrank from 44 as the 35 late-r08
# queries displaced its tail). user_value_trend, vocab_growth and
# zorder_layout_stats wait at the front of the r09 queue with the
# displaced names below; the local oracle suite still re-verifies
# all of them every run.
ROTATED_IN_R08 = [
    "cube_order_stats",
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "token_count",
    "token_length_histogram",
    "ab_test_significance",
    "activity_streaks",
    "ann_ivf",
    # displaced to r09 (new/changed > stale): unpivot_user_metrics by
    # multimodal_real_decode; streaming_quality_filter /
    # timeseries_topk_similar_users / triangle_cohorts /
    # sequence_pack / source_lang_drift / semdedup /
    # scd2_user_type_history / repetition_stats /
    # recursive_daily_spine / quality_filter_funnel /
    # q12_shipping_delay by the eleven mid-round r08 queries;
    # pareto_revenue_share / pagerank_trade_graph /
    # ordered_set_event_stats / multimodal_feature_stats by the
    # cleaning quartet (boilerplate_lines, script_mix_profile,
    # tokenizer_fertility, context_window_waste);
    # listagg_nation_suppliers / lateral_topk_orders by the
    # eval-hygiene pair (split_leakage_audit, rare_token_retention);
    # join_cardinality_forecast / join_skew_profile / kmeans_clusters
    # by the ingest/curation trio (dedup_minhash_incremental,
    # token_freq_spectrum, hard_negative_mining);
    # interevent_gap_histogram by streaming_minhash_ingest_gate;
    # incremental_agg_maintenance / integrity_audit by the curation
    # pair (paragraph_dedup, embedding_outlier_prune);
    # hybrid_rrf_retrieval by kl_divergence_by_source;
    # fuzzy_join_customers by pmi_collocations;
    # funnel_time_bounded by lang_segments;
    # frequent_item_pairs by image_phash_dedup;
    # events_variant_stats by audio_fingerprint_dedup;
    # event_transition_matrix by shard_interleave_audit;
    # dsir_importance_weights by hll_register_sketch;
    # dedup_simhash by template_spam_clusters;
    # dedup_minhash_lsh by split_doc_stitch;
    # dedup_exact_substring by streaming_hll_registers;
    # dedup_embedding_cosine by bpe_merge_ranks;
    # dedup_canonical_keep by lsh_band_planner;
    # cross_source_overlap_matrix by quality_gate_shadow_audit;
    # collated_event_type_counts by bpe_compression_by_source;
    # bitmap_distinct_users by cross_source_ce_matrix;
    # anomaly_daily_zscore by corpus_fate_manifest;
    # ann_lsh_bucketed by lang_label_noise_audit
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
        for n in NEVER_VERIFIED + CHANGED_THIS_ROUND + ROTATED_IN_R08
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
