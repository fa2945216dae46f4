"""Non-hollowness invariants for the round-5 operators.

Value correctness is covered by test_queries_oracle.py (all five are
fully oracle-backed); these pin what a value-match alone can't see —
that each operator's discriminating machinery actually FIRES on the
fixture (the hollow-check lesson from multimodal_feature_stats r04):
k-means actually moves vectors between rounds, the planted boilerplate
actually flags substring dups, DSIR actually prefers the target
language, every funnel rule actually drops documents, and the blocked
fuzzy join actually finds distance-1 (not just distance-0) pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dungbeetle_spark.queries import registry

SPECS = registry()


def _rows(spark, sf_oracle, name):
    return SPECS[name].build(spark, sf_oracle).collect()


def test_kmeans_iteration_moves_vectors_and_fills_clusters(spark, sf_oracle):
    rows = _rows(spark, sf_oracle, "kmeans_clusters")
    moved = sum(1 for r in rows if r.moved)
    assert 0 < moved < len(rows), "the Lloyd update must reassign SOME vectors"
    finals = {r.cluster_final for r in rows}
    assert finals == set(range(8)), "all 8 centroids keep members"
    assert all(r.dist2_final >= 0 for r in rows)


def test_exact_substring_flags_planted_boilerplate(spark, sf_oracle):
    rows = {r.doc_id: r for r in _rows(spark, sf_oracle, "dedup_exact_substring")}
    planted = [r for d, r in rows.items() if d % 7 == 0]
    unplanted = [r for d, r in rows.items() if d % 7 != 0]
    # every planted doc carries duplicated windows (the shared passage)
    assert all(r.n_dup_windows > 0 for r in planted)
    # and the passage dominates short docs: most planted docs flag
    assert sum(1 for r in planted if r.flagged) > len(planted) * 0.5
    # natural (unplanted) dups exist but flag far less often
    plant_rate = sum(r.flagged for r in planted) / len(planted)
    nat_rate = sum(r.flagged for r in unplanted) / len(unplanted)
    assert nat_rate < plant_rate


def test_dsir_prefers_target_language(spark, sf_oracle):
    rows = _rows(spark, sf_oracle, "dsir_importance_weights")
    en = [r for r in rows if r.lang == "en"]
    other = [r for r in rows if r.lang != "en"]
    en_rate = sum(r.selected for r in en) / len(en)
    other_rate = sum(r.selected for r in other) / len(other)
    assert en_rate > 2 * other_rate, (en_rate, other_rate)


def test_funnel_every_rule_fires_and_reasons_partition(spark, sf_oracle):
    rows = _rows(spark, sf_oracle, "quality_filter_funnel")
    reasons = {r.reason for r in rows}
    assert reasons == {
        "kept",
        "too_short",
        "too_long",
        "word_length",
        "low_stopword",
    }, "every rule (and the kept path) must fire on the fixture"
    # keep is exactly reason == 'kept' — verdicts partition
    assert all(r.keep == (r.reason == "kept") for r in rows)
    # low_stopword is en-only by construction
    assert all(r.lang == "en" for r in rows if r.reason == "low_stopword")


def test_fuzzy_join_finds_distance_one_pairs_only(spark, sf_oracle):
    rows = _rows(spark, sf_oracle, "fuzzy_join_customers")
    assert rows, "blocked join must surface candidate pairs"
    # names are unique, so distance 0 is impossible and the threshold
    # caps at 1: every pair the blocks surface is a REAL fuzzy match
    assert all(r.dist == 1 for r in rows)
    # symmetric dedup held: (a, b) appears once, always a < b
    keys = [(r.custkey_a, r.custkey_b) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_cross_source_matrix_planted_boilerplate_everywhere(spark, sf_oracle):
    rows = _rows(spark, sf_oracle, "cross_source_overlap_matrix")
    assert rows, "planted passage guarantees a non-empty matrix"
    pairs = {(r.source_a, r.source_b) for r in rows}
    assert all(a < b for a, b in pairs)
    # the planted passage reaches most sources: the matrix is dense
    srcs = {s for p in pairs for s in p}
    assert len(srcs) >= 15
    assert all(r.n_shared_windows > 0 for r in rows)


def test_curriculum_stages_are_balanced_and_ordered(spark, sf_oracle):
    rows = _rows(spark, sf_oracle, "curriculum_buckets")
    from collections import Counter

    sizes = Counter(r.stage for r in rows)
    assert set(sizes) == {1, 2, 3, 4}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # NTILE balance
    # stages are ordered by difficulty: every stage-k doc is <= every
    # stage-(k+1) doc
    by_stage = {
        k: [r.difficulty for r in rows if r.stage == k] for k in sizes
    }
    for k in (1, 2, 3):
        assert max(by_stage[k]) <= min(by_stage[k + 1])
    # the rarity signal spreads scores (not a constant column; the
    # fixture's ~40-word vocabulary keeps the spread coarse)
    assert len({r.difficulty for r in rows}) > 10


def test_pagerank_conserves_mass_and_separates_degrees(spark, sf_oracle):
    """Non-hollowness for pagerank_trade_graph: the iteration must
    actually redistribute rank (not return the uniform prior), keep
    every node at least the teleport floor, and approximately conserve
    total mass (floor divisions only ever LOSE micros, so the total
    sits just under n x 1e6 but must stay within 1% of it — a sum far
    below that would mean contributions are being dropped, far above
    would mean double-counted)."""
    rows = _rows(spark, sf_oracle, "pagerank_trade_graph")
    n = len(rows)
    ranks = [r.rank_micros for r in rows]
    assert all(r >= 150_000 for r in ranks), "teleport floor violated"
    assert len({r for r in ranks}) > 1, "iteration left ranks uniform"
    total = sum(ranks)
    assert 0.99 * n * 1_000_000 <= total <= n * 1_000_000
    # bipartite sanity: both sides present, keys land in their tables'
    # ranges, and high-degree suppliers out-rank the customer median
    by_type = {}
    for r in rows:
        by_type.setdefault(r.node_type, []).append(r.rank_micros)
    assert set(by_type) == {"customer", "supplier"}
    cust = sorted(by_type["customer"])
    supp = by_type["supplier"]
    # suppliers aggregate many customers' mass: their MEAN rank must
    # exceed the customer median (degree asymmetry actually expressed)
    assert sum(supp) / len(supp) > cust[len(cust) // 2]


def test_activity_streaks_bounds_and_coverage(spark, sf_oracle):
    """Streak invariants the oracle can't distinguish from luck: every
    user's longest streak is within the corpus's 30-day span, every
    user has at least one streak, the user set matches the active-user
    population exactly, and the fixture actually exercises BOTH
    regimes — users with gaps (n_streaks > 1) and users with an
    unbroken run."""
    rows = _rows(spark, sf_oracle, "activity_streaks")
    active_users = {
        r.user_id
        for r in SPECS["user_activity_stats"].build(spark, sf_oracle).collect()
    }
    assert rows, "no users"
    assert all(1 <= r.longest_streak <= 31 for r in rows)
    assert all(r.n_streaks >= 1 for r in rows)
    assert any(r.n_streaks > 1 for r in rows), "fixture has no gapped users"
    assert any(r.n_streaks == 1 for r in rows), "fixture has no unbroken users"
    assert active_users == {r.user_id for r in rows}


def test_canonical_keep_quality_actually_decides(spark, sf_oracle):
    """Non-hollowness for dedup_canonical_keep: exactly one keeper per
    component, singletons keep themselves — and the QUALITY criterion
    must actually fire: at least one multi-doc component's keeper is
    NOT its minimum doc_id (otherwise the operator degenerates to
    min-id selection and the quality join proves nothing)."""
    rows = _rows(spark, sf_oracle, "dedup_canonical_keep")
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    assert all(sum(1 for r in ms if r.keep) == 1 for ms in by_comp.values())
    multi = {c: ms for c, ms in by_comp.items() if len(ms) > 1}
    assert multi, "fixture has no duplicate clusters"
    keepers = {c: next(r for r in ms if r.keep) for c, ms in multi.items()}
    # keeper holds the max quality of its component
    for c, ms in multi.items():
        assert keepers[c].quality == max(r.quality for r in ms)
    assert any(
        k.doc_id != min(r.doc_id for r in multi[c]) for c, k in keepers.items()
    ), "quality never overrode min-id — the criterion is hollow on this fixture"


def test_zorder_zone_ids_match_python_morton_for_pre_anchor_dates(spark, tmp_path):
    """Regression (r05 review): datediff is int32 in Spark, and the
    y-spread must be widened to int64 BEFORE shiftleft or bit 15 of
    the masked day wraps the zone id negative. Pre-anchor (1992) and
    far-future dates exercise exactly that bit; zone ids must equal a
    pure-Python int64 Morton model."""
    import datetime

    from dungbeetle_spark.operators.layout import _SPREAD_STEPS
    from dungbeetle_spark.queries import registry

    def spread(v: int) -> int:
        for shift, mask in _SPREAD_STEPS:
            v = (v | (v << shift)) & mask
        return v

    anchor = datetime.date(1995, 1, 1)
    rows = []
    for custkey, day in [(7, datetime.date(1992, 3, 1)),   # day_idx < 0
                         (9, datetime.date(1995, 1, 2)),   # tiny positive
                         (65535, datetime.date(2085, 6, 1))]:  # bit 15 set
        rows.append((custkey, datetime.datetime.combine(day, datetime.time())))
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp")
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["zone_id"]: (r["min_custkey"], r["min_day"])
        for r in registry()["zorder_layout_stats"].build(spark, str(tmp_path)).collect()
    }
    for custkey, ts in rows:
        day_idx = (ts.date() - anchor).days
        z = spread(custkey & 65535) | (spread(day_idx & 65535) << 1)
        zone = z >> 14
        assert zone in got, f"zone {zone} missing (custkey={custkey})"
        # zone maps must carry the real dimension values, not just ids
        assert got[zone] == (custkey, day_idx)


def test_integrity_audit_immune_to_duplicate_dimension_keys(spark, tmp_path):
    """Regression (r05 review): n_rows/n_nulls must come from the fact
    table alone — a LEFT-join-based count inflates on duplicated
    dimension primary keys, which is exactly the corruption the audit
    exists to catch."""
    import shutil

    from dungbeetle_spark.queries import registry
    from dungbeetle_spark.sources.catalog import load_tables

    src = "/root/testdata/sf0.001"
    for t in ("orders", "lineitem", "customer", "part"):
        shutil.copy(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    # corrupt the customer dimension: duplicate one primary key
    cust = load_tables(spark, src, ["customer"])["customer"]
    cust.unionAll(cust.limit(1)).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    n_orders = load_tables(spark, src, ["orders"])["orders"].count()
    rows = {
        r["constraint_name"]: r
        for r in registry()["integrity_audit"].build(spark, str(tmp_path)).collect()
    }
    audit = rows["orders.o_custkey->customer"]
    assert audit["n_rows"] == n_orders, "duplicate dim key inflated n_rows"
    assert audit["n_orphans"] == 0


def test_calendar_zscore_zero_fills_gaps_and_alerts_on_return(spark, tmp_path):
    """anomaly_calendar_zscore vs its active-day sibling: a silent
    week must LOWER the calendar baseline (zero-filled days enter the
    trailing frame), so an ordinary-volume return day alerts — the
    case the ROWS-over-active-days form cannot see (its frame skips
    the gap entirely). sf0.01 is gap-free, so this builds the sparse
    case directly."""
    import datetime

    from dungbeetle_spark.queries import registry

    # type 'a': active daily for 10 days at 100 ev/day, then 7 silent
    # days, then one ordinary 100-ev day (day 17). Calendar semantics:
    # day-17 baseline is 6 zeros + itself -> huge spike. Active-day
    # semantics: baseline is 7 flat 100s -> no spike.
    rows = []
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    eid = 0
    for d in list(range(10)) + [17]:
        for i in range(100):
            rows.append(
                (eid, base + datetime.timedelta(days=d), 1, "a", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    cal = {
        r["day"]: r
        for r in registry()["anomaly_calendar_zscore"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert len(cal) == 18, "dense spine: first..last day inclusive"
    gap_day = datetime.date(2024, 1, 11)
    assert cal[gap_day]["cnt"] == 0, "silent day zero-fills"
    ret_day = datetime.date(2024, 1, 18)
    assert cal[ret_day]["trail_sum"] == 100, "baseline saw the quiet week"
    assert cal[ret_day]["is_spike"], "return-to-normal day must alert"

    active = {
        r["day"]: r
        for r in registry()["anomaly_daily_zscore"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert len(active) == 11, "active-day form has no gap rows"
    assert not active[ret_day]["is_spike"], (
        "active-day frame skips the gap — flat baseline, no alert"
    )
