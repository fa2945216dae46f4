"""Invariant tests for the dataset-assembly operators
(operators/mixing.py). Value correctness vs DuckDB is covered by
test_queries_oracle.py; these pin the properties the oracle can't
see: CMS accuracy bounds, guaranteed non-hollow contamination,
mixture proportions, and plan shape (broadcast membership, no corpus
shuffle for the mix filter).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dungbeetle_spark.operators.mixing import (
    _CMS_WIDTH,
    _EVAL_MOD,
    _MIX_SHARES,
    _PLANT_MOD,
    cms_estimate,
)
from dungbeetle_spark.queries import registry
from dungbeetle_spark.sources.catalog import load_tables

SPECS = registry()


def test_countmin_never_underestimates(spark, sf_oracle):
    """The CMS one-sided guarantee: every point estimate >= the true
    count, and overestimates stay within a loose eps*N bound."""
    sketch = SPECS["countmin_sketch"].build(spark, sf_oracle)
    docs = load_tables(spark, sf_oracle, ["documents"])["documents"]
    tok = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z0-9]+"), lambda x: x != ""
            )
        ).alias("token")
    )
    exact = tok.groupBy("token").count()
    n_total = tok.count()
    est = cms_estimate(sketch, exact.select("token"))
    joined = {
        r.token: (r["count"], r.est)
        for r in exact.join(est, "token").collect()
    }
    assert joined, "hollow test: no tokens"
    margin = 5 * n_total / _CMS_WIDTH
    for token, (true, est_n) in joined.items():
        assert est_n >= true, (token, true, est_n)
        assert est_n - true <= margin, (token, true, est_n, margin)


def test_countmin_sketch_is_bounded(spark, sf_oracle):
    """Sketch size is depth x width regardless of corpus size — the
    mergeable-summary property that makes it usable at 100 TB."""
    sketch = SPECS["countmin_sketch"].build(spark, sf_oracle).collect()
    assert 0 < len(sketch) <= 4 * _CMS_WIDTH
    # total mass per depth equals the corpus token count
    per_depth = {}
    for r in sketch:
        per_depth[r.depth] = per_depth.get(r.depth, 0) + r.n
    assert len(set(per_depth.values())) == 1, per_depth


def test_decontamination_catches_planted_overlap(spark, sf_oracle):
    """Every training doc carrying a planted benchmark passage must be
    flagged (the passage's grams are in the eval set by construction)
    — and clean docs must not all be flagged."""
    df = SPECS["decontamination"].build(spark, sf_oracle)
    rows = {r.doc_id: r for r in df.collect()}
    assert rows
    planted = [
        d for d in rows if d % _PLANT_MOD == 0 and d % _EVAL_MOD != 0
    ]
    assert planted, "fixture too small: no planted training docs"
    for d in planted:
        assert rows[d].is_contaminated, f"planted doc {d} not flagged"
        assert rows[d].n_contaminated > 0
    # eval docs never appear on the training side
    assert all(d % _EVAL_MOD != 0 for d in rows)
    flagged = sum(1 for r in rows.values() if r.is_contaminated)
    assert flagged < len(rows), "everything flagged — check broadcast side"


def test_dataset_mix_hits_target_shares(spark, sf_oracle):
    """Output language proportions land near the configured shares
    (md5-threshold sampling is binomial around the rate), and the
    binding language is kept ~whole."""
    docs = load_tables(spark, sf_oracle, ["documents"])["documents"]
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    mix = SPECS["dataset_mix_weighted"].build(spark, sf_oracle)
    kept = {r.lang: r["count"] for r in mix.groupBy("lang").count().collect()}
    n_out = sum(kept.values())
    assert n_out > 0
    for lang, share in _MIX_SHARES.items():
        got = kept.get(lang, 0) / n_out
        assert abs(got - share) < 0.08, (lang, got, share)
    # the binding language is the one with min(n/share): kept whole
    binding = min(_MIX_SHARES, key=lambda l: totals[l] / _MIX_SHARES[l])
    assert kept[binding] >= 0.95 * totals[binding]
    # deterministic: same fate on re-run
    again = {r.lang: r["count"] for r in mix.groupBy("lang").count().collect()}
    assert again == kept


def test_mix_filter_plan_broadcasts_rates(spark, sf_oracle):
    """The corpus side of the mix must not shuffle: the rate table is
    a broadcast join and the keep decision is a per-row filter."""
    from dungbeetle_spark.plans.inspect import formatted_plan, has_broadcast_join

    df = SPECS["dataset_mix_weighted"].build(spark, sf_oracle)
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    # exchanges exist only under the (tiny) counts/rates subtree, never
    # repartitioning the documents scan on the probe side: the join's
    # streaming side reads parquet directly.
    assert "SortMergeJoin" not in plan


def test_decontamination_plan_broadcasts_eval_grams(spark, sf_oracle):
    from dungbeetle_spark.plans.inspect import has_broadcast_join

    df = SPECS["decontamination"].build(spark, sf_oracle)
    assert has_broadcast_join(df)


def test_word_ngrams_short_docs_yield_empty_not_crash(spark):
    """Spark's sequence(1, 0) is DESCENDING and slice(t, 0, n) throws —
    documents shorter than one gram must produce an empty gram array
    (code-review r04 finding; latent on the fixture, guaranteed on
    real short web documents)."""
    from pyspark.sql import functions as F

    from dungbeetle_spark.operators.mixing import word_ngrams

    df = spark.createDataFrame(
        [
            (1, []),
            (2, ["hello"]),
            (3, ["one", "two", "three", "four"]),  # n-1 tokens
            (4, ["a", "b", "c", "d", "e"]),  # exactly one gram
            (5, ["a", "b", "c", "d", "e", "f"]),  # two grams
        ],
        "doc_id long, t array<string>",
    )
    got = {
        r.doc_id: r.g
        for r in df.select("doc_id", word_ngrams("t", 5).alias("g")).collect()
    }
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["a b c d e"]
    assert got[5] == ["a b c d e", "b c d e f"]


def test_dedup_incremental_flags_planted_dupes(spark, sf_oracle):
    """Incoming docs rewritten to canonical bodies (doc_id%25==0 ∩
    %11==0, e.g. doc 0) must match a corpus twin; the rest of the
    batch must not all be flagged. The corpus side must never shuffle
    — the incoming batch broadcasts."""
    from dungbeetle_spark.plans.inspect import formatted_plan, has_broadcast_join

    df = SPECS["dedup_incremental"].build(spark, sf_oracle)
    rows = {r.doc_id: r for r in df.collect()}
    assert rows
    planted = [d for d in rows if d % 25 == 0]
    assert planted, "fixture too small for planted incremental dupes"
    for d in planted:
        assert rows[d].is_dup, f"planted canonical doc {d} not matched"
        assert rows[d].dup_of is not None and rows[d].dup_of % 11 != 0
    assert any(not r.is_dup for r in rows.values())
    assert has_broadcast_join(df)
    assert "SortMergeJoin" not in formatted_plan(df)


def test_embedding_quantize_error_bound(spark, sf_oracle):
    """Quantization error can never exceed half a quantization step
    (scale/2 = max_abs/254), and the argmax dim always saturates."""
    df = SPECS["embedding_quantize"].build(spark, sf_oracle)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.n_saturated >= 1  # x == max_abs quantizes to ±127
        assert r.max_abs_err <= r.max_abs / 254 + 1e-12, (
            r.vec_id,
            r.max_abs_err,
            r.max_abs / 254,
        )


def test_hll_register_sketch_estimate_accuracy(spark, sf_oracle):
    """Derive the HLL estimate from the integer sufficient statistics
    the operator emits (harmonic mean via sum_inv_scaled / 2^53, with
    the standard linear-counting small-range correction) and pin it
    within 12% of the exact twin for every scope — plus the merge
    property: the 'ALL' row's register stats must dominate every
    daily row (max-merge can only raise rho, never lower)."""
    import math

    from dungbeetle_spark.operators.mixing import (
        _HLL_M,
        _HLL_RHO_MAX,
        hll_register_sketch,
    )

    rows = {r.scope: r for r in hll_register_sketch(spark, sf_oracle).collect()}
    assert "ALL" in rows and len(rows) > 2
    for r in rows.values():
        s = r.sum_inv_scaled / float(1 << _HLL_RHO_MAX)
        est = 0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M / s
        zeros = _HLL_M - r.n_occupied
        if est < 2.5 * _HLL_M and zeros > 0:
            est = _HLL_M * math.log(_HLL_M / zeros)
        assert abs(est - r.exact_users) <= 0.12 * r.exact_users, (
            r.scope,
            est,
            r.exact_users,
        )
    allr = rows["ALL"]
    for scope, r in rows.items():
        if scope == "ALL":
            continue
        # more occupied registers and higher max rho than any single day
        assert allr.n_occupied >= r.n_occupied
        assert allr.max_rho >= r.max_rho
        assert allr.exact_users >= r.exact_users


def test_cross_source_ce_matrix_properties(spark, sf_oracle):
    """Matrix invariants: full |sources|^2 coverage, self rows ranked
    first, and Gibbs'-style sanity within the estimate's documented
    band — flooring each term to whole bits (and add-1 smoothing with
    source-dependent denominators) can displace the row minimum from
    the self model by at most the 1-bit-per-token band, so self-CE
    must sit within 1.0 bit of its row's minimum."""
    from collections import defaultdict

    from dungbeetle_spark.operators.mixing import cross_source_ce_matrix

    rows = cross_source_ce_matrix(spark, sf_oracle).collect()
    by_t = defaultdict(list)
    for r in rows:
        by_t[r.t_source].append(r)
    n = len(by_t)
    assert len(rows) == n * n
    for t, rr in by_t.items():
        assert len(rr) == n
        self_rows = [r for r in rr if r.is_self]
        assert len(self_rows) == 1 and self_rows[0].rnk == 1
        assert (
            self_rows[0].ce_bits
            <= min(r.ce_bits for r in rr if not r.is_self) + 1.0
        )
