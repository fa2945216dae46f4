"""Invariant tests for the curation operators (operators/curation.py).

Value correctness for the 7 oracle-backed queries is covered by
test_queries_oracle.py; these pin what the oracle can't see:
sequence_pack's packing invariants (it has no SQL oracle), forward-
fill semantics on a planted gap, and determinism across runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dungbeetle_spark.operators.curation import (
    _DOMAIN_QUOTA,
    _PACK_BUDGET,
    sequence_pack,
)
from dungbeetle_spark.queries import registry
from dungbeetle_spark.sources.catalog import load_tables

SPECS = registry()


def test_sequence_pack_invariants(spark, sf_oracle):
    docs = load_tables(spark, sf_oracle, ["documents"])["documents"]
    n_docs = docs.count()
    bins = sequence_pack(spark, sf_oracle).collect()

    # every document lands in exactly one bin
    assert sum(r.n_docs for r in bins) == n_docs

    # token totals account for the whole corpus
    from dungbeetle_spark.functions.texts import word_count

    corpus_tokens = docs.select(
        F.sum(word_count("text")).alias("t")
    ).collect()[0].t
    assert sum(r.total_tokens for r in bins) == corpus_tokens

    # budget holds except for unsplittable singletons
    for r in bins:
        if r.total_tokens > _PACK_BUDGET:
            assert r.n_docs == 1, (
                f"bin {r.bucket}/{r.bin_id} over budget with {r.n_docs} docs"
            )

    # (bucket, bin_id) is a key
    keys = [(r.bucket, r.bin_id) for r in bins]
    assert len(keys) == len(set(keys))


def test_sequence_pack_deterministic(spark, sf_oracle):
    a = sorted(map(tuple, sequence_pack(spark, sf_oracle).collect()))
    b = sorted(map(tuple, sequence_pack(spark, sf_oracle).collect()))
    assert a == b


def test_gap_fill_daily_planted_gap(spark, sf_oracle):
    """Forward-fill semantics on a user with a known hole: every gap
    day carries the most recent observed value, and no dense row is
    missing between a user's first and last active day."""
    df = SPECS["gap_fill_daily"].build(spark, sf_oracle)
    rows = df.orderBy("user_id", "day").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    saw_gap = False
    for series in by_user.values():
        # dense: consecutive days, no holes
        days = [r.day for r in series]
        assert all(
            (b - a).days == 1 for a, b in zip(days, days[1:])
        ), "calendar must be dense per user"
        # first row is an observation (span starts at first active day)
        assert series[0].day_value is not None
        last = None
        for r in series:
            if r.day_value is not None:
                assert not r.is_gap
                last = r.day_value
            else:
                saw_gap = True
                assert r.is_gap
                assert r.filled_value == last
    assert saw_gap, "fixture should contain at least one gap day"


def test_domain_quota_caps_every_source(spark, sf_oracle):
    df = SPECS["domain_quota_sample"].build(spark, sf_oracle)
    per_source = df.groupBy("source").count().collect()
    assert per_source
    assert all(r["count"] <= _DOMAIN_QUOTA for r in per_source)


def test_domain_quota_keeps_under_quota_rows_verbatim(spark):
    """Planted corpus: the under-quota source passes through complete
    and untouched; the over-quota source keeps its lowest doc_ids."""
    from dungbeetle_spark.operators.curation import domain_quota_frame

    rows = [(i, "big") for i in range(10)] + [(100 + i, "small") for i in range(3)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    got = {(r.doc_id, r.source) for r in domain_quota_frame(d, 5).collect()}
    assert got == {(i, "big") for i in range(5)} | {(100 + i, "small") for i in range(3)}


def test_pack_shard_count_scales_with_corpus():
    """16 hardcoded shards was the r03 'weak' finding: shard count must
    grow with the data — and depend ONLY on the data, so packing
    output is identical across cluster sizes (determinism contract)."""
    from dungbeetle_spark.operators.curation import (
        _PACK_TARGET_DOCS_PER_SHARD,
        pack_shard_count,
    )

    assert pack_shard_count(0) == 1
    assert pack_shard_count(_PACK_TARGET_DOCS_PER_SHARD) == 1
    big = pack_shard_count(10_000_000)
    assert big == -(-10_000_000 // _PACK_TARGET_DOCS_PER_SHARD)
    assert pack_shard_count(100_000_000) == 10 * big  # linear growth


def test_stratified_sample_rates(spark, sf_oracle):
    """md5-threshold sampling should land near the configured rates
    (en 60%, others 30%) — loose bounds, it's a 500-doc fixture."""
    docs = load_tables(spark, sf_oracle, ["documents"])["documents"]
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept = {
        r.lang: r["count"]
        for r in SPECS["stratified_sample"]
        .build(spark, sf_oracle)
        .groupBy("lang")
        .count()
        .collect()
    }
    en_rate = kept.get("en", 0) / totals["en"]
    assert 0.4 < en_rate < 0.8
    other_kept = sum(v for k, v in kept.items() if k != "en")
    other_total = sum(v for k, v in totals.items() if k != "en")
    assert 0.15 < other_kept / other_total < 0.45


def test_pii_scrub_planted_corpus(spark):
    """Exact extraction/redaction semantics on known PII (ADVICE r03:
    the fixture corpus alone would leave the regexes unexercised)."""
    from dungbeetle_spark.operators.curation import scrub_stats_frame

    rows = [
        # (source, text, n_emails, n_urls, redacted_len)
        ("a", "plain text no pii", 0, 0, len("plain text no pii")),
        (
            "a",
            "mail bob@site.org today",
            1,
            0,
            len("mail <EMAIL> today"),
        ),
        (
            "b",
            "see https://x.io/p?q=1 then jo.ann+x@my-site.co.uk bye",
            1,
            1,
            len("see <URL> then <EMAIL> bye"),
        ),
        ("b", "go http://plain.example/path now", 0, 1, len("go <URL> now")),
    ]
    df = spark.createDataFrame(
        [(s, t) for s, t, *_ in rows], "source string, text string"
    )
    got = {r.source: r for r in scrub_stats_frame(df).collect()}
    assert got["a"].n_docs == 2
    assert got["a"].docs_with_pii == 1
    assert got["a"].total_emails == 1
    assert got["a"].total_urls == 0
    assert got["a"].redacted_chars == rows[0][4] + rows[1][4]
    assert got["b"].n_docs == 2
    assert got["b"].docs_with_pii == 2
    assert got["b"].total_emails == 1
    assert got["b"].total_urls == 2  # one URL in each of b's docs
    assert got["b"].redacted_chars == rows[2][4] + rows[3][4]


def test_pii_scrub_fixture_not_hollow(spark, sf_oracle):
    """The registry query must actually find PII on the fixture —
    synthesized emails/URLs guarantee non-zero hits, so a regression
    back to a PII-free scan fails loudly here."""
    agg = (
        SPECS["pii_scrub_stats"]
        .build(spark, sf_oracle)
        .agg(
            F.sum("total_emails").alias("e"),
            F.sum("total_urls").alias("u"),
        )
        .collect()[0]
    )
    assert agg.e > 0 and agg.u > 0


def test_chunking_covers_all_tokens(spark, sf_oracle):
    """Stride < size ⇒ every token of every document appears in at
    least one chunk; chunk token counts sum to corpus tokens plus
    overlap, never less."""
    from dungbeetle_spark.functions.texts import word_count

    docs = load_tables(spark, sf_oracle, ["documents"])["documents"]
    corpus_tokens = docs.select(F.sum(word_count("text")).alias("t")).collect()[0].t
    chunks = SPECS["doc_chunking"].build(spark, sf_oracle)
    agg = chunks.groupBy().agg(
        F.sum("chunk_tokens").alias("tok"), F.countDistinct("doc_id").alias("docs")
    ).collect()[0]
    assert agg.tok >= corpus_tokens
    assert agg.docs == docs.count()


def test_shard_interleave_audit_invariants_and_expectation(spark, sf_oracle):
    """Audit-math invariants plus an independent recompute of the
    permutation expectation: every doc lands in exactly one shard,
    ppm fields stay in [0, 1e6], max_run <= n_docs, and the expected
    same-source adjacency equals sum(n_s*(n_s-1))/(n*(n-1)) recomputed
    in Python from the shard's source histogram."""
    from collections import Counter

    from dungbeetle_spark.operators.curation import (
        _ILV_SHIFT,
        shard_interleave_audit,
    )
    from dungbeetle_spark.functions.texts import md5_hash60

    rows = {r.shard_id: r for r in shard_interleave_audit(spark, sf_oracle).collect()}
    assert rows, "audit should produce shard rows"
    docs = (
        load_tables(spark, sf_oracle)["documents"]
        .select(
            "source",
            md5_hash60(F.concat(F.lit("shuffle|"), F.col("doc_id").cast("string")))
            .alias("okey"),
        )
        .withColumn("shard_id", F.expr(f"okey DIV {_ILV_SHIFT}"))
        .collect()
    )
    hist: dict[int, Counter] = {}
    for r in docs:
        hist.setdefault(r.shard_id, Counter())[r.source] += 1
    assert sum(c.total() for c in hist.values()) == len(docs)
    for sid, r in rows.items():
        n = r.n_docs
        assert r.max_run <= n and 0 <= r.obs_same_ppm <= 1_000_000
        assert 0 <= r.exp_same_ppm <= 1_000_000
        c = hist[sid]
        assert c.total() == n
        expect = sum(v * (v - 1) for v in c.values()) * 1_000_000 // (n * (n - 1))
        assert r.exp_same_ppm == expect
