"""Drain lifecycle: unique per-drain outputs, retention, concurrency,
and session isolation — the contracts behind streaming/source.py."""

from __future__ import annotations

import concurrent.futures as cf

from dungbeetle_spark.queries import registry
from dungbeetle_spark.streaming.source import streaming_session

SPECS = registry()


def test_prior_drain_result_stays_readable(spark, sf_smoke):
    """A drain returns a LAZY DataFrame over its output files; a later
    drain of the same query must not delete or overwrite them (the
    old name-keyed dir did, invalidating earlier results)."""
    build = SPECS["streaming_windowed_counts"].build
    first = build(spark, sf_smoke)
    n_first = first.count()
    second = build(spark, sf_smoke)
    assert second.count() == n_first
    # the first result is still fully readable after the re-drain
    assert first.count() == n_first


def test_concurrent_drains_do_not_interfere(spark, sf_smoke, sf_oracle):
    """Two jobs for the same streaming task running concurrently (the
    job layer allows distinct job_ids for one task) must each get
    their own complete result."""
    from pyspark.sql import functions as F

    def events_total(df):
        return df.agg(F.sum("n_events")).collect()[0][0]

    build = SPECS["streaming_windowed_counts"].build
    with cf.ThreadPoolExecutor(max_workers=2) as ex:
        f_small = ex.submit(lambda: events_total(build(spark, sf_smoke)))
        f_big = ex.submit(lambda: events_total(build(spark, sf_oracle)))
        n_small, n_big = f_small.result(), f_big.result()
    # each concurrent drain produced its own complete, uncorrupted
    # result (equal to a clean sequential drain of the same source)
    assert n_small == events_total(build(spark, sf_smoke))
    assert n_big == events_total(build(spark, sf_oracle))
    assert n_small != n_big  # 10x more events at the bigger sf


def test_streaming_session_isolated_and_memoized(spark):
    """Drain tuning lives on a cloned session: the caller's shuffle
    partitions are untouched, and the clone is reused per parent."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    s1 = streaming_session(spark)
    s2 = streaming_session(spark)
    assert s1 is s2
    assert s1 is not spark
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert s1.conf.get("spark.sql.shuffle.partitions") == str(
        max(spark.sparkContext.defaultParallelism, 1)
    )


def test_mv_merge_survives_sums_past_decimal18(spark):
    """ADVICE r05: the old per-merge cast back to decimal(18,2)
    silently NULLed a user's accumulated total once it passed ~1e16
    (ANSI off). The accumulator now lives at decimal(38,2); a total
    of 3e17 must survive a chain of merges exactly."""
    from decimal import Decimal

    from dungbeetle_spark.streaming.upsert import _merge, _partial

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    big = 9.9e15  # each batch's per-user sum: just under the dec(18,2) cap
    rows = [
        (i, None, 1, "purchase", big, None) for i in range(3)
    ]
    snapshot = None
    for i in range(3):
        batch = spark.createDataFrame([rows[i]], schema)
        part = _partial(batch)
        snapshot = part if snapshot is None else _merge(snapshot, part)
    got = snapshot.collect()
    assert len(got) == 1
    total = got[0]["value_dec"]
    assert total is not None, "accumulated decimal must not overflow-null"
    assert total == Decimal(str(big)) * 3
    # and the snapshot schema is the documented uniform width
    assert dict(snapshot.dtypes)["value_dec"] == "decimal(38,2)"


def test_fate_gate_stream_equals_batch_manifest(spark, sf_oracle):
    """The drained streaming fate gate must equal corpus_fate_manifest
    row-for-row on the same documents (VERDICT r08 item 5): the
    static reference state (canonical map, eval grams) plus per-batch
    stream-static probing reproduces the batch composition exactly —
    not just oracle-equal, Spark-vs-Spark equal."""
    from dungbeetle_spark.queries import registry

    specs = registry()
    batch = specs["corpus_fate_manifest"].build(spark, sf_oracle)
    stream = specs["streaming_corpus_fate_gate"].build(spark, sf_oracle)
    assert sorted(batch.columns) == sorted(stream.columns)
    b = sorted(map(tuple, batch.select(*sorted(batch.columns)).collect()))
    s = sorted(map(tuple, stream.select(*sorted(batch.columns)).collect()))
    assert b == s


def test_fate_gate_multi_batch_drain_equals_batch(spark, sf_oracle, tmp_path):
    """The gate's batch-local claim under REAL micro-batch boundaries:
    the corpus is rewritten as 4 parquet splits and streamed with
    maxFilesPerTrigger=1, so the drain provably runs >= 4 separate
    foreachBatch invocations, each probing the same materialized
    reference state — and the accumulated output still equals the
    batch manifest row-for-row. The single-file fixture drains in one
    batch, which would leave cross-batch correctness untested."""
    from dungbeetle_spark.queries import registry
    from dungbeetle_spark.sources.catalog import load_tables
    from dungbeetle_spark.streaming.source import drain_to_df, stream_table
    from dungbeetle_spark.streaming.stateful import (
        fate_gate_reference,
        make_fate_gate_batch,
    )

    src = tmp_path / "mbsf"
    src.mkdir()
    d = load_tables(spark, sf_oracle, ["documents"])["documents"]
    d.repartition(4).write.parquet(str(src / "documents.parquet"))

    stream = stream_table(spark, str(src), "documents", max_files_per_trigger=1)
    canon, ev, fstops, fev = fate_gate_reference(stream.sparkSession, str(src))
    gate = make_fate_gate_batch(canon, ev, fstops, fev)
    n_batches = []

    def counting_gate(bdf):
        n_batches.append(1)
        return gate(bdf)

    drained = drain_to_df(
        stream.select("doc_id", "text", "lang"),
        "mb_fate_gate",
        "append",
        transform=counting_gate,
    )
    assert len(n_batches) >= 4, f"stream did not split: {len(n_batches)} batch(es)"
    batch = registry()["corpus_fate_manifest"].build(spark, str(src))
    cols = sorted(batch.columns)
    b = sorted(map(tuple, batch.select(*cols).collect()))
    s = sorted(map(tuple, drained.select(*cols).collect()))
    assert b == s


def test_hll_register_merge_batch_split_invariant(spark, sf_smoke):
    """The streaming HLL snapshot's core claim — MAX-merge of
    per-batch partial registers equals the one-shot batch sketch
    regardless of how the stream splits into micro-batches — proved
    directly: events split 4 ways by an arbitrary key, partials
    max-merged pairwise in sequence (exactly the foreachBatch fold),
    compared register-for-register against the whole-input partial."""
    from pyspark.sql import functions as F

    from dungbeetle_spark.operators.mixing import hll_partial
    from dungbeetle_spark.sources.catalog import load_tables

    ev = load_tables(spark, sf_smoke, ["events"])["events"].select(
        F.col("ts").cast("date").cast("string").alias("day"), "user_id"
    )
    whole = {
        (r.scope, r.register): r.rho for r in hll_partial(ev).collect()
    }
    snapshot = None
    for k in range(4):
        part = hll_partial(ev.filter(F.col("user_id") % 4 == k))
        if snapshot is None:
            snapshot = part
        else:
            snapshot = (
                snapshot.unionByName(part)
                .groupBy("scope", "register")
                .agg(F.max("rho").alias("rho"))
            )
    merged = {(r.scope, r.register): r.rho for r in snapshot.collect()}
    assert merged == whole


def test_fate_gate_decontaminates_novel_documents(spark, sf_oracle):
    """The primary ingest case: a document NOT in the static corpus
    (content hash misses the canonical map) must still take the
    decontamination stage. A novel doc quoting a benchmark passage is
    dropped_contaminated; a clean novel doc is kept recording ITSELF
    as canonical (r10, matching the batch manifest's convention for
    kept docs — ADVICE r09); a novel exact copy
    of an existing canonical is dropped_duplicate against it. The
    original gate waved all hash-miss docs through as 'kept'
    unchecked (r09 review finding)."""
    from pyspark.sql import functions as F

    from dungbeetle_spark.queries import registry
    from dungbeetle_spark.sources.catalog import load_tables
    from dungbeetle_spark.streaming.stateful import (
        fate_gate_reference,
        make_fate_gate_batch,
    )

    canon, ev, fstops, fev = fate_gate_reference(spark, sf_oracle)
    gate = make_fate_gate_batch(canon, ev, fstops, fev)

    # a corpus doc that the batch manifest keeps, as the novel base
    manifest = registry()["corpus_fate_manifest"].build(spark, sf_oracle)
    kept_id = manifest.filter("fate = 'kept'").agg(
        F.min("doc_id")
    ).collect()[0][0]
    d = load_tables(spark, sf_oracle, ["documents"])["documents"]
    base = d.filter(F.col("doc_id") == kept_id).select(
        "text", "lang"
    ).collect()[0]
    # novel ids: coprime-safe (avoid eval/plant/incremental gates)
    nid = 10_000_001
    while any(nid % m == 0 for m in (37, 10, 7, 9, 11, 2, 3, 5)):
        nid += 1
    nid2, nid3 = nid + 420, nid + 840  # same residue-freedom by spot check
    for x in (nid2, nid3):
        assert not any(x % m == 0 for m in (37, 10)), x
    novel = spark.createDataFrame(
        [
            (nid, base.text + " benchmark passage k1 alpha beta gamma"
                  " delta epsilon zeta eta", base.lang),
            (nid2, base.text + " entirely fresh suffix words with no"
                   " benchmark overlap at all", base.lang),
            (nid3, base.text, base.lang),  # exact copy of the kept doc
        ],
        "doc_id long, text string, lang string",
    )
    rows = {r.doc_id: r for r in gate(novel).collect()}
    assert rows[nid].quality_reason == "kept"
    assert rows[nid].fate == "dropped_contaminated"
    assert rows[nid].n_contaminated > 0
    assert rows[nid2].fate == "kept"
    assert rows[nid2].canonical_id == nid2
    assert rows[nid3].fate == "dropped_duplicate"
    assert rows[nid3].canonical_id == kept_id
