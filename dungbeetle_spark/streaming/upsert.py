"""Streaming incremental materialized-view maintenance.

The streaming twin of the batch ``incremental_agg_maintenance``
operator: a raw event stream is drained micro-batch by micro-batch,
and each batch's *partial aggregate* is merged into a keyed snapshot
table (read previous snapshot -> union partials -> re-aggregate ->
write new version -> swap pointer). No Spark state store is involved —
the MV table IS the state, which is what makes the pattern restartable
and storage-format agnostic (with Delta/Iceberg the swap becomes a
MERGE INTO; plain parquet needs the version-and-swap dance done here).

Because (count, decimal-sum, max) is a commutative monoid, the final
snapshot is independent of how availableNow happened to slice the
source into micro-batches — so the drained result has an exact batch
SQL oracle, like every other streaming query in this engine.

The reference has no streaming surface (SURVEY.md §7 risk 6); this is
a north-star extension.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dungbeetle_spark.queries import query
from dungbeetle_spark.streaming.source import stream_events

# Snapshot roots created this process. The returned DataFrame reads
# the final version lazily, so the last snapshot must stay on disk for
# the session's lifetime; everything is removed at process exit (the
# same scratch-dir policy as streaming/source.py — durable results are
# the job layer's result backend, not these dirs).
_MV_ROOTS: list[str] = []


@atexit.register
def _cleanup_mv_roots() -> None:  # pragma: no cover - process teardown
    for d in _MV_ROOTS:
        shutil.rmtree(d, ignore_errors=True)


def _partial(bdf: DataFrame) -> DataFrame:
    # The accumulated sum lives at decimal(38,2) in every snapshot
    # version (widened here so v1 and vN share one schema). Overflow
    # bound: per-event values are < 1e4, so the accumulator overflows
    # only past ~1e36 total — unreachable (1e32 events per user).
    # Narrowing back to (18,2) per merge would silently null a user's
    # total past ~1e16 with ANSI off; see incremental_agg_maintenance
    # for the same widening policy on the batch twin.
    return bdf.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("value_dec"),
        F.max("ts").alias("last_ts"),
    )


def _merge(prev: DataFrame, part: DataFrame) -> DataFrame:
    return (
        prev.unionByName(part)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_dec").cast("decimal(38,2)").alias("value_dec"),
            F.max("last_ts").alias("last_ts"),
        )
    )


@query(
    "streaming_incremental_mv",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(MAX(ts) AS TIMESTAMP) AS last_ts
    FROM events GROUP BY user_id
    """,
    doc="Streaming incremental MV maintenance: foreachBatch merges "
    "each micro-batch's per-user partial aggregate (count / exact "
    "decimal sum / max ts) into a versioned parquet snapshot — "
    "read-prev, union, re-aggregate, atomic pointer swap. The monoid "
    "merge makes the final snapshot independent of micro-batch "
    "slicing, so the drained stream equals the full batch aggregate "
    "exactly (the oracle recomputes from scratch). The streaming twin "
    "of incremental_agg_maintenance — one maintenance semantics, "
    "batch and stream.",
)
def streaming_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: per trigger the fact data touched is ONE
    micro-batch; its partial aggregate shuffles only batch keys, and
    the merge re-aggregates |MV| + |batch keys| pre-aggregated rows —
    never historical raw data. The decimal sum stays decimal inside
    the snapshot so merge order can never wobble low bits; doubles
    appear only in the final projection. With a MERGE-capable table
    format the union+re-agg becomes an upsert of just the touched
    keys; the version-and-swap here is the plain-parquet equivalent
    and is what the job layer's overwrite result tables already do."""
    stream = stream_events(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="dungbeetle_mv_")
    _MV_ROOTS.append(root)
    state = {"current": None, "version": 0}

    def merge_batch(bdf: DataFrame, _batch_id: int) -> None:
        sess = bdf.sparkSession
        part = _partial(bdf)
        if state["current"] is not None:
            prev = sess.read.parquet(state["current"])
            part = _merge(prev, part)
        state["version"] += 1
        new_dir = os.path.join(root, f"v{state['version']}")
        part.write.mode("overwrite").parquet(new_dir)
        old = state["current"]
        state["current"] = new_dir
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)

    with tempfile.TemporaryDirectory(prefix="dungbeetle_mv_ckpt_") as ckpt:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if state["current"] is None:  # empty source
        empty = _partial(spark.createDataFrame([], stream.schema))
        snapshot = empty
    else:
        snapshot = spark.read.parquet(state["current"])
    return snapshot.select(
        "user_id",
        "n_events",
        F.col("value_dec").cast("double").alias("total_value"),
        F.col("last_ts").cast("timestamp").alias("last_ts"),
    )
