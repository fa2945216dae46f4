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

from dungbeetle_spark.operators.mixing import _HLL_M, _HLL_RHO_MAX
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


# -- streaming_hll_registers --------------------------------------------------

_HLL_ROOTS: list[str] = []


@atexit.register
def _cleanup_hll_roots() -> None:  # pragma: no cover - process teardown
    for d in _HLL_ROOTS:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "streaming_hll_registers",
    oracle=f"""
    WITH h AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events
    ),
    rho AS (
      SELECT day,
             CAST(hv % {_HLL_M} AS INT) AS register,
             CASE WHEN hv // {_HLL_M} = 0 THEN {_HLL_RHO_MAX}
                  ELSE bit_count(((hv // {_HLL_M}) & -(hv // {_HLL_M})) - 1) + 1
             END AS r
      FROM h
    ),
    regs AS (
      SELECT day AS scope, register, MAX(r) AS rho
      FROM rho GROUP BY 1, 2
    ),
    merged AS (
      SELECT 'ALL' AS scope, register, MAX(rho) AS rho
      FROM regs GROUP BY 2
    ),
    allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged)
    SELECT scope,
           CAST(COUNT(*) AS BIGINT) AS n_occupied,
           CAST(SUM(1::BIGINT << ({_HLL_RHO_MAX} - rho)) AS BIGINT)
             + ({_HLL_M} - CAST(COUNT(*) AS BIGINT)) * (1::BIGINT << {_HLL_RHO_MAX})
             AS sum_inv_scaled,
           CAST(MAX(rho) AS INT) AS max_rho
    FROM allregs GROUP BY 1
    """,
    doc="Streaming twin of hll_register_sketch: each micro-batch's "
    "(day, register) max-rho partial sketch max-merges into a "
    "versioned register snapshot (the same foreachBatch MV dance as "
    "streaming_incremental_mv — the register table IS the state). "
    "MAX over registers is a commutative idempotent monoid, so the "
    "drained snapshot is EXACTLY the batch sketch no matter how "
    "availableNow sliced the source — the oracle recomputes the "
    "registers from scratch in SQL. This is the shape a 100 TB "
    "ingest actually runs: per-day cardinality sketches maintained "
    "in motion, 'ALL' rollup for free, never a rescan.",
)
def streaming_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: per trigger the raw data touched is one
    micro-batch; its partial sketch is at most |days-in-batch| x 256
    rows, and the merge re-aggregates |snapshot| + |partial|
    pre-aggregated register rows — never historical raw events. The
    fold to sufficient statistics runs once, on the final snapshot
    (|days| x 256 rows)."""
    from dungbeetle_spark.operators.mixing import hll_fold, hll_partial

    stream = stream_events(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="dungbeetle_hll_")
    _HLL_ROOTS.append(root)
    state = {"current": None, "version": 0}

    def merge_batch(bdf: DataFrame, _batch_id: int) -> None:
        sess = bdf.sparkSession
        part = hll_partial(
            bdf.select(
                F.col("ts").cast("date").cast("string").alias("day"), "user_id"
            )
        )
        if state["current"] is not None:
            prev = sess.read.parquet(state["current"])
            part = (
                prev.unionByName(part)
                .groupBy("scope", "register")
                .agg(F.max("rho").alias("rho"))
            )
        state["version"] += 1
        new_dir = os.path.join(root, f"v{state['version']}")
        part.write.mode("overwrite").parquet(new_dir)
        old = state["current"]
        state["current"] = new_dir
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)

    with tempfile.TemporaryDirectory(prefix="dungbeetle_hll_ckpt_") as ckpt:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if state["current"] is None:  # empty source
        regs = hll_partial(
            spark.createDataFrame([], "day string, user_id long")
        )
    else:
        regs = spark.read.parquet(state["current"])
    return hll_fold(regs)
