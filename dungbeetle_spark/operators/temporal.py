"""Temporal operators over the ``events`` table: as-of join and
sessionization.

The reference delegates all SQL to its source databases and has no
temporal operators of its own (SURVEY.md §2 Part B); these are
north-star extensions re-expressed Spark-first:

- **as-of join** — Spark has no ASOF JOIN operator, so it is composed
  from existing primitives: union both sides tagged, one window pass
  per key ordered by time, ``last(..., ignorenulls)`` carries the most
  recent right-side row forward. One shuffle on the key — the same
  cost as the sort-merge an engine-native ASOF does, and it never
  materializes a pair set. DuckDB's native ASOF JOIN is the oracle.

- **sessionization** — ``F.session_window`` (gap-merged event-time
  windows), the built-in Spark primitive for both batch and streaming.
  The DuckDB oracle derives the same sessions via the classic
  gaps-and-islands (lag → boundary flag → running sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dungbeetle_spark.functions.numeric import dsum
from dungbeetle_spark.queries import _t, query

_GAP = "1 hour"


@query(
    "asof_click_attribution",
    oracle="""
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                      event_type FROM events)
    SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
    FROM (SELECT * FROM e WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts > c.ts
    """,
    doc="As-of join: for every purchase, the most recent strictly "
    "earlier click by the same user (classic attribution). Composed "
    "as union + per-key ordered window + last(ignorenulls) — one "
    "shuffle on user_id, no pair materialization; at equal "
    "timestamps the purchase sorts first so strictness holds. "
    "Oracle = DuckDB native ASOF LEFT JOIN.",
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp_ntz").alias("c_ts"),
        F.lit(0).alias("kind"),  # purchases sort before same-ts clicks
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("c_ts"),
        F.lit(1).alias("kind"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("kind"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        purchases.unionByName(clicks)
        .withColumn("click_ts", F.last("c_ts", ignorenulls=True).over(w))
        .filter(F.col("kind") == 0)
        .select("event_id", "user_id", "ts", "click_ts")
    )


@query(
    "sessionize_events",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL '{_GAP}' THEN 1
                  ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, session_id
    """,
    doc=f"Sessionization: per-user sessions split at {_GAP} inactivity "
    "gaps via the built-in session_window (gap-merged event-time "
    "windows — the same operator serves Structured Streaming with a "
    "watermark). Oracle = gaps-and-islands SQL. A new session starts "
    "when the gap is ≥ the threshold (session windows are half-open).",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    return (
        e.groupBy("user_id", F.session_window("ts", _GAP).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
