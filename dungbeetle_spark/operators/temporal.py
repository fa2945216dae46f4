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


@query(
    "range_join_order_context",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(e.event_id) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS ctx_value
    FROM orders o
    LEFT JOIN events e
      ON e.user_id = o.o_custkey
     AND e.ts >= o.o_orderdate - INTERVAL '1 day'
     AND e.ts <  o.o_orderdate + INTERVAL '1 day'
    GROUP BY o.o_orderkey
    """,
    doc="Range join: each order picks up the same user's events within "
    "±1 day of the order timestamp (band/interval join). The equi key "
    "(user) drives the shuffle; the range predicate evaluates inside "
    "the sort-merge join, so no pair set beyond the per-user band "
    "ever materializes. With no equi key available the 100 TB shape "
    "is bin-the-interval: assign both sides to time buckets of the "
    "band width, equi-join on bucket (each probe checks its own and "
    "one neighbor bucket), filter exactly — turning an O(n·m) "
    "inequality join into a keyed shuffle.",
)
def range_join_order_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "events")
    o, e = t["orders"], t["events"]
    on = (
        (e.user_id == o.o_custkey)
        & (e.ts >= o.o_orderdate - F.expr("INTERVAL 1 DAY"))
        & (e.ts < o.o_orderdate + F.expr("INTERVAL 1 DAY"))
    )
    return (
        o.join(e, on, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("event_id").alias("n_events"),
            dsum("value").alias("ctx_value"),
        )
    )


@query(
    "time_rollup_events",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                THEN CAST(date_trunc('hour', ts) AS TIMESTAMP) END AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    HAVING GROUPING(date_trunc('day', ts)) = 0
    """,
    doc="Hypertable-style continuous aggregate: hourly and daily "
    "rollups of the event stream in ONE pass via ROLLUP on "
    "(day, hour) — the expand-then-aggregate plan shuffles once, and "
    "day rows aggregate the hour partials. The grand-total row is "
    "dropped (HAVING on GROUPING), matching a time-bucketed "
    "materialized view's shape.",
)
def time_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    day = F.date_trunc("day", "ts").cast("timestamp_ntz")
    hour = F.date_trunc("hour", "ts").cast("timestamp_ntz")
    return (
        e.select(day.alias("d"), hour.alias("h"), "value")
        .rollup("d", "h")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .filter(F.col("d").isNotNull())
        .select(
            F.col("d").alias("day"), F.col("h").alias("hour"), "n_events", "total_value"
        )
    )


_TS_QUERY_USER = 1
_TS_TOPK = 5


@query(
    "timeseries_topk_similar_users",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    qd AS (SELECT d, c FROM daily WHERE user_id = {_TS_QUERY_USER}),
    sq2 AS (SELECT COALESCE(SUM(c * c), 0) AS v FROM qd),
    su2 AS (
      SELECT user_id, SUM(c * c) AS v FROM daily
      WHERE user_id <> {_TS_QUERY_USER} GROUP BY 1),
    cross_term AS (
      SELECT daily.user_id, SUM(daily.c * qd.c) AS v
      FROM daily JOIN qd ON daily.d = qd.d
      WHERE daily.user_id <> {_TS_QUERY_USER}
      GROUP BY 1),
    dist AS (
      SELECT s.user_id,
             s.v + (SELECT v FROM sq2) - 2 * COALESCE(x.v, 0) AS dist2
      FROM su2 s LEFT JOIN cross_term x ON s.user_id = x.user_id)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY dist2, user_id) AS BIGINT)
             AS rank,
           user_id, CAST(dist2 AS BIGINT) AS dist2
    FROM dist
    ORDER BY dist2, user_id
    LIMIT {_TS_TOPK}
    """,
    doc=f"Top-{_TS_TOPK} time-series similarity search (the "
    "REPOSE/streaming-similarity problem shape, ICDE'21/EDBT'19, on "
    "the activity domain): the users whose 30-day daily-activity "
    "profile sits closest to user "
    f"{_TS_QUERY_USER}'s in squared Euclidean distance. Distance "
    "decomposes as Σc_u² + Σc_q² − 2Σ c_u·c_q so missing days need "
    "no densification — pure integer arithmetic, bit-identical "
    "cross-engine, ties broken on user_id.",
)
def timeseries_topk_similar_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the query profile (≤ days-of-history rows) and its
    squared norm BROADCAST; the corpus aggregates once on (user, day)
    and once on user — the same single-pass norm+cross-term
    decomposition ann_cosine_topk uses for embeddings, here on
    event-time profiles. The global top-k is a TakeOrdered over
    user-cardinality rows, never a full sort of the fact table."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    qd = daily.filter(F.col("user_id") == _TS_QUERY_USER).select(
        F.col("d").alias("qd_d"), F.col("c").alias("qc")
    )
    sq2 = qd.agg(F.coalesce(F.sum(F.col("qc") * F.col("qc")), F.lit(0)).alias("sq2"))
    rest = daily.filter(F.col("user_id") != _TS_QUERY_USER)
    su2 = rest.groupBy("user_id").agg(F.sum(F.col("c") * F.col("c")).alias("su2"))
    cross = (
        rest.join(F.broadcast(qd), rest.d == qd.qd_d)
        .groupBy("user_id")
        .agg(F.sum(F.col("c") * F.col("qc")).alias("xv"))
    )
    dist = (
        su2.join(cross, "user_id", "left")
        .join(F.broadcast(sq2))
        .select(
            "user_id",
            (
                F.col("su2") + F.col("sq2") - 2 * F.coalesce(F.col("xv"), F.lit(0))
            ).alias("dist2"),
        )
    )
    w = W.orderBy(F.asc("dist2"), F.asc("user_id"))
    return (
        dist.orderBy("dist2", "user_id")
        .limit(_TS_TOPK)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "user_id", F.col("dist2").cast("long").alias("dist2"))
    )


@query(
    "scd2_user_type_history",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3),
    dominant AS (
      SELECT user_id, day, event_type AS dom_type FROM (
        SELECT user_id, day, event_type, ROW_NUMBER() OVER (
          PARTITION BY user_id, day
          ORDER BY n DESC, event_type) AS rk
        FROM daily) WHERE rk = 1),
    flagged AS (
      SELECT user_id, day, dom_type,
             CASE WHEN dom_type IS DISTINCT FROM
                    LAG(dom_type) OVER (PARTITION BY user_id
                                        ORDER BY day)
                  THEN 1 ELSE 0 END AS chg
      FROM dominant),
    islands AS (
      SELECT user_id, day, dom_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS seg
      FROM flagged)
    SELECT user_id, dom_type,
           CAST(MIN(day) AS DATE) AS valid_from,
           CAST(MAX(day) AS DATE) AS valid_to,
           CAST(COUNT(*) AS BIGINT) AS active_days,
           CAST(seg AS BIGINT) AS version
    FROM islands GROUP BY user_id, dom_type, seg
    """,
    doc="SCD Type-2 history build: each user's DOMINANT daily event "
    "type (max count, type-name tiebreak) is collapsed into "
    "versioned validity intervals -- a new version opens whenever "
    "the dominant type changes (LAG change-flag -> running-sum "
    "island id -> min/max day per island). The slowly-changing-"
    "dimension maintenance pattern every warehouse runs on CDC "
    "feeds, as one relational plan with deterministic tiebreaks.",
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one explicit user_id repartition up front —
    HashPartitioning(user_id) satisfies the clustering of the daily
    aggregate (superset key), both windows, and the final interval
    aggregate, so the fact table shuffles ONCE (the q21 pattern,
    plan-pinned) and the interval math runs on |user x active-day|
    pre-aggregated rows."""
    e = _t(spark, sf_dir, "events")["events"].repartition("user_id")
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    wr = W.partitionBy("user_id", "day").orderBy(F.desc("n"), F.asc("event_type"))
    dominant = (
        daily.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("user_id", "day", F.col("event_type").alias("dom_type"))
    )
    wd = W.partitionBy("user_id").orderBy("day")
    flagged = dominant.withColumn(
        "chg",
        F.when(
            ~F.col("dom_type").eqNullSafe(F.lag("dom_type").over(wd)), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "seg", F.sum("chg").over(wd.rowsBetween(W.unboundedPreceding, 0))
    )
    return islands.groupBy("user_id", "dom_type", "seg").agg(
        F.min("day").alias("valid_from"),
        F.max("day").alias("valid_to"),
        F.count(F.lit(1)).alias("active_days"),
    ).select(
        "user_id",
        "dom_type",
        "valid_from",
        "valid_to",
        "active_days",
        F.col("seg").cast("long").alias("version"),
    )


@query(
    "interevent_gap_histogram",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(CAST(LAG(ts) OVER (PARTITION BY user_id, event_type
                                             ORDER BY ts, event_id)
                          AS TIMESTAMP)) AS gap_us
      FROM events)
    SELECT event_type,
           CAST(LENGTH(BIN(gap_us)) - 1 AS INT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0
    GROUP BY 1, 2
    """,
    doc="Inter-event gap distribution: per event type, successive "
    "same-user gaps in microseconds bucketed by floor(log2) via "
    "LENGTH(BIN(n))-1 (exact integer math, no float log), with each "
    "bucket's count and min/max -- the latency-distribution "
    "histogram behind p50/p99 dashboards and session-timeout "
    "calibration (the 30-min sessionize gap threshold should sit in "
    "this histogram's valley). Zero-gap ties are excluded (log2 "
    "undefined); (ts, event_id) ordering makes gaps deterministic "
    "under ties.",
)
def interevent_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one (user_id, event_type)-keyed shuffle feeds the
    LAG window; the histogram aggregate partial-combines map-side to
    |types| x <=64 buckets. The same single-shuffle-then-window shape
    as sessionize_events, sharing its scalability argument."""
    e = _t(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    return gaps.groupBy(
        "event_type",
        (F.length(F.bin("gap_us")) - 1).cast("int").alias("log2_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )
