"""Analytic extensions: grouped-agg pandas UDAF + interval range frames.

Completes the user-defined-function taxonomy from SURVEY.md §2 (scalar
pandas UDFs, mapInPandas, UDTF, applyInPandasWithState already exist
elsewhere) with the remaining member — a **grouped-aggregate pandas
UDAF** — and adds the remaining window-frame shape: an event-time
**RANGE BETWEEN INTERVAL** frame.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dungbeetle_spark.queries import _t, query


@query(
    "udaf_median_value",
    oracle="""
    SELECT event_type, median(value) AS median_value, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDAF: exact per-group median via an "
    "Arrow-batched Series→scalar aggregate (the one UDF family the "
    "other operators don't already cover). Median is order-"
    "insensitive, and even-count groups average the two middle "
    "2-decimal values identically in pandas and DuckDB, so the UDAF "
    "output is value-exact cross-engine. At scale each group's values "
    "stream to one Arrow batch — fine for bounded groups (per-type "
    "medians); unbounded groups would use percentile_approx sketches "
    "(see sketch_user_stats).",
)
def udaf_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]

    @F.pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    # Spark disallows mixing grouped-agg pandas UDFs with JVM
    # aggregates in one agg() — the row count rides as a second UDAF.
    @F.pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return len(v)

    return e.groupBy("event_type").agg(
        median_udaf("value").alias("median_value"),
        count_udaf("value").alias("n"),
    )


@query(
    "moving_avg_user_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS avg_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    doc="Event-time sliding aggregate: per event, the user's average "
    "value over the trailing hour — a RANGE BETWEEN INTERVAL frame, "
    "not a row frame. Spark expresses interval ranges as rangeBetween "
    "on epoch MICROSECONDS (the fixture's timestamps are "
    "microsecond-precision; a seconds-granularity key would shear "
    "frame boundaries off the oracle's). Decimal-exact numerator, one "
    "double division; single user_id shuffle.",
)
def moving_avg_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    hour_us = 3_600 * 1_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-hour_us, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("avg_1h"),
    )


@query(
    "window_rank_family",
    oracle="""
    SELECT event_id, user_id,
           NTILE(4) OVER w AS quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cume,
           LAG(value) OVER t AS prev_value,
           LEAD(value) OVER t AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id),
           t AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="The remaining window-function family in one pass: NTILE "
    "bucketing and the rank ratios (PERCENT_RANK / CUME_DIST — "
    "integer-count ratios in one double division, bit-exact "
    "cross-engine) over a value ordering, plus LAG/LEAD neighbors "
    "over an event-time ordering. Both orderings carry event_id "
    "tiebreaks so every rank is total; Catalyst plans the two frames "
    "over ONE user_id shuffle (same partitioning, two sorts).",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy("value", "event_id")
    t = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lag("value").over(t).alias("prev_value"),
        F.lead("value").over(t).alias("next_value"),
    )
