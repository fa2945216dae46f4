"""Structured Streaming over the ``events`` table.

The reference has no streaming surface (SURVEY.md §7 risk 6) — this is
a north-star extension. The shape: ``readStream`` over the same
parquet, event-time tumbling windows with a watermark for late data,
``availableNow`` trigger so a batch-bounded run drains the source and
terminates — which also makes the result *deterministically equal to
the batch aggregation*, giving the streaming path a real SQL oracle.

At scale: the same code runs continuously against a file/Kafka source;
state store size is bounded by (watermark horizon × key cardinality),
and the windowed aggregate shuffles once on (window, key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dungbeetle_spark.functions.numeric import dsum
from dungbeetle_spark.queries import query
from dungbeetle_spark.streaming.source import drain_to_df, stream_events


def windowed_event_counts(
    spark: SparkSession, sf_dir: str, window: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """Run the stream to completion (availableNow) and return the
    materialized windowed aggregate as a normal DataFrame."""
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return drain_to_df(agg, "stream_windows", "complete")


@query(
    "streaming_windowed_counts",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Structured Streaming: tumbling 1-day event-time windows with "
    "a 1-hour watermark, availableNow trigger (drain-and-stop). The "
    "drained stream equals the batch aggregate — checked against the "
    "batch SQL oracle.",
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_counts(spark, sf_dir)


from dungbeetle_spark.operators.text import _QF_ORACLE


@query(
    "streaming_quality_filter",
    oracle=_QF_ORACLE,  # the batch funnel's oracle, verbatim
    doc="Streaming quality filter: the SAME verdict expressions as the "
    "batch quality_filter_funnel (operators/text.funnel_verdicts) "
    "applied to a document stream — stateless codegen projection, so "
    "no watermark and no state store; append-mode foreachBatch lands "
    "verdicts as parquet micro-batch by micro-batch. The drained "
    "stream equals the batch verdicts row-for-row, checked against "
    "the identical SQL oracle — the unified batch/stream API story in "
    "one query.",
)
def streaming_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dungbeetle_spark.operators.text import funnel_verdicts
    from dungbeetle_spark.streaming.source import stream_table

    stream = stream_table(spark, sf_dir, "documents")
    return drain_to_df(funnel_verdicts(stream), "stream_quality_filter", "append")
