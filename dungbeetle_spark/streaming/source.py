"""File-source construction for the streaming operators.

The reference has no streaming surface (SURVEY.md §7 risk 6); these are
north-star extensions. All streaming queries read the same ``events``
parquet the batch queries use, through ``readStream`` with an
``availableNow`` trigger, so each drained stream is deterministically
comparable to a batch SQL oracle over the identical rows.

At 100 TB the same plans run against a directory or Kafka source
continuously; nothing below is local-mode-specific except the
symlinked temp dir (FileStreamSource wants a directory, the fixture is
a single file — the symlink is zero-copy).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` as an unbounded DataFrame with a proper timestamp ``ts``.

    Applies the same TIMESTAMP(NANOS)→µs normalization as the batch
    loader (sources/catalog.py) so stream and batch plans see one
    schema.
    """
    from dungbeetle_spark.sources.catalog import load_tables

    src_dir = tempfile.mkdtemp(prefix="dungbeetle_stream_src_")
    link = f"{src_dir}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    batch = load_tables(spark, sf_dir, ["events"])["events"]
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(src_dir)
    if dict(batch.dtypes)["ts"] != dict(stream.dtypes)["ts"]:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def drain_to_table(agg, name: str, output_mode: str) -> str:
    """Run a streaming DataFrame to completion into a memory sink.

    ``availableNow`` processes every available input split and then the
    final no-data micro-batch (watermark advanced to max event time),
    so event-time timeouts and window finalization all fire before
    termination — the memory table holds the complete, deterministic
    result.
    """
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return name
