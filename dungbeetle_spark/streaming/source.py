"""File-source construction + drain for the streaming operators.

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

import atexit
import os
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Per-process caches so a long-lived job server doesn't leak one temp
# dir per streaming call (each used to mkdtemp on every invocation).
_SRC_DIRS: dict[str, str] = {}
_OUT_DIRS: dict[str, str] = {}
_DIR_LOCK = threading.Lock()


@atexit.register
def _cleanup_dirs() -> None:  # pragma: no cover - process teardown
    for d in list(_SRC_DIRS.values()) + list(_OUT_DIRS.values()):
        shutil.rmtree(d, ignore_errors=True)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` as an unbounded DataFrame with a proper timestamp ``ts``.

    Applies the same TIMESTAMP(NANOS)→µs normalization as the batch
    loader (sources/catalog.py) so stream and batch plans see one
    schema.
    """
    from dungbeetle_spark.sources.catalog import load_tables

    with _DIR_LOCK:
        src_dir = _SRC_DIRS.get(sf_dir)
        if src_dir is None:
            src_dir = tempfile.mkdtemp(prefix="dungbeetle_stream_src_")
            os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
            _SRC_DIRS[sf_dir] = src_dir
    batch = load_tables(spark, sf_dir, ["events"])["events"]
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(src_dir)
    if dict(batch.dtypes)["ts"] != dict(stream.dtypes)["ts"]:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def drain_to_df(agg: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion; return the result as a
    batch DataFrame over parquet.

    ``availableNow`` processes every available input split and then the
    final no-data micro-batch (watermark advanced to max event time),
    so event-time timeouts and window finalization all fire before
    termination — the parquet output holds the complete, deterministic
    result.

    Two scale choices vs the old memory-sink drain:

    - **foreachBatch → parquet**, not ``format("memory")``: the memory
      sink collects every batch into driver heap — fine for tests, a
      driver OOM on a real stream. The parquet write is executor-
      parallel and lands results in the same warehouse format as every
      batch job, so the job layer's result backend can serve it.
      ``complete`` mode overwrites per trigger (the final trigger holds
      the full aggregate); ``append`` mode accumulates.
    - **state partitions = cluster parallelism**, not the 200-partition
      default: ``spark.sql.shuffle.partitions`` is baked into a
      streaming checkpoint at creation, and every stateful partition
      costs a state-store instance (and a Python worker round-trip for
      applyInPandasWithState) per micro-batch. On a real cluster you'd
      size this to executors × cores; locally the driver-default 200
      makes tiny drains ~5× slower.
    """
    spark = agg.sparkSession
    with _DIR_LOCK:
        out_dir = _OUT_DIRS.get(name)
        if out_dir is None:
            out_dir = tempfile.mkdtemp(prefix=f"dungbeetle_stream_out_{name}_")
            _OUT_DIRS[name] = out_dir
    # Fresh output per drain: complete-mode overwrites anyway; append
    # mode must not accumulate across two drains of the same query.
    for entry in os.listdir(out_dir):
        shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
    data_dir = os.path.join(out_dir, "data")

    append = output_mode != "complete"
    write_lock = threading.Lock()

    def write_batch(bdf: DataFrame, _batch_id: int) -> None:
        with write_lock:  # micro-batches are sequential, but be explicit
            bdf.write.mode("append" if append else "overwrite").parquet(data_dir)

    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 1)),
        )
        with tempfile.TemporaryDirectory(prefix="dungbeetle_ckpt_") as ckpt:
            q = (
                agg.writeStream.foreachBatch(write_batch)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        else:  # pragma: no cover - default sessions always carry a value
            spark.conf.unset("spark.sql.shuffle.partitions")
    if not os.path.isdir(data_dir):  # no batch produced rows
        return spark.createDataFrame([], agg.schema)
    return spark.read.parquet(data_dir)
