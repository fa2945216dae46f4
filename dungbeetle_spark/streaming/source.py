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
from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Per-process caches so a long-lived job server doesn't leak one temp
# dir per streaming call (each used to mkdtemp on every invocation).
_SRC_DIRS: dict[str, str] = {}
_OUT_PARENTS: dict[str, str] = {}
_OUT_HISTORY: dict[str, deque] = {}
_STREAM_SESSIONS: dict[int, SparkSession] = {}
_DIR_LOCK = threading.Lock()

# Completed drain outputs retained per query name. The DataFrame a
# drain returns reads its parquet lazily; retention keeps the last few
# drains' files alive so an earlier result stays readable while newer
# jobs for the same query land. (Result PERSISTENCE is the job layer's
# result backend — these dirs are scratch.)
_KEEP_DRAINS = 8


@atexit.register
def _cleanup_dirs() -> None:  # pragma: no cover - process teardown
    for d in list(_SRC_DIRS.values()) + list(_OUT_PARENTS.values()):
        shutil.rmtree(d, ignore_errors=True)


def streaming_session(spark: SparkSession) -> SparkSession:
    """A cloned session (shared SparkContext, isolated conf) tuned for
    streaming drains, memoized per parent session.

    Stateful streaming bakes ``spark.sql.shuffle.partitions`` into
    each checkpoint, and every stateful partition costs a state-store
    instance (plus a Python worker round-trip for
    applyInPandasWithState) per micro-batch — a vanilla 200-partition
    session makes tiny drains ~5× slower. Mutating the CALLER's conf
    around the drain would race concurrent jobs on the shared session
    (set/restore interleavings can strand the override), so the tuning
    lives on a clone that nothing else plans against.
    """
    with _DIR_LOCK:
        s = _STREAM_SESSIONS.get(id(spark))
        if s is None:
            s = spark.newSession()
            s.conf.set(
                "spark.sql.shuffle.partitions",
                str(max(spark.sparkContext.defaultParallelism, 1)),
            )
            try:
                s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            except Exception:  # noqa: BLE001 - conf locked; inherit defaults
                pass
            _STREAM_SESSIONS[id(spark)] = s
    return s


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` as an unbounded DataFrame with a proper timestamp ``ts``.

    Applies the same TIMESTAMP(NANOS)→µs normalization as the batch
    loader (sources/catalog.py) so stream and batch plans see one
    schema. The returned stream is bound to the tuned streaming clone
    (``streaming_session``); build any static join sides on
    ``df.sparkSession`` so both sides share that session.
    """
    from dungbeetle_spark.sources.catalog import load_tables

    sess = streaming_session(spark)
    with _DIR_LOCK:
        src_dir = _SRC_DIRS.get(sf_dir)
        if src_dir is None:
            src_dir = tempfile.mkdtemp(prefix="dungbeetle_stream_src_")
            os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
            _SRC_DIRS[sf_dir] = src_dir
    batch = load_tables(sess, sf_dir, ["events"])["events"]
    raw_schema = sess.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = sess.readStream.schema(raw_schema).parquet(src_dir)
    if dict(batch.dtypes)["ts"] != dict(stream.dtypes)["ts"]:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def drain_to_df(
    agg: DataFrame,
    name: str,
    output_mode: str,
    transform=None,
) -> DataFrame:
    """Run a streaming DataFrame to completion; return the result as a
    batch DataFrame over parquet.

    ``availableNow`` processes every available input split and then the
    final no-data micro-batch (watermark advanced to max event time),
    so event-time timeouts and window finalization all fire before
    termination — the parquet output holds the complete, deterministic
    result.

    Scale/concurrency choices vs a memory-sink drain:

    - **foreachBatch → parquet**, not ``format("memory")``: the memory
      sink collects every batch into driver heap — fine for tests, a
      driver OOM on a real stream. The parquet write is executor-
      parallel and lands results in the same warehouse format as every
      batch job, so the job layer's result backend can serve it.
      ``complete`` mode overwrites per trigger (the final trigger holds
      the full aggregate); ``append`` mode accumulates.
    - **A unique output dir per drain**: concurrent jobs for the same
      streaming task (or the same task on two sources) must not share
      or wipe each other's output. The last ``_KEEP_DRAINS`` outputs
      per name are retained so previously returned (lazy) DataFrames
      stay readable; older ones are deleted to bound scratch space.
    - State-partition tuning comes from the stream's own cloned
      session (see ``streaming_session``) — the caller's session conf
      is never touched.
    """
    spark = agg.sparkSession
    with _DIR_LOCK:
        parent = _OUT_PARENTS.get(name)
        if parent is None:
            parent = tempfile.mkdtemp(prefix=f"dungbeetle_stream_out_{name}_")
            _OUT_PARENTS[name] = parent
            _OUT_HISTORY[name] = deque()
        out_dir = tempfile.mkdtemp(prefix="drain_", dir=parent)
        hist = _OUT_HISTORY[name]
        hist.append(out_dir)
        while len(hist) > _KEEP_DRAINS:
            shutil.rmtree(hist.popleft(), ignore_errors=True)
    data_dir = os.path.join(out_dir, "data")

    append = output_mode != "complete"

    def write_batch(bdf: DataFrame, _batch_id: int) -> None:
        # foreachBatch hands over a plain batch DataFrame, so an
        # optional per-batch transform may use full batch semantics —
        # stream-static joins, per-batch aggregation — that the
        # streaming planner would reject or force state onto. This is
        # the standard production shape for ingest gates probing
        # materialized reference state.
        if transform is not None:
            bdf = transform(bdf)
        bdf.write.mode("append" if append else "overwrite").parquet(data_dir)

    with tempfile.TemporaryDirectory(prefix="dungbeetle_ckpt_") as ckpt:
        q = (
            agg.writeStream.foreachBatch(write_batch)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if not os.path.isdir(data_dir):  # no batch produced rows
        empty = spark.createDataFrame([], agg.schema)
        return transform(empty) if transform is not None else empty
    return spark.read.parquet(data_dir)


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Any fixture table as an unbounded file-source DataFrame (no
    timestamp normalization — use :func:`stream_events` for ``events``).
    Bound to the tuned streaming clone like every other stream here.
    ``max_files_per_trigger`` splits a multi-file table directory into
    that many files per micro-batch — the tests use it to prove
    stream-static operators are batch-local-correct across REAL batch
    boundaries, not just on the fixture's single-batch drain."""
    sess = streaming_session(spark)
    key = f"{sf_dir}:{table}"
    with _DIR_LOCK:
        src_dir = _SRC_DIRS.get(key)
        if src_dir is None:
            src_dir = tempfile.mkdtemp(prefix="dungbeetle_stream_src_")
            os.symlink(f"{sf_dir}/{table}.parquet", f"{src_dir}/{table}.parquet")
            _SRC_DIRS[key] = src_dir
    schema = sess.read.parquet(f"{sf_dir}/{table}.parquet").schema
    reader = sess.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # recursiveFileLookup: when the fixture "file" is actually a
        # multi-split table DIRECTORY (how the multi-batch tests force
        # several micro-batches), the file source must descend into it
        # — without this the listing sees zero files and the drain
        # silently produces no batches at all.
        reader = reader.option(
            "maxFilesPerTrigger", max_files_per_trigger
        ).option("recursiveFileLookup", "true")
    return reader.parquet(src_dir)


def stream_parquet_dir(spark: "SparkSession", path: str) -> DataFrame:
    """An arbitrary parquet DIRECTORY (e.g. a job result table) as an
    unbounded file-source DataFrame — the rollover gates stream the
    shipped evolved-corpus snapshot table, which lives at a result
    backend path rather than under a fixture dir. Schema is inferred
    from a batch read of the same path; bound to the tuned streaming
    clone like every other stream here."""
    sess = streaming_session(spark)
    schema = sess.read.parquet(path).schema
    return sess.readStream.schema(schema).parquet(path)
