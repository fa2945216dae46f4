"""Table maintenance: small-file compaction and file-size audits.

A job server that continuously materializes results (the reference
appends result tables per job, sqldb.go's INSERT loop; our
``results.py`` writes one parquet table per job, and the streaming
sinks' ``foreachBatch`` emits one file set per micro-batch) inevitably
accretes *small files*. At 100 TB that is the classic silent killer:
a scan over 10 M 1-MB files spends its wall-clock on file-open
round-trips and driver-side listing, not on reading bytes, and every
downstream shuffle inherits the tiny-partition fragmentation.

``compact_parquet`` rewrites a parquet table into size-targeted files:

- The file count comes from the table's ACTUAL on-disk bytes (listed
  through Spark's Hadoop FileSystem API, so the same code paths work
  on HDFS/S3/ABFS, not just ``file:``) divided by ``target_mb`` —
  never from a hardcoded partition count that silently stops fitting
  when the table grows 100×.
- ``sort_by`` optionally range-sorts the rewrite
  (``repartitionByRange`` + ``sortWithinPartitions``) so parquet
  min/max footers become selective — the poor man's clustering that
  turns post-compaction scans with predicates on the sort key into
  row-group skips.
- The rewrite streams executor-side (one wide transformation, no
  driver collect); ``maxRecordsPerFile`` is deliberately NOT used as
  the primary control because it caps rows per file without merging
  small inputs — the repartition is what actually coalesces.

Compaction writes to a fresh directory and atomically swaps only
after success (write-then-rename), so a failed compaction never
corrupts the live table — readers see the old files or the new ones,
nothing in between.

Relationship to ``results.ParquetResultBackend.compact``: that one is
the JOB-SERVER maintenance path (per-job result table, exact
target-file count, Observation-verified row count, lock-serialized
against the TTL reaper and concurrent compacts, exposed at
``POST /jobs/{id}/compact``). This module is the SOURCE-table
counterpart: size-targeted file planning from actual bytes and
optional sort-key clustering for footer pruning, for the corpus
tables jobs read from.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class TableFileStats:
    """On-disk shape of one parquet table directory."""

    n_files: int
    total_bytes: int
    max_file_bytes: int

    @property
    def avg_file_bytes(self) -> float:
        return self.total_bytes / self.n_files if self.n_files else 0.0


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def table_file_stats(spark: SparkSession, path: str) -> TableFileStats:
    """List a table directory through the Hadoop FileSystem API
    (works for file:/hdfs:/s3a: alike) and report its file shape.
    Only data files count — _SUCCESS/_committed markers and dotfiles
    are bookkeeping, not scan load."""
    fs, hpath = _hadoop_fs(spark, path)
    it = fs.listFiles(hpath, True)
    n = total = biggest = 0
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        size = status.getLen()
        n += 1
        total += size
        biggest = max(biggest, size)
    return TableFileStats(n_files=n, total_bytes=total, max_file_bytes=biggest)


def plan_file_count(total_bytes: int, target_mb: float = 256) -> int:
    """Files needed so each lands near ``target_mb`` (parquet's sweet
    spot for row-group sizing and S3 range reads; fractional values
    exist for tests on tiny fixtures). Always ≥1; the ceiling rounding
    biases small so files land under, not over, target."""
    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    target = max(1, int(target_mb * 1024 * 1024))
    return int(max(1, (total_bytes + target - 1) // target))


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: float = 256,
    sort_by: list[str] | None = None,
    compression: str = "zstd",
) -> TableFileStats:
    """Rewrite the parquet table at ``path`` into ~``target_mb`` files,
    atomically (write tmp dir → rename over). Returns the post-
    compaction file stats.

    ``sort_by`` range-partitions the rewrite on those columns and
    sorts within each file, giving parquet footer min/max pruning on
    the sort key for every subsequent scan.
    """
    before = table_file_stats(spark, path)
    n_out = plan_file_count(before.total_bytes, target_mb)

    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.coalesce(n_out) if n_out < before.n_files else df.repartition(n_out)

    parent, leaf = os.path.split(path.rstrip("/"))
    tmp = os.path.join(parent, f"_compact_{leaf}_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").option("compression", compression).parquet(tmp)

    # Swap: old table moves aside, new table takes its name, old files
    # delete last. Readers mid-swap see a complete table either way;
    # a crash before the second rename leaves the tmp dir (re-runnable)
    # and the live table untouched.
    fs, live = _hadoop_fs(spark, path)
    _, tmp_p = _hadoop_fs(spark, tmp)
    old = os.path.join(parent, f"_old_{leaf}_{uuid.uuid4().hex[:8]}")
    _, old_p = _hadoop_fs(spark, old)
    if not fs.rename(live, old_p):
        raise IOError(f"compaction swap failed: could not move {path} aside")
    if not fs.rename(tmp_p, live):
        fs.rename(old_p, live)  # roll back, table untouched
        raise IOError(f"compaction swap failed: could not move {tmp} into place")
    fs.delete(old_p, True)
    return table_file_stats(spark, path)
