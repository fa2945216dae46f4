"""Bucketed tables: co-located, shuffle-free joins for hot key paths.

At 100 TB the single biggest recurring cost in a job server's workload
is re-shuffling the same fact tables on the same join keys for every
job. Bucketing amortizes it: write the table once, hash-clustered on
the join key into N buckets; every subsequent equi-join or aggregate
on that key reads co-located buckets and skips its Exchange entirely.
This is the Spark-native analog of the reference's "results are
cheaper to read than the source query" philosophy applied to sources.

Sizing: pick buckets so one bucket ≈ 100-500 MB compressed (e.g. a
10 TB table → 32-64k buckets). Both join sides must agree on bucket
count (or be multiples, with ``spark.sql.bucketing.coalesceBucketsInJoin``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets lets sort-merge joins skip their per-task
    sort as well — the join becomes a pure streaming zip of the two
    bucket files.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
