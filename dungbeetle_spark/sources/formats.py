"""Additional source formats: delimited/JSON/ORC files and JDBC.

The reference's sources are live SQL databases (Postgres / MySQL /
ClickHouse — internal/dbpool/dbpool.go); its results flow back into
another SQL database. In the Spark rebuild a source is anything Spark
can scan. This module widens the built-in ``ParquetSource`` to:

- **FileSource** — any Spark file format (``parquet``, ``csv``,
  ``json``, ``orc``, ``text``) with per-source reader options and
  optional explicit schemas. CSV/JSON scans don't carry parquet's
  row-group pruning, but column pruning and (for CSV) predicate
  filtering still happen in the scan node, and splittable files
  parallelize by ``spark.sql.files.maxPartitionBytes``.
- **JdbcSource** — the straight analog of the reference's DB pool
  entry: one named external database reachable over JDBC. Reads are
  partition-parallel when ``partition_column`` bounds are given
  (each executor issues its own bounded SELECT — the Spark-native
  version of the reference's connection pool fan-out), and Catalyst
  pushes filters/projections into the remote SQL. Requires the
  vendor driver jar on the classpath; construction is cheap and
  validated, connection happens at registration.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import SparkSession

from dungbeetle_spark.sources.catalog import TABLES, _fix_nanos


class FileSource:
    """One named source: a directory of ``<table>.<ext>`` files in any
    Spark-readable file format."""

    def __init__(
        self,
        name: str,
        path: str,
        tables: Iterable[str] = TABLES,
        fmt: str = "parquet",
        options: Mapping[str, str] | None = None,
        schemas: Mapping[str, str] | None = None,
    ):
        self.name = name
        self.path = path
        self.tables = tuple(tables)
        self.fmt = fmt
        self.options = dict(options or {})
        self.schemas = dict(schemas or {})

    def _reader(self, spark: SparkSession, table: str):
        reader = spark.read.format(self.fmt).options(**self.options)
        if table in self.schemas:
            reader = reader.schema(self.schemas[table])
        return reader

    def register(self, spark: SparkSession) -> None:
        for t in self.tables:
            df = self._reader(spark, t).load(f"{self.path}/{t}.{self.fmt}")
            _fix_nanos(df).createOrReplaceTempView(t)

    def __repr__(self) -> str:  # pragma: no cover
        return f"FileSource({self.name!r}, {self.path!r}, fmt={self.fmt!r})"


class JdbcSource:
    """One named external SQL database, read over JDBC.

    Mirrors one ``[db.*]`` entry of the reference's config
    (internal/dbpool/dbpool.go:16-26): a named connection the task
    router can pin via ``-- db:`` tags. Partitioned reads replace the
    reference's connection-pool concurrency: with
    ``partition_column/lower/upper/num_partitions`` set per table,
    Spark opens ``num_partitions`` bounded cursors in parallel.
    ``fetchsize`` plays the role of the driver's row-buffer tuning.
    """

    def __init__(
        self,
        name: str,
        url: str,
        tables: Iterable[str] = (),
        properties: Mapping[str, str] | None = None,
        partitioning: Mapping[str, Mapping[str, object]] | None = None,
        fetchsize: int = 10_000,
    ):
        if not url.startswith("jdbc:"):
            raise ValueError(f"JDBC url must start with 'jdbc:': {url!r}")
        self.name = name
        self.url = url
        self.tables = tuple(tables)
        self.properties = dict(properties or {})
        self.partitioning = {k: dict(v) for k, v in (partitioning or {}).items()}
        self.fetchsize = fetchsize

    def reader(self, spark: SparkSession, table: str):
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("fetchsize", str(self.fetchsize))
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        part = self.partitioning.get(table)
        if part:
            reader = (
                reader.option("partitionColumn", str(part["column"]))
                .option("lowerBound", str(part["lower"]))
                .option("upperBound", str(part["upper"]))
                .option("numPartitions", str(part.get("num_partitions", 8)))
            )
        return reader

    def register(self, spark: SparkSession) -> None:
        for t in self.tables:
            self.reader(spark, t).load().createOrReplaceTempView(t)

    def __repr__(self) -> str:  # pragma: no cover
        return f"JdbcSource({self.name!r}, {self.url!r})"
