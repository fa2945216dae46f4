"""Result materialization: per-job result tables with canonical types.

The reference streams each job's rows into a freshly created table
``results_<job_id>`` in a results database, collapsing source column
types into a small canonical set — BIGINT / DECIMAL / TIMESTAMP / DATE /
BOOLEAN / JSON / TEXT (reference: internal/resultbackends/sqldb/
sqldb.go:230-305; README "Results"). Schema generation is cached per
task name (sqldb.go:38-41, 147-153) and every job DROPs + re-CREATEs
its own table (sqldb.go:179-186) — i.e. overwrite semantics.

Spark-first mapping: the whole row-at-a-time INSERT pipeline
(core.go:556-565, sqldb.go:195-207 — one INSERT per row in one tx)
collapses to a single columnar write::

    df.select(*canonical_casts).write.mode("overwrite").parquet(path)

which is parallel, compressed, and scales to any cluster size; the
"one transaction per result set" property maps to parquet's
atomic-enough directory swap (same guarantee level as the reference's
DROP+CREATE window).
"""

from __future__ import annotations

import random
import re
import shutil
import threading
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical collapse of Spark types, mirroring sqldb.go:254-281.
# DECIMAL(38,18) covers postgres NUMERIC semantics for aggregates.
_DECIMAL = T.DecimalType(38, 18)


def canonical_type(dt: T.DataType) -> T.DataType:
    """Map an arbitrary Spark type onto the reference's canonical set."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return T.LongType()  # INT* → BIGINT (sqldb.go:257-258)
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        # FLOAT/DOUBLE/NUMERIC → DECIMAL (sqldb.go:259-260). Keep an
        # explicit decimal so the golden schema check (`total` →
        # numeric, server_test.go.bak:282-285) holds.
        return dt if isinstance(dt, T.DecimalType) else _DECIMAL
    if isinstance(dt, T.TimestampNTZType):
        return T.TimestampNTZType()
    if isinstance(dt, T.TimestampType):
        return T.TimestampType()  # TIMESTAMP/DATETIME (sqldb.go:261-262)
    if isinstance(dt, T.DateType):
        return T.DateType()  # DATE (sqldb.go:263-264)
    if isinstance(dt, T.BooleanType):
        return T.BooleanType()  # BOOLEAN (sqldb.go:265-266)
    if isinstance(dt, T.ArrayType):
        # pg array passthrough (_INT4/_INT8/_TEXT, sqldb.go:273-276):
        # collapse the element type, keep the array.
        return T.ArrayType(canonical_type(dt.elementType), dt.containsNull)
    # JSON/VARCHAR/everything else → TEXT (sqldb.go:267-280). Structs
    # and maps don't exist in the reference's model; serialize to JSON
    # text to honor the collapse contract.
    return T.StringType()


def canonical_cast(df: DataFrame) -> DataFrame:
    """Project ``df`` onto canonical result types (§1.3 of SURVEY.md)."""
    cols = []
    for f_ in df.schema.fields:
        target = canonical_type(f_.dataType)
        if isinstance(f_.dataType, (T.StructType, T.MapType)):
            cols.append(F.to_json(F.col(f_.name)).alias(f_.name))
        elif target == f_.dataType:
            cols.append(F.col(f_.name))
        else:
            cols.append(F.col(f_.name).cast(target).alias(f_.name))
    return df.select(*cols)


_TABLE_RE = re.compile(r"%s")


class ParquetResultBackend:
    """One named results warehouse (a directory of per-job tables).

    Mirrors ``sqldb.SQLDBResultBackend``: configurable table-name
    template defaulting to ``results_%s`` (sqldb.go:77-81, 99), a
    per-task schema cache standing in for the reference's cached
    CREATE/INSERT DDL (sqldb.go:38-41), and overwrite-per-job
    semantics.
    """

    def __init__(self, name: str, path: str, table_template: str = "results_%s"):
        if "%s" not in table_template:
            table_template += "_%s"
        self.name = name
        self.path = path.rstrip("/")
        self.table_template = table_template
        # task name → StructType, the IsColTypesRegistered analog
        # (sqldb.go:147-153). Purely observational in Spark (inference
        # is free) but kept for the schema-stability contract: a task's
        # result schema must not drift between jobs.
        self._schemas: dict[str, T.StructType] = {}
        self._lock = threading.Lock()
        self._compacting: set[str] = set()  # tables mid-compaction

    # -- naming -------------------------------------------------------
    def table_name(self, job_id: str) -> str:
        return self.table_template % job_id

    def table_path(self, job_id: str) -> str:
        return f"{self.path}/{self.table_name(job_id)}"

    # -- schema cache (RegisterColTypes / IsColTypesRegistered) -------
    def is_registered(self, task_name: str) -> bool:
        with self._lock:
            return task_name in self._schemas

    def registered_schema(self, task_name: str) -> T.StructType | None:
        with self._lock:
            return self._schemas.get(task_name)

    # -- materialization ----------------------------------------------
    def write(
        self,
        job_id: str,
        task_name: str,
        df: DataFrame,
        partition_by: Iterable[str] = (),
    ) -> int:
        """Canonical-cast + overwrite ``results_<job_id>``; return rowcount.

        The row count is the job's only "result" payload, surfaced by
        status polls (core.go:436, 183-190). It comes from an
        ``Observation`` on the write pass itself — rows are counted as
        they stream through the writer, so there is no second scan of
        the result (and no recompute of the query): the 100 TB-correct
        way to get write metrics.
        """
        from pyspark.sql import Observation

        obs = Observation()
        out = canonical_cast(df).observe(obs, F.count(F.lit(1)).alias("n"))
        with self._lock:
            self._schemas.setdefault(task_name, out.schema)
        path = self.table_path(job_id)
        writer = out.write.mode("overwrite")
        cols = list(partition_by)
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(path)
        return int(obs.get["n"])

    def read(self, spark: SparkSession, job_id: str) -> DataFrame:
        return spark.read.parquet(self.table_path(job_id))

    def delete(self, job_id: str) -> None:
        with self._lock:  # serialize vs a concurrent compact's swap
            shutil.rmtree(self.table_path(job_id), ignore_errors=True)

    def compact(
        self, spark: SparkSession, job_id: str, target_files: int = 1
    ) -> int:
        """Rewrite ``results_<job_id>`` into ``target_files`` files.

        Warehouse maintenance: a result written by a wide cluster
        lands one file per task — at 100 TB the per-job table sprawl
        becomes a metadata/open-cost problem for every reader. The
        rewrite lands in a sibling temp dir with the row count taken
        from an Observation on the write pass (no re-read), is
        verified against the source count, and swaps via rename under
        the backend lock (serialized against delete/reaper and other
        compacts — the crash window between the two renames is the
        same guarantee level as the reference's DROP+CREATE,
        sqldb.go:179-186). Hive-partitioned result tables
        (``partition_by`` tasks) are refused: a flat rewrite would
        drop the layout and partition-type inference can corrupt
        key values (e.g. leading zeros). Returns the row count.
        """
        import os

        from pyspark.sql import Observation

        path = self.table_path(job_id)
        if any(
            "=" in entry and os.path.isdir(os.path.join(path, entry))
            for entry in os.listdir(path)
        ):
            raise NotImplementedError(
                f"{path} is hive-partitioned (partition_by task); "
                "compaction would flatten the layout"
            )
        import glob
        import uuid

        # One compaction per table at a time: a second concurrent call
        # fails fast instead of racing the first one's scratch dirs.
        with self._lock:
            if path in self._compacting:
                raise RuntimeError(f"compaction of {path} already in progress")
            self._compacting.add(path)
            # stale scratch from crashed runs (safe: no live compact)
            for stale in glob.glob(f"{path}__compacting_*") + glob.glob(
                f"{path}__old_*"
            ):
                shutil.rmtree(stale, ignore_errors=True)
        token = uuid.uuid4().hex[:8]
        tmp = f"{path}__compacting_{token}"
        old = f"{path}__old_{token}"
        try:
            df = spark.read.parquet(path)
            n_before = df.count()
            obs = Observation()
            (
                df.observe(obs, F.count(F.lit(1)).alias("n"))
                .coalesce(max(target_files, 1))
                .write.mode("overwrite")
                .parquet(tmp)
            )
            n_after = int(obs.get["n"])
            if n_after != n_before:  # pragma: no cover - write corruption
                raise RuntimeError(
                    f"compaction of {path} changed row count "
                    f"({n_before} -> {n_after}); original left untouched"
                )
            with self._lock:
                if not os.path.isdir(path):  # deleted/reaped mid-compact
                    raise FileNotFoundError(
                        f"{path} was deleted during compaction"
                    )
                os.rename(path, old)
                os.rename(tmp, path)
                shutil.rmtree(old, ignore_errors=True)
            return n_after
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            with self._lock:
                self._compacting.discard(path)


class ResultBackends:
    """Named backend registry with random routing (results.go:30-63)."""

    def __init__(self, backends: Mapping[str, ParquetResultBackend] | None = None):
        self._backends: dict[str, ParquetResultBackend] = dict(backends or {})

    def add(self, backend: ParquetResultBackend) -> None:
        self._backends[backend.name] = backend

    def names(self) -> list[str]:
        return list(self._backends)

    def get(self, name: str) -> ParquetResultBackend:
        try:
            return self._backends[name]
        except KeyError:
            raise KeyError(f"unknown result backend: {name}") from None

    def get_random(self, names: Iterable[str] | None = None) -> ParquetResultBackend:
        pool = list(names) if names else list(self._backends)
        if not pool:
            raise ValueError("no result backends configured")
        return self.get(random.choice(pool))

    def filter_by_tags(self, tags: Iterable[str]) -> list[str]:
        tags = [t for t in tags if t]
        for t in tags:
            if t not in self._backends:
                raise KeyError(f"unknown result backend {t} in task tag")
        return tags or list(self._backends)

    def __len__(self) -> int:
        return len(self._backends)


class JdbcResultBackend:
    """Results written to an external SQL database over JDBC — the
    direct analog of the reference's SQL result backends
    (internal/resultbackends/sqldb/sqldb.go): per-job table
    ``results_<job_id>``, overwrite semantics, canonical type collapse
    before the write (Spark's JDBC writer maps LongType→BIGINT,
    DecimalType→NUMERIC, etc., landing the same schema the reference
    produces).

    Scale notes: ``numPartitions`` bounds concurrent INSERT
    connections (the reference's max_active analog) and ``batchsize``
    replaces its row-at-a-time INSERT loop with batched writes.
    Requires the vendor driver jar; construction is cheap/validated,
    connection happens at write time.
    """

    def __init__(
        self,
        name: str,
        url: str,
        properties: Mapping[str, str] | None = None,
        table_template: str = "results_%s",
        num_partitions: int = 8,
        batchsize: int = 10_000,
        dbapi_connect=None,
    ):
        if not url.startswith("jdbc:"):
            raise ValueError(f"JDBC url must start with 'jdbc:': {url!r}")
        if "%s" not in table_template:
            table_template += "_%s"
        self.name = name
        self.url = url
        self.properties = dict(properties or {})
        self.table_template = table_template
        self.num_partitions = num_partitions
        self.batchsize = batchsize
        # DDL seam: Spark's JDBC writer has no DROP TABLE path, so TTL
        # deletion needs a direct DBAPI connection (psycopg2 / mysql
        # driver / sqlite3). Callers inject a zero-arg factory; sqlite
        # URLs get one automatically (stdlib).
        self.dbapi_connect = dbapi_connect
        self._schemas: dict[str, T.StructType] = {}
        self._lock = threading.Lock()

    def table_name(self, job_id: str) -> str:
        return self.table_template % job_id

    def table_path(self, job_id: str) -> str:
        return f"{self.url}#{self.table_name(job_id)}"

    def is_registered(self, task_name: str) -> bool:
        with self._lock:
            return task_name in self._schemas

    def write(
        self,
        job_id: str,
        task_name: str,
        df: DataFrame,
        partition_by: Iterable[str] = (),  # noqa: ARG002 — JDBC tables are flat
    ) -> int:
        from pyspark.sql import Observation

        # Count on the write pass itself (Observation): re-reading the
        # written table would be a SECOND full transfer over JDBC.
        obs = Observation()
        out = (
            canonical_cast(df)
            .coalesce(self.num_partitions)
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        with self._lock:
            self._schemas.setdefault(task_name, out.schema)
        (
            out.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table_name(job_id))
            .option("batchsize", str(self.batchsize))
            .options(**self.properties)
            .mode("overwrite")
            .save()
        )
        return int(obs.get["n"])

    def read(self, spark: SparkSession, job_id: str) -> DataFrame:
        return (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table_name(job_id))
            .options(**self.properties)
            .load()
        )

    def _connect(self):
        if self.dbapi_connect is not None:
            return self.dbapi_connect()
        if self.url.startswith("jdbc:sqlite:"):
            import sqlite3

            return sqlite3.connect(self.url[len("jdbc:sqlite:") :])
        raise NotImplementedError(
            "JDBC result deletion needs a DBAPI connection factory "
            f"(dbapi_connect=...) for {self.url.split(':', 2)[1]} urls; "
            "without one, configure retention on the results database"
        )

    def delete(self, job_id: str) -> None:
        """DROP the job's result table via a direct DBAPI connection.

        The reference documents TTL as unsupported on SQL backends
        (README 'ttl' row); here the reaper covers JDBC too, issuing
        the same DROP TABLE its parquet twin does with rmtree
        (sqldb.go:179-186 is the overwrite-path DROP this mirrors).
        """
        name = self.table_name(job_id)
        # MySQL-family servers reject ANSI double-quoted identifiers
        # under the default sql_mode — a wrongly-quoted DROP would be
        # retried by the reaper forever as a 'transient' failure.
        if self.url.startswith(("jdbc:mysql:", "jdbc:mariadb:")):
            table = "`" + name.replace("`", "``") + "`"
        else:
            table = '"' + name.replace('"', '""') + '"'
        con = self._connect()
        try:
            cur = con.cursor()
            cur.execute(f"DROP TABLE IF EXISTS {table}")
            con.commit()
        finally:
            con.close()
