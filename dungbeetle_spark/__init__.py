"""dungbeetle_spark — a PySpark-native rebuild of zerodha/dungbeetle.

The reference (github.com/zerodha/dungbeetle, studied read-only at
/root/reference) is a distributed SQL *job server*: it loads named SQL
tasks from .sql files, queues job executions over HTTP, runs the SQL
against external databases, and materializes each job's result set into
a per-job results table (reference: internal/core/core.go).

This package re-expresses that architecture Spark-first:

- Spark SQL/Catalyst plays the role of the "source database" — the full
  relational surface (joins, windows, rollups, set ops, …) comes from
  Catalyst rather than being delegated to Postgres/MySQL.
- The job layer (task catalog, named queues, async workers, job states,
  retries, ETA, cancellation) is plain Python around Spark job groups
  and FAIR scheduler pools.
- Result materialization is a single columnar
  ``df.write.mode("overwrite")`` per job — replacing the reference's
  row-at-a-time INSERT loop (core.go:556-565, sqldb.go:195-207).

Beyond reference parity, ``operators/`` adds the large-scale
training-data-pipeline surface: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search, text analysis,
and multimodal column plumbing — each designed for 100 TB scale.
"""

__version__ = "0.1.0"

from dungbeetle_spark.session import get_spark, stop_spark  # noqa: F401
