"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dungbeetle_spark`` (see SURVEY.md §7); this
module adapts its query registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from dungbeetle_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the reference's own `get_profit_summary` task
    (sql/pg/test.postgres.sql:8-12) mapped onto the events table,
    executed through the full job pipeline: enqueue → worker →
    canonical-cast → results_<job_id> parquet → read back.
    """
    from dungbeetle_spark.core import Core, JobReq
    import tempfile
    import time

    sf_dir = "/root/testdata/sf0.001"
    core = Core(spark)
    core.add_source("testdata", sf_dir)
    core.add_result_backend(
        "default", tempfile.mkdtemp(prefix="dungbeetle_results_")
    )
    core.register_callable_task(
        "get_profit_summary",
        lambda sess, args: registry()["profit_summary"].build(sess, sf_dir),
    )
    core.start()
    resp = core.new_job("get_profit_summary", JobReq(job_id="flagship"))
    deadline = time.time() + 120
    while time.time() < deadline:
        st = core.job_status(resp.job_id)
        if st["state"] in ("SUCCESS", "FAILURE"):
            break
        time.sleep(0.2)
    if st["state"] != "SUCCESS":
        raise RuntimeError(f"flagship job failed: {st}")
    return core.read_result(resp.job_id)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in registry().items()
        if spec.oracle is not None
    }
