"""Source-format coverage: csv / json file sources and the JDBC spec.

The reference attaches named external databases and routes tasks to
them (dbpool.go); here any Spark-readable format is a source. These
tests prove format-agnostic routing end-to-end: the same task SQL runs
against a parquet source and a csv/json copy of the same rows and
returns identical values.
"""

from __future__ import annotations

import time

import pytest

from dungbeetle_spark.core import Core, JobReq
from dungbeetle_spark.sources.formats import FileSource, JdbcSource

TASK = """\
-- name: nations_of_region
SELECT n.n_name AS nation
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = $1
ORDER BY n.n_name
"""

_NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int, n_comment string"
_REGION_SCHEMA = "r_regionkey int, r_name string, r_comment string"


@pytest.fixture(scope="module")
def format_dirs(spark, sf_smoke, tmp_path_factory):
    """region + nation exported to csv and json from the parquet."""
    out = {}
    for fmt in ("csv", "json"):
        root = tmp_path_factory.mktemp(f"src_{fmt}")
        for t in ("region", "nation"):
            df = spark.read.parquet(f"{sf_smoke}/{t}.parquet")
            w = df.coalesce(1).write.mode("overwrite")
            if fmt == "csv":
                w = w.option("header", "true")
            w.format(fmt).save(str(root / f"{t}.{fmt}"))
        out[fmt] = str(root)
    return out


def _run(core: Core, args: list[str]) -> list[str]:
    resp = core.new_job("nations_of_region", JobReq(args=args))
    deadline = time.time() + 60
    while time.time() < deadline:
        st = core.job_status(resp.job_id)
        if st["state"] in ("SUCCESS", "FAILURE"):
            assert st["state"] == "SUCCESS", st["error"]
            return [r["nation"] for r in core.read_result(resp.job_id).collect()]
        time.sleep(0.1)
    raise AssertionError("job did not finish")


@pytest.fixture(scope="module")
def multi_format_core(spark, sf_smoke, format_dirs, tmp_path_factory):
    sql_dir = tmp_path_factory.mktemp("tasks_fmt")
    (sql_dir / "t.sql").write_text(TASK)
    c = Core(spark, worker_concurrency=2)
    c.add_source("pq", sf_smoke)
    c.add_source_obj(
        FileSource(
            "csv",
            format_dirs["csv"],
            tables=("region", "nation"),
            fmt="csv",
            options={"header": "true"},
            schemas={"region": _REGION_SCHEMA, "nation": _NATION_SCHEMA},
        )
    )
    c.add_source_obj(
        FileSource("js", format_dirs["json"], tables=("region", "nation"), fmt="json")
    )
    c.load_task_dirs([str(sql_dir)])
    c.add_result_backend("default", str(tmp_path_factory.mktemp("results_fmt")))
    c.start()
    yield c
    c.stop()


def test_same_sql_all_formats(multi_format_core, spark):
    """Explicit db routing: identical values from parquet, csv, json."""
    expected = None
    for db in ("pq", "csv", "js"):
        sess, df = multi_format_core.build_dataframe(
            "nations_of_region", ["ASIA"], db=db
        )
        got = [r[0] for r in df.collect()]
        assert got, f"{db}: empty result"
        if expected is None:
            expected = got
        else:
            assert got == expected, f"{db} differs from parquet"


def test_job_through_random_source_routing(multi_format_core):
    """Without a pinned db the router picks any attached source —
    results must be identical regardless (dbpool.go:72-103 analog)."""
    nations = _run(multi_format_core, ["AFRICA"])
    assert nations == sorted(nations) and len(nations) > 0


def test_csv_scan_prunes_and_filters(multi_format_core):
    from dungbeetle_spark.plans.inspect import formatted_plan

    sess, df = multi_format_core.build_dataframe(
        "nations_of_region", ["EUROPE"], db="csv"
    )
    plan = formatted_plan(df)
    # projection pruning reaches the csv scan: no comment columns read
    assert "n_comment" not in "".join(
        s for s in plan.splitlines() if "ReadSchema" in s
    )


def test_jdbc_source_spec():
    src = JdbcSource(
        "pg",
        "jdbc:postgresql://db:5432/app",
        tables=("entries",),
        properties={"user": "ro"},
        partitioning={"entries": {"column": "id", "lower": 0, "upper": 1_000_000, "num_partitions": 16}},
    )
    assert "entries" in src.tables and src.fetchsize == 10_000
    with pytest.raises(ValueError):
        JdbcSource("bad", "postgres://no-jdbc-prefix")


def test_jdbc_register_fails_cleanly_without_driver(spark):
    src = JdbcSource("pg", "jdbc:postgresql://127.0.0.1:1/x", tables=("t",))
    with pytest.raises(Exception):
        src.register(spark.newSession())
