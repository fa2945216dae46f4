"""Config layering tests (reference: cmd/main.go:42-50 TOML + env,
cmd/init.go:29-51 flags)."""

from __future__ import annotations

import pytest

from dungbeetle_spark.config import load_config, parse_duration

TOML = """\
server = "0.0.0.0:7070"
sql_directory = ["sql/a", "sql/b"]
worker_concurrency = 4

[app]
default_job_ttl = "90s"

[db.testdata]
path = "/root/testdata/sf0.001"

[results.cache]
path = "/tmp/results"
results_table = "res_%s"
"""


def test_toml_and_env_layering(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(TOML)
    cfg = load_config(
        str(p),
        environ={
            # `__` → `.` nesting (cmd/main.go:42-50)
            "DUNGBEETLE_app__default_job_ttl": "120s",
            "UNRELATED": "x",
        },
    )
    assert cfg.server == "0.0.0.0:7070"
    assert cfg.sql_directories == ["sql/a", "sql/b"]
    assert cfg.worker_concurrency == 4
    assert cfg.default_job_ttl == 120.0  # env beats TOML
    assert [s.name for s in cfg.sources] == ["testdata"]
    assert cfg.sources[0].path == "/root/testdata/sf0.001"
    assert cfg.results[0].results_table == "res_%s"


def test_scalar_sql_directory_is_one_entry(tmp_path):
    """A scalar `sql_directory = "tasks_sql"` is one directory, not a
    per-character list that silently globs to nothing."""
    p = tmp_path / "config.toml"
    p.write_text('sql_directory = "tasks_sql"\njob_store = "/tmp/jobs.db"\n')
    cfg = load_config(str(p), environ={})
    assert cfg.sql_directories == ["tasks_sql"]
    assert cfg.job_store == "/tmp/jobs.db"


def test_defaults_without_file():
    cfg = load_config(None, environ={})
    assert cfg.server == "127.0.0.1:6060"
    assert cfg.worker_concurrency == 10  # cmd/init.go:44
    assert cfg.default_job_ttl == 60.0


@pytest.mark.parametrize(
    ("raw", "want"),
    [("60s", 60.0), ("1m", 60.0), ("1.5h", 5400.0), ("250ms", 0.25), (90, 90.0)],
)
def test_parse_duration(raw, want):
    assert parse_duration(raw) == want


def test_parse_duration_rejects_garbage():
    with pytest.raises(ValueError):
        parse_duration("soon")


def test_typed_sources_and_reaper_interval(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(
        """
[app]
result_reaper_interval = "30s"

[db.warehouse]
path = "/root/testdata/sf0.001"

[db.raw_csv]
type = "csv"
path = "/data/csv"
tables = ["region", "nation"]
[db.raw_csv.options]
header = "true"

[db.replica]
type = "jdbc"
path = "jdbc:postgresql://db:5432/app"
tables = ["entries"]
"""
    )
    cfg = load_config(str(p), environ={})
    assert cfg.result_reaper_interval == 30.0
    by_name = {s.name: s for s in cfg.sources}
    assert by_name["raw_csv"].type == "csv"
    assert by_name["raw_csv"].tables == ["region", "nation"]
    assert by_name["raw_csv"].options == {"header": "true"}
    assert by_name["replica"].type == "jdbc"
    assert by_name["replica"].path.startswith("jdbc:")


def test_build_core_rejects_unknown_source_type(tmp_path, monkeypatch):
    from dungbeetle_spark.config import Config, SourceConf, build_core

    cfg = Config(sources=[SourceConf(name="x", path="/nope", type="mongodb")])
    with pytest.raises(ValueError, match="unknown type"):
        build_core(cfg, spark=object())


def test_jdbc_result_backend_config(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(
        """
[results.cache]
type = "jdbc"
path = "jdbc:postgresql://db:5432/cache"
results_table = "res_%s"
[results.cache.options]
user = "writer"
"""
    )
    cfg = load_config(str(p), environ={})
    assert cfg.results[0].type == "jdbc"
    assert cfg.results[0].options == {"user": "writer"}

    from dungbeetle_spark.config import build_core

    core = build_core(cfg, spark=object())
    backend = core.result_backends.get("cache")
    assert backend.table_name("j1") == "res_j1"
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        backend.delete("j1")


def test_jdbc_dbapi_factory_config(tmp_path):
    """`dbapi = "module:callable"` + dbapi_options wires the TTL
    reaper's DROP TABLE seam for non-sqlite JDBC urls (VERDICT r05
    item 7). Uses sqlite3:connect as a stand-in importable driver."""
    dbfile = tmp_path / "cache.db"
    p = tmp_path / "config.toml"
    p.write_text(
        f"""
[results.cache]
type = "jdbc"
path = "jdbc:postgresql://db:5432/cache"
results_table = "res_%s"
dbapi = "sqlite3:connect"
[results.cache.dbapi_options]
database = "{dbfile}"
"""
    )
    cfg = load_config(str(p), environ={})
    assert cfg.results[0].dbapi == "sqlite3:connect"

    from dungbeetle_spark.config import build_core

    core = build_core(cfg, spark=object())
    backend = core.result_backends.get("cache")
    # the factory connects to the configured database and delete()
    # no longer raises NotImplementedError — it DROPs via the DBAPI
    import sqlite3

    con = sqlite3.connect(dbfile)
    con.execute('CREATE TABLE "res_j1" (x INT)')
    con.commit()
    con.close()
    backend.delete("j1")
    con = sqlite3.connect(dbfile)
    left = con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'"
    ).fetchall()
    con.close()
    assert left == []


def test_jdbc_dbapi_bad_spec_rejected(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(
        """
[results.cache]
type = "jdbc"
path = "jdbc:postgresql://db:5432/cache"
dbapi = "no_colon_here"
"""
    )
    cfg = load_config(str(p), environ={})
    from dungbeetle_spark.config import build_core

    import pytest as _pytest

    with _pytest.raises(ValueError, match="module:callable"):
        build_core(cfg, spark=object())


def test_operators_registered_as_tasks(tmp_path, spark, sf_smoke):
    """app.operators_data_dir exposes the whole operator registry as
    callable tasks: a registry query runs through the FULL job
    pipeline (enqueue -> worker -> result backend) via build_core, the
    way an HTTP user would POST it."""
    import time

    from dungbeetle_spark import jobstore
    from dungbeetle_spark.config import build_core
    from dungbeetle_spark.core import JobReq
    from dungbeetle_spark.queries import registry

    results = tmp_path / "results"
    p = tmp_path / "config.toml"
    p.write_text(
        f"""
[app]
operators_data_dir = "{sf_smoke}"

[results.default]
path = "{results}"
"""
    )
    cfg = load_config(str(p), environ={})
    core = build_core(cfg, spark=spark)
    assert set(registry()) <= set(core.tasks)
    core.start()
    try:
        resp = core.new_job("dedup_exact", JobReq())
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            st = core.job_status(resp.job_id)
            if st["state"] in (jobstore.SUCCESS, jobstore.FAILURE):
                break
            time.sleep(0.1)
        assert st["state"] == jobstore.SUCCESS, st
        out = core.read_result(resp.job_id)
        assert st["count"] == out.count() > 0
        assert "content_hash" in out.columns
    finally:
        core.stop()


def test_operator_task_name_collision_fails_loudly(tmp_path):
    p = tmp_path / "config.toml"
    sqldir = tmp_path / "sql"
    sqldir.mkdir()
    # a user SQL task that shadows a registry operator name
    (sqldir / "t.sql").write_text(
        "-- name: dedup_exact\n-- raw: 1\nSELECT 1 AS x;\n"
    )
    p.write_text(
        f"""
sql_directory = "{sqldir}"

[app]
operators_data_dir = "/root/testdata/sf0.001"
"""
    )
    cfg = load_config(str(p), environ={})
    from dungbeetle_spark.config import build_core

    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate task name"):
        build_core(cfg, spark=object())


def test_job_store_dbapi_config_parses_and_overrides_path(tmp_path):
    """job_store_dbapi routes the store through DBAPIBroker (and wins
    over a job_store path set alongside); dialect + options tables
    parse. Env override spelling works like every other app key."""
    p = tmp_path / "config.toml"
    p.write_text(
        f"""
[app]
job_store = "{tmp_path}/ignored.db"
job_store_dbapi = "dungbeetle_spark.broker:sqlite3_dbapi_connect"
job_store_dialect = "sqlite"
[app.job_store_dbapi_options]
database = "{tmp_path}/broker.db"
"""
    )
    cfg = load_config(str(p), environ={})
    assert cfg.job_store_dbapi == (
        "dungbeetle_spark.broker:sqlite3_dbapi_connect"
    )
    assert cfg.job_store_dialect == "sqlite"
    assert cfg.job_store_dbapi_options == {
        "database": f"{tmp_path}/broker.db"
    }

    from dungbeetle_spark.broker import DBAPIBroker
    from dungbeetle_spark.config import build_core

    core = build_core(cfg, spark=object())
    try:
        assert isinstance(core.store._backend, DBAPIBroker)
    finally:
        core.store.close()


def test_job_store_dbapi_env_override(tmp_path):
    cfg = load_config(
        None,
        environ={
            "DUNGBEETLE_app__job_store_dbapi": "x.mod:connect",
            "DUNGBEETLE_app__job_store_dialect": "postgresql",
        },
    )
    assert cfg.job_store_dbapi == "x.mod:connect"
    assert cfg.job_store_dialect == "postgresql"
