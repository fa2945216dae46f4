"""Small-file compaction: file-shape math, content preservation,
atomic swap, and sort-keyed footer pruning."""

from __future__ import annotations

import os

import pytest

from dungbeetle_spark.sources.maintenance import (
    compact_parquet,
    plan_file_count,
    table_file_stats,
)

MB = 1024 * 1024


def test_plan_file_count_math():
    assert plan_file_count(0) == 1
    assert plan_file_count(1, target_mb=256) == 1
    assert plan_file_count(256 * MB, target_mb=256) == 1
    assert plan_file_count(256 * MB + 1, target_mb=256) == 2
    assert plan_file_count(10 * 256 * MB, target_mb=256) == 10
    with pytest.raises(ValueError):
        plan_file_count(1, target_mb=0)


@pytest.fixture()
def fragmented(spark, sf_smoke, tmp_path):
    """lineitem shattered into many tiny files — the post-streaming-
    sink shape compaction exists to repair."""
    src = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    path = str(tmp_path / "lineitem")
    src.repartition(64).write.parquet(path)
    return path, src.count()


def test_compact_merges_small_files(spark, fragmented):
    path, n_rows = fragmented
    before = table_file_stats(spark, path)
    assert before.n_files >= 64

    after = compact_parquet(spark, path, target_mb=256)
    assert after.n_files == 1  # sf0.001 lineitem ≪ 256 MB
    assert after.total_bytes > 0
    # Content untouched: same rows, same schema.
    df = spark.read.parquet(path)
    assert df.count() == n_rows
    assert {f.name for f in df.schema.fields} >= {"l_orderkey", "l_quantity"}
    # No tmp/old debris left behind by the swap.
    parent = os.path.dirname(path)
    debris = [d for d in os.listdir(parent) if d.startswith(("_compact_", "_old_"))]
    assert debris == []


def test_compact_sorted_rewrite_prunes(spark, fragmented):
    path, n_rows = fragmented
    compact_parquet(spark, path, target_mb=0.02, sort_by=["l_orderkey"])
    after = table_file_stats(spark, path)
    assert after.n_files >= 2  # ~20 KB target forces a multi-file layout

    df = spark.read.parquet(path)
    assert df.count() == n_rows
    # Range-partitioned + sorted rewrite ⇒ per-file key ranges are
    # disjoint, so parquet min/max footers let a point predicate skip
    # whole files. Verify disjointness directly from the files.
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["l_orderkey"])
        col = t.column("l_orderkey").to_pylist()
        ranges.append((min(col), max(col)))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"file key ranges overlap: {ranges}"


def test_compact_grows_file_count_when_oversized(spark, sf_smoke, tmp_path):
    """target_mb smaller than the table splits one big file into many —
    compaction is bidirectional resizing, not only merging."""
    src = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    path = str(tmp_path / "one_big")
    src.coalesce(1).write.parquet(path)
    assert table_file_stats(spark, path).n_files == 1

    stats = compact_parquet(spark, path, target_mb=0.02)
    assert stats.n_files >= 2
    assert spark.read.parquet(path).count() == src.count()
