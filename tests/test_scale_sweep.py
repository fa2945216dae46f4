"""Opt-in scale-sweep smoke (VERDICT r05 item 7): `pytest -m sweep`
runs the quick x1/x4 profile over three representative operators so
the SCALING.md exponent table cannot silently rot as operators evolve.
Skipped by default (the sweep amplifies sf0.1 into /tmp and takes a
few minutes)."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

QUICK_OPS = ["dedup_exact", "dedup_ngram_jaccard", "pareto_revenue_share"]


@pytest.mark.sweep
def test_quick_sweep_exponents(spark):
    import scale_sweep

    results = scale_sweep.run_sweep(
        spark, factors=[1, 4], runs=1, ops=QUICK_OPS
    )
    for op in QUICK_OPS:
        r = results[op]
        assert len(r) >= 2, (op, r)
        e = scale_sweep.exponent(r)
        assert not math.isnan(e), (op, r)
        # generous ceilings: the quick profile is a rot detector, not
        # a benchmark — it fails on a plan catastrophically losing its
        # shape (e.g. the similarity join going cross-join quadratic+)
        ceiling = 2.5 if op == "dedup_ngram_jaccard" else 1.5
        assert e < ceiling, (op, e, r)


def test_amplified_cache_requires_completion_sentinel(tmp_path, monkeypatch):
    """ADVICE r06: the cache check verified events.parquet, which is
    the FIRST table written — a build that crashed after it left a
    partial dir that was silently reused. Reuse now requires the
    _AMPLIFIED sentinel written after the LAST table."""
    import scale_sweep

    monkeypatch.setattr(scale_sweep, "WORK", str(tmp_path))
    partial = tmp_path / "x4"
    (partial / "events.parquet").mkdir(parents=True)

    class Boom(Exception):
        pass

    class FakeSpark:  # build must be attempted (and here, fail loudly)
        class sparkContext:
            defaultParallelism = 8

    with pytest.raises(Exception):
        scale_sweep.build_amplified(FakeSpark(), 4)

    # a completed dir (sentinel present) short-circuits without Spark
    (partial / "_AMPLIFIED").write_text("complete\n")
    assert scale_sweep.build_amplified(None, 4) == str(partial)


def test_parse_prior_exponents_both_formats(tmp_path):
    import scale_sweep

    old = tmp_path / "old.md"
    old.write_text(
        "# SCALING\n\n"
        "| operator | x1 (s) | x32 (s) | exponent |\n"
        "|---|---|---|---|\n"
        "| `dedup_exact` | 0.53 | 0.50 | -0.01 |\n"
        "| `minhash_calibration` | 2.40 | 481.60 | 1.50 |\n"
    )
    assert scale_sweep.parse_prior_exponents(str(old)) == {
        "dedup_exact": -0.01,
        "minhash_calibration": 1.50,
    }
    new = tmp_path / "new.md"
    new.write_text(
        "| operator | x1 (s) | x32 (s) | exponent | isolated |\n"
        "|---|---|---|---|---|\n"
        "| `dedup_exact` | 0.53 | 0.50 | -0.01 |  |\n"
        "| `kl_divergence_by_source` | 0.9 | 1.0 | 0.03 | true (batch exp 0.45) |\n"
    )
    assert scale_sweep.parse_prior_exponents(str(new)) == {
        "dedup_exact": -0.01,
        "kl_divergence_by_source": 0.03,
    }
    assert scale_sweep.parse_prior_exponents(str(tmp_path / "nope.md")) == {}


def test_isolated_remeasure_fires_only_on_exponent_jump(monkeypatch):
    """An op whose exponent jumped >= 0.3 re-measures alone (per-cell
    min merged, marker returned); stable ops are untouched."""
    import scale_sweep

    # batch results: jumped op reads exp 1.0 (1.0 -> 32.0 over x32);
    # stable op reads its prior exponent.
    results = {
        "dedup_exact": {1: 0.5, 32: 0.55},
        "kmeans_clusters": {1: 1.0, 32: 32.0},
    }
    prior = {"dedup_exact": 0.0, "kmeans_clusters": 0.0}

    calls = []

    def fake_time_cell(spark, spec, sf_dir, runs):
        calls.append(sf_dir)
        return 1.2  # isolated: x32 re-reads near-flat

    monkeypatch.setattr(scale_sweep, "_time_cell", fake_time_cell)
    monkeypatch.setattr(
        scale_sweep, "build_amplified", lambda spark, f: f"{scale_sweep.WORK}/x{f}"
    )

    class FakeRegistry(dict):
        def __missing__(self, k):
            return object()

    import dungbeetle_spark.queries as q

    monkeypatch.setattr(q, "registry", lambda: FakeRegistry())
    iso = scale_sweep.apply_isolated_remeasure(
        None, results, [1, 32], prior, runs=1
    )
    assert set(iso) == {"kmeans_clusters"}
    assert iso["kmeans_clusters"]["batch_exponent"] == 1.0
    # per-cell min: x1 keeps the batch 1.0 (< 1.2), x32 takes 1.2
    assert results["kmeans_clusters"] == {1: 1.0, 32: 1.2}
    assert results["dedup_exact"] == {1: 0.5, 32: 0.55}  # untouched
    assert iso["kmeans_clusters"]["isolated_exponent"] == round(
        scale_sweep.exponent({1: 1.0, 32: 1.2}), 2
    )


def test_render_table_marks_isolated_rows():
    import scale_sweep

    table = scale_sweep.render_table(
        {"dedup_exact": {1: 0.5, 32: 0.6}},
        [1, 32],
        {"dedup_exact": {"batch_exponent": 0.9, "isolated_exponent": 0.1,
                         "prior_exponent": 0.0}},
    )
    assert "| isolated |" in table.splitlines()[0]
    assert "true (batch exp 0.90)" in table


def test_convexity_flags_accelerating_rows_only():
    import scale_sweep

    results = {
        # flat: endpoint and segments agree — not listed
        "dedup_exact": {1: 0.5, 10: 0.55, 32: 0.6},
        # accelerating: flat to x10, superlinear into x32 — listed
        "lsh_band_planner": {1: 2.0, 10: 4.0, 32: 40.0},
        # decelerating superlinear start — not listed (top segment low)
        "kmeans_clusters": {1: 1.0, 10: 30.0, 32: 31.0},
        # two cells only: no segment comparison possible — skipped
        "dedup_ngram_jaccard": {1: 1.0, 4: 16.0},
    }
    out = scale_sweep.render_convexity(results)
    assert "`lsh_band_planner`" in out
    assert "dedup_exact" not in out
    assert "kmeans_clusters" not in out
    assert "dedup_ngram_jaccard" not in out
    # per-segment numbers rendered for the flagged row
    lo = scale_sweep.segment_exponents(results["lsh_band_planner"])[0][2]
    hi = scale_sweep.segment_exponents(results["lsh_band_planner"])[-1][2]
    assert f"1→10: {lo:.2f}" in out and f"10→32: {hi:.2f}" in out
    assert hi > 1.9  # 10x time over ~3.2x data

    # the all-clear is explicit, not silence
    clear = scale_sweep.render_convexity(
        {"dedup_exact": {1: 0.5, 10: 0.55, 32: 0.6}}
    )
    assert "none this sweep" in clear
