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
