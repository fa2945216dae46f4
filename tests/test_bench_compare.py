"""Unit tests for bench.py's cross-round comparison block (VERDICT r05
item 4) — pure arithmetic, no Spark. The point: both runs' host
factors come from the SAME median-of-anchors method, so a methodology
mismatch (r04's single-anchor factor vs r05's median) can never skew
the regression ratios again."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def test_median_host_factor_is_median_of_anchor_ratios():
    timings = {name: r01 * 2.0 for name, r01 in bench.CANARY_R01.items()}
    assert bench._median_host_factor(timings) == 2.0
    # a single regressed anchor cannot move the median
    worst = next(iter(bench.CANARY_R01))
    timings[worst] = bench.CANARY_R01[worst] * 50.0
    assert bench._median_host_factor(timings) == 2.0


def test_compare_block_flags_only_normalized_regressions(tmp_path):
    old_timings = {name: r01 for name, r01 in bench.CANARY_R01.items()}
    old_timings["steady_query"] = 1.0
    old_timings["regressed_query"] = 1.0
    old = tmp_path / "BENCH_r98.json"
    old.write_text(json.dumps(
        {"queries": old_timings, "canary": {"host_factor": 9.9}}
    ))
    # new run: host uniformly 2x slower (anchors doubled). steady_query
    # doubles with the host (ratio 1.0); regressed_query is 4x raw =
    # 2x normalized -> flagged.
    new_timings = {name: r01 * 2 for name, r01 in bench.CANARY_R01.items()}
    new_timings["steady_query"] = 2.0
    new_timings["regressed_query"] = 4.0
    hf = bench._median_host_factor(new_timings)
    block = bench._compare_block(new_timings, hf, str(old))
    assert block["host_factor_old_median_method"] == 1.0
    assert block["host_factor_old_as_recorded"] == 9.9  # ignored for ratios
    assert block["normalized_ratios"]["steady_query"] == 1.0
    assert block["normalized_ratios"]["regressed_query"] == 2.0
    assert block["regressions"] == ["regressed_query"]
    # queries new to this round simply don't appear
    assert "brand_new_query" not in block["normalized_ratios"]


def test_latest_bench_file_picks_highest_round(tmp_path):
    for n in (3, 11, 7):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text("{}")
    (tmp_path / "BENCH_rxx.json").write_text("{}")  # non-matching
    got = bench._latest_bench_file(str(tmp_path))
    assert got is not None and got.endswith("BENCH_r11.json")


def test_compare_block_unwraps_driver_recorded_shape(tmp_path):
    """The driver records bench output wrapped as {"parsed": {...}};
    the comparison must read through the wrap (found live in r06: the
    first auto-compare against BENCH_r05.json silently produced zero
    ratios)."""
    inner = {"queries": {n: r for n, r in bench.CANARY_R01.items()},
             "canary": {"host_factor": 1.0}}
    old = tmp_path / "BENCH_r99.json"
    old.write_text(json.dumps({"n": 5, "rc": 0, "tail": "...", "parsed": inner}))
    new_timings = {n: r * 3 for n, r in bench.CANARY_R01.items()}
    block = bench._compare_block(
        new_timings, bench._median_host_factor(new_timings), str(old)
    )
    assert block["host_factor_old_median_method"] == 1.0
    assert len(block["normalized_ratios"]) == len(bench.CANARY_R01)
    assert block["regressions"] == []


def test_corrupt_prior_bench_file_never_crashes(tmp_path):
    bad = tmp_path / "BENCH_r97.json"
    bad.write_text("{not json")
    import pytest as _pytest

    with _pytest.raises(Exception):
        bench._compare_block({}, 1.0, str(bad))
    # main() guards this call site — pin the guard exists in source
    import inspect

    src = inspect.getsource(bench.main)
    assert "except Exception" in src and "_compare_block" in src
