"""Cross-round bench history, normalized by each round's own canary.

Reads every recorded BENCH_r*.json (the driver's parsed-wrap or raw
bench output), recomputes each round's host factor with the SAME
median-of-anchors method (bench._median_host_factor — so pre-r05
rounds' single-anchor factors never skew the view), and prints:

- per-round raw + normalized totals over the queries COMMON to all
  rounds (totals over a growing headline list are not comparable);
- per-query normalized times by round for the common set;
- the worst normalized regression per round pair r(N-1) -> rN.

Usage: python tools/bench_history.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench
from bench import timings_from_compare_tail, timings_from_tail  # noqa: E501  (single source of the tail-salvage logic)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds(
    repo: str = REPO,
) -> tuple[dict[int, dict[str, float]], set[int]]:
    """(per-round query timings, rounds reconstructed from a tail).

    A round whose "parsed" is null (driver stdout truncation) is
    salvaged from its recorded tail and flagged partial rather than
    silently dropped — its rows are a lower bound on coverage, not a
    full headline.
    """
    out: dict[int, dict[str, float]] = {}
    partial: set[int] = set()
    for fn in sorted(os.listdir(repo)):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if not m:
            continue
        with open(os.path.join(repo, fn)) as f:
            data = json.load(f)
        rnum = int(m.group(1))
        tail = data.get("tail") if isinstance(data, dict) else None
        if "parsed" in data and isinstance(data["parsed"], dict):
            data = data["parsed"]
        q = data.get("queries") or {}
        if not q:
            # r08+ compact stdout form, or a parsed-null round with a
            # pinned archive: timings live in the round's archived full
            # record (bench.archive_full_records / hand-pinned r07)
            full = bench._full_record_for(os.path.join(repo, fn), data)
            if full:
                q = full.get("queries") or {}
        if not q and isinstance(tail, str):
            q = timings_from_compare_tail(tail, repo)
            q.update(timings_from_tail(tail))  # direct values win
            if q:
                partial.add(rnum)
        if q:
            out[rnum] = q
    return out, partial


def main() -> None:
    rounds, partial = load_rounds()
    if len(rounds) < 2:
        print("need >= 2 BENCH_r*.json files")
        return
    factors = {
        r: bench._median_host_factor(q) or 1.0 for r, q in rounds.items()
    }
    # A partial round's query set is a lower bound, so it must not
    # shrink the common set; its table cells are blank where salvage
    # didn't reach.
    full = [r for r in rounds if r not in partial] or list(rounds)
    common = set.intersection(*(set(rounds[r]) for r in full))
    print(f"rounds: {sorted(rounds)}  common queries: {len(common)}")
    if partial:
        print(
            "partial rounds (reconstructed from truncated driver tail; "
            f"query set is a lower bound): {sorted(partial)}"
        )
    print("\nround | raw total (common) | host factor | normalized")
    for r in sorted(rounds):
        have = [q for q in common if q in rounds[r]]
        raw = sum(rounds[r][q] for q in have)
        mark = "*" if r in partial else " "
        note = f" ({len(have)}/{len(common)} present)" if r in partial else ""
        print(
            f"r{r:02d}{mark} | {raw:8.2f} s          | {factors[r]:5.3f}  "
            f"     | {raw / factors[r]:8.2f} s{note}"
        )
    print("\nper-query normalized seconds (common set):")
    header = "query".ljust(32) + "".join(
        f"r{r:02d}".rjust(8) for r in sorted(rounds)
    )
    print(header)
    for q in sorted(common):
        row = q.ljust(32)
        for r in sorted(rounds):
            sec = rounds[r].get(q)
            row += f"{sec / factors[r]:8.3f}" if sec else "       -"
        print(row)
    rs = sorted(rounds)
    print("\nworst normalized per-query ratio, consecutive rounds:")
    for prev, cur in zip(rs, rs[1:]):
        both = [q for q in common if q in rounds[prev] and q in rounds[cur]]
        if not both:
            print(f"r{prev:02d} -> r{cur:02d}: no overlapping queries")
            continue
        worst = max(
            both,
            key=lambda q: (rounds[cur][q] / factors[cur])
            / (rounds[prev][q] / factors[prev]),
        )
        ratio = (rounds[cur][worst] / factors[cur]) / (
            rounds[prev][worst] / factors[prev]
        )
        print(f"r{prev:02d} -> r{cur:02d}: {worst} {ratio:.2f}x")


if __name__ == "__main__":
    main()
