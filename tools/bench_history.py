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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds(repo: str = REPO) -> dict[int, dict[str, float]]:
    out: dict[int, dict[str, float]] = {}
    for fn in sorted(os.listdir(repo)):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fn)
        if not m:
            continue
        with open(os.path.join(repo, fn)) as f:
            data = json.load(f)
        if "parsed" in data and isinstance(data["parsed"], dict):
            data = data["parsed"]
        q = data.get("queries") or {}
        if q:
            out[int(m.group(1))] = q
    return out


def main() -> None:
    rounds = load_rounds()
    if len(rounds) < 2:
        print("need >= 2 BENCH_r*.json files")
        return
    factors = {
        r: bench._median_host_factor(q) or 1.0 for r, q in rounds.items()
    }
    common = set.intersection(*(set(q) for q in rounds.values()))
    print(f"rounds: {sorted(rounds)}  common queries: {len(common)}")
    print("\nround | raw total (common) | host factor | normalized")
    for r in sorted(rounds):
        raw = sum(rounds[r][q] for q in common)
        print(
            f"r{r:02d}  | {raw:8.2f} s          | {factors[r]:5.3f}       "
            f"| {raw / factors[r]:8.2f} s"
        )
    print("\nper-query normalized seconds (common set):")
    header = "query".ljust(32) + "".join(
        f"r{r:02d}".rjust(8) for r in sorted(rounds)
    )
    print(header)
    for q in sorted(common):
        row = q.ljust(32)
        for r in sorted(rounds):
            row += f"{rounds[r][q] / factors[r]:8.3f}"
        print(row)
    rs = sorted(rounds)
    print("\nworst normalized per-query ratio, consecutive rounds:")
    for prev, cur in zip(rs, rs[1:]):
        worst = max(
            common,
            key=lambda q: (rounds[cur][q] / factors[cur])
            / (rounds[prev][q] / factors[prev]),
        )
        ratio = (rounds[cur][worst] / factors[cur]) / (
            rounds[prev][worst] / factors[prev]
        )
        print(f"r{prev:02d} -> r{cur:02d}: {worst} {ratio:.2f}x")


if __name__ == "__main__":
    main()
