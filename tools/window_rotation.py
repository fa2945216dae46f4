"""Driver-window rotation report.

Since r09 the rotation itself is computed inside the registry
(``queries.driver_priority()`` — NEW_OR_CHANGED first, then
stalest-green from the recorded CORRECTNESS_r*.json rows); this tool
is now a pure report over that single source of truth: it prints the
last-green distribution and the exact window the driver will verify
next round.

Usage: python tools/window_rotation.py [--window 50]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dungbeetle_spark.queries import (  # noqa: E402
    NEW_OR_CHANGED,
    driver_priority,
    last_green_by_query,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()
    last = last_green_by_query()
    by_round: dict[int | None, list[str]] = {}
    for name, rnd in last.items():
        by_round.setdefault(rnd, []).append(name)
    print("last-green distribution:")
    for rnd in sorted(by_round, key=lambda r: (r is not None, r)):
        label = "never" if rnd is None else f"r{rnd:02d}"
        print(f"  {label}: {len(by_round[rnd])}")
    order = driver_priority()
    print(f"\ncomputed driver window (first {args.window} of registry):")
    for name in order[: args.window]:
        rnd = last[name]
        label = "never" if rnd is None else f"r{rnd:02d}"
        tag = "  [new/changed]" if name in NEW_OR_CHANGED else ""
        print(f"  {label}  {name}{tag}")
    # Transparency for the stale-repayment budget: the queries whose
    # re-verification slips a round are exactly those that a pure
    # staleness-only ordering (no NEW_OR_CHANGED head) would have put
    # in the window but the actual ordering does not. Counting head
    # entries over-counts: a NEW_OR_CHANGED query that is itself
    # never-green would be in the window on staleness alone and
    # displaces nothing (r10 review finding).
    natural = sorted(
        last, key=lambda n: (last[n] is not None, last[n] or 0, n)
    )[: args.window]
    actual = set(order[: args.window])
    displaced = [n for n in natural if n not in actual]
    if displaced:
        print(f"\ndisplaced to next round by this round's new/changed "
              f"entries ({len(displaced)}):")
        for name in displaced:
            rnd = last[name]
            label = "never" if rnd is None else f"r{rnd:02d}"
            print(f"  {label}  {name}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # report piped into head/less and closed
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), 1)
