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
    # Transparency for the stale-repayment budget: each NEW_OR_CHANGED
    # entry inside the window displaces exactly one queue position, so
    # the first k post-window entries (k = fresh entries used) are the
    # queries whose repayment slips one round because of this round's
    # additions.
    k = sum(1 for n in order[: args.window] if n in NEW_OR_CHANGED)
    if k:
        print(f"\ndisplaced to next round by the {k} new/changed entr"
              f"{'y' if k == 1 else 'ies'}:")
        for name in order[args.window: args.window + k]:
            rnd = last[name]
            label = "never" if rnd is None else f"r{rnd:02d}"
            print(f"  {label}  {name}")


if __name__ == "__main__":
    main()
