"""Driver-window rotation report.

Reads every recorded CORRECTNESS_r*.json and computes, per registry
query, the most recent round with a fully green driver row (rows +
schema + hash). Prints the staleness ranking the next round's
DRIVER_PRIORITY rotation should follow: never-verified first, then
oldest-green — with the standing rule that new/changed queries always
take window slots before stale re-verifies.

Usage: python tools/window_rotation.py [--window 50]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def green_rows(path: str) -> set[str]:
    with open(path) as f:
        data = json.load(f)
    out = set()
    for name, row in data.items():
        if not isinstance(row, dict):
            continue
        if row.get("rows_match") and row.get("schema_match") and row.get(
            "hash_match"
        ):
            out.add(name)
    return out


def last_green_by_query(repo: str = REPO) -> dict[str, int | None]:
    """query -> latest round with a full hash-green driver row (None =
    never driver-verified green)."""
    rounds: dict[int, set[str]] = {}
    for fn in os.listdir(repo):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if m:
            rounds[int(m.group(1))] = green_rows(os.path.join(repo, fn))
    from dungbeetle_spark.queries import registry

    last: dict[str, int | None] = {name: None for name in registry()}
    for rnd in sorted(rounds):
        for name in rounds[rnd]:
            if name in last:
                last[name] = rnd
    return last


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
    ranked = sorted(
        last, key=lambda n: (last[n] is not None, last[n] or 0, n)
    )
    print(f"\nnext-window suggestion (staleness top {args.window};")
    print("new/changed queries must still displace from the front):")
    for name in ranked[: args.window]:
        rnd = last[name]
        label = "never" if rnd is None else f"r{rnd:02d}"
        print(f"  {label}  {name}")


if __name__ == "__main__":
    main()
