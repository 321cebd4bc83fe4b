#!/usr/bin/env python
"""Data-driven driver-gate rotation planner.

The driver's correctness gate samples the FIRST 50 entries of
``queries()`` each round, so the entry order decides which registry
queries get a fresh hard-signal row. Through round 8 that order was a
hand-maintained ``_R8_FRONT`` list — a failure mode the round-8
verdict asked to retire (a typo or a forgotten update silently
mis-spends the 50 slots). This tool derives the order from the data
the driver itself writes:

1. **never-driver-sampled** queries (no row in any
   ``CORRECTNESS_r*.json``) — newest first, i.e. the raw registry
   order, which lists the newest/least-proven work first;
2. **stale-red** queries (latest driver row exists but is not green)
   — oldest red round first, so long-stale records re-green soonest;
3. **driver-green** queries — stalest green round first, so the gate
   refreshes the oldest records once exposure is closed; ties broken
   by raw registry position.

``__spark_entry__.queries()`` applies ``priority_order`` at call time
(falling back to the raw newest-first order if this module or the
CORRECTNESS files are unavailable), and
``tests/test_rotation_plan.py`` asserts the live front-50 equals this
tool's output.

Run as a script to print the round's plan summary as JSON.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def is_green(rec: dict) -> bool:
    """The driver-green predicate: all three matches and no error."""
    return (
        bool(rec.get("rows_match"))
        and bool(rec.get("schema_match"))
        and bool(rec.get("hash_match"))
        and rec.get("err") in (None, "")
    )


def load_history(repo: str = REPO) -> dict[str, list[tuple[int, bool]]]:
    """name -> [(round, green), ...] ascending by round, from every
    CORRECTNESS_r*.json the driver has written."""
    hist: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if isinstance(rec, dict):
                hist.setdefault(name, []).append((rnd, is_green(rec)))
    for rows in hist.values():
        rows.sort()
    return hist


def classify(
    names: list[str], hist: dict[str, list[tuple[int, bool]]]
) -> tuple[list, list, list]:
    """Split registry names into the three priority buckets, each as
    sortable tuples carrying the raw position for tie-breaks."""
    never, stale_red, green = [], [], []
    for pos, name in enumerate(names):
        rows = hist.get(name)
        if not rows:
            never.append((pos, name))
        elif rows[-1][1]:
            green.append((rows[-1][0], pos, name))
        else:
            stale_red.append((rows[-1][0], pos, name))
    return never, stale_red, green


def priority_order(names, repo: str = REPO) -> list[str]:
    """The full gate order for the given registry names."""
    never, stale_red, green = classify(list(names), load_history(repo))
    out = [n for _, n in sorted(never)]
    out += [n for _, _, n in sorted(stale_red)]
    out += [n for _, _, n in sorted(green)]
    return out


def main() -> None:
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    names = list(E._queries_raw())
    never, stale_red, green = classify(names, load_history())
    order = priority_order(names)
    print(
        json.dumps(
            {
                "total": len(names),
                "never_sampled": len(never),
                "stale_red": [n for _, _, n in sorted(stale_red)],
                "greens_refreshed_from_round": (
                    min(r for r, _, _ in green) if green else None
                ),
                "front50": order[:50],
                "positions_51_plus_next": order[50:80],
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
