#!/usr/bin/env python
"""Suggest the next round's gate rotation from driver CORRECTNESS files.

The driver grades the first 50 registered queries per round
(``ROUND_GATE`` in fortymhz_spark/queries/__init__.py).  After a round's
CORRECTNESS_r{N}.json lands, run this to see which queries have a green
row in ANY round (candidates for ``PREVIOUSLY_GREEN``), which graded
rows-only or failed (keep in the gate), and which registrations have
never been graded (promote next).  Purely advisory — the registry edit
stays a reviewed, explicit change.

Run:  python tools/rotate_gate.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from fortymhz_spark.queries import all_queries

    names = list(all_queries())
    green: dict[str, str] = {}       # any-round green (historical record)
    latest: dict[str, tuple[int, bool, str]] = {}  # most recent verdict
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
    # numeric round order ('r10' sorts before 'r2' lexicographically);
    # the LATEST round's verdict wins, so a regression in a newer round
    # is reported even when an older round graded the query green.
    for path in sorted(
        paths,
        key=lambda p: int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")]),
    ):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            is_green = row.get("err") is None and row.get("hash_match")
            if is_green:
                green[name] = f"{rnd}"
            latest[name] = (rnd, bool(is_green), row.get("err") or "mismatch")
    # weak = the most recent grading was not green (regardless of history)
    weak = {
        n: f"r{rnd}: {why}" + (f" (was green r{green[n]})" if n in green else "")
        for n, (rnd, ok, why) in latest.items()
        if not ok
    }

    never = [n for n in names if n not in green and n not in weak]
    gated = names[:50]
    print(f"registered: {len(names)}  graded-green (any round): {len(green)}")
    print(f"latest-verdict weak/failed: {len(weak)}  never graded: {len(never)}")
    print()
    print("== green queries still holding a gate slot (rotate OUT next) ==")
    for n in gated:
        if n in green and n not in weak:
            print(f"  {n}  (green in r{green[n]})")
    print()
    print("== weak rows: latest grading not green (keep in gate) ==")
    for n, why in sorted(weak.items()):
        print(f"  {n}  ({why})")
    print()
    print("== never graded (promote INTO the gate) ==")
    for n in never:
        print(f"  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
