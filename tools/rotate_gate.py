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
    green: dict[str, str] = {}
    weak: dict[str, str] = {}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")]
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("err") is None and row.get("hash_match"):
                green[name] = rnd
            else:
                weak[name] = f"r{rnd}: {row.get('err') or 'mismatch'}"
    # a green row in ANY round supersedes weak rows from other rounds
    weak = {n: w for n, w in weak.items() if n not in green}

    never = [n for n in names if n not in green and n not in weak]
    gated = names[:50]
    print(f"registered: {len(names)}  graded-green (any round): {len(green)}")
    print(f"graded weak/rows-only/failed: {len(weak)}  never graded: {len(never)}")
    print()
    print("== green queries still holding a gate slot (rotate OUT next) ==")
    for n in gated:
        if n in green:
            print(f"  {n}  (green in r{green[n]})")
    print()
    print("== weak rows (keep in gate until green) ==")
    for n, why in sorted(weak.items()):
        print(f"  {n}  ({why})")
    print()
    print("== never graded (promote INTO the gate) ==")
    for n in never:
        print(f"  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
