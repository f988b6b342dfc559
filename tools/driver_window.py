#!/usr/bin/env python3
"""Print the driver window the rotation policy produces from the
committed CORRECTNESS_r*.json history (see the _DRIVER_WINDOW comment in
interference_spark/inventory.py for the policy statement):

  1. family sentinels, every round;
  2. every entry with < 2 cumulative green driver rounds (zero-round
     first, then singles; alphabetical within a count);
  3. oldest last-green rotation (ties alphabetical) to fill 50.

Run from the repo root after a round's CORRECTNESS file lands, paste the
output over the list literal, and keep the suite green —
tests/test_driver_window.py enforces rules 1-2 and the arithmetic.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW_SIZE = 50
SENTINELS = [
    "dialect_custom_group_function",
    "q21_waiting_suppliers",
    "process_stream_consume",
]


def green_rounds(repo_root: str) -> dict[str, list[int]]:
    """name -> sorted list of driver rounds where the entry was fully green."""
    rounds: dict[str, list[int]] = {}
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        try:
            rno = int(os.path.basename(f)[len("CORRECTNESS_r"):-len(".json")])
        except ValueError:
            continue
        with open(f) as fh:
            rec = json.load(fh)
        for name, row in rec.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("hash_match", True)
            ):
                rounds.setdefault(name, []).append(rno)
    return {n: sorted(rs) for n, rs in rounds.items()}


def policy_window(names: list[str], rounds: dict[str, list[int]]) -> list[str]:
    cnt = {n: len(rounds.get(n, [])) for n in names}
    last = {n: (rounds[n][-1] if n in rounds else 0) for n in names}
    subs = sorted(
        (n for n in names if cnt[n] < 2 and n not in SENTINELS),
        key=lambda n: (cnt[n], n),
    )
    rot = sorted(
        (n for n in names if cnt[n] >= 2 and n not in SENTINELS),
        key=lambda n: (last[n], n),
    )
    window = SENTINELS + subs + rot[: WINDOW_SIZE - len(SENTINELS) - len(subs)]
    if len(window) > WINDOW_SIZE:
        raise SystemExit(
            f"policy window overflows {WINDOW_SIZE} slots: {len(SENTINELS)} "
            f"sentinels + {len(subs)} sub-2-round entries — land fewer new "
            "operators per round or raise the window"
        )
    return window


def main() -> None:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from interference_spark import inventory

    window = policy_window(list(inventory.QUERIES), green_rounds(repo_root))
    for name in window:
        print(f'    "{name}",')


if __name__ == "__main__":
    main()
