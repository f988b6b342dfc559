"""Driver-window rotation policy enforcement (VERDICT r9 ask #8).

The correctness driver oracles the FIRST 50 entries of
``inventory.queries()``. The policy (stated at the ``_DRIVER_WINDOW``
comment) is: family sentinels every round; then EVERY entry with < 2
cumulative green driver rounds; then an oldest-last-green rotation.
These tests check the committed window against the committed
CORRECTNESS_r*.json history, so letting an under-evidenced entry slip
out of the window fails the suite — no Spark session needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interference_spark import inventory
from tools.driver_window import (
    SENTINELS,
    WINDOW_SIZE,
    green_rounds,
    policy_window,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_shape():
    w = inventory._DRIVER_WINDOW
    assert len(w) == WINDOW_SIZE, f"window must fill all {WINDOW_SIZE} slots"
    assert len(set(w)) == len(w), "duplicate names silently shrink the gate"
    unknown = [n for n in w if n not in inventory.QUERIES]
    assert not unknown, f"window names unknown queries: {unknown}"


def test_sentinels_every_round():
    assert inventory._DRIVER_WINDOW[: len(SENTINELS)] == SENTINELS


def test_every_under_evidenced_entry_is_windowed():
    """Rule 2: any entry with < 2 green driver rounds (including brand-new
    operators at 0 rounds) must hold a window slot THIS round."""
    rounds = green_rounds(REPO_ROOT)
    windowed = set(inventory._DRIVER_WINDOW)
    missing = sorted(
        n
        for n in inventory.QUERIES
        if len(rounds.get(n, [])) < 2 and n not in windowed
    )
    assert not missing, (
        f"entries with <2 driver rounds missing from _DRIVER_WINDOW: "
        f"{missing} — new operators join the window in their landing "
        "commit (no backlog)"
    )


def test_rotation_matches_policy():
    """The committed list is the policy's output for SOME prefix of the
    CORRECTNESS history (regenerate with tools/driver_window.py). The
    prefix tolerance keeps the suite green in the gap between the driver
    recording a new round's correctness file and the next round's window
    regeneration — a hand-rolled off-policy window matches no prefix."""
    rounds = green_rounds(REPO_ROOT)
    max_round = max((rs[-1] for rs in rounds.values()), default=0)
    names = list(inventory.QUERIES)
    candidates = []
    for cutoff in range(max_round + 1):
        hist = {
            n: [r for r in rs if r <= cutoff] for n, rs in rounds.items()
        }
        hist = {n: rs for n, rs in hist.items() if rs}
        try:
            candidates.append(policy_window(names, hist))
        except SystemExit:
            # early prefixes have more sub-2-round entries than slots
            continue
    assert inventory._DRIVER_WINDOW in candidates, (
        "committed _DRIVER_WINDOW matches no history prefix of the "
        "rotation policy — regenerate with tools/driver_window.py"
    )
