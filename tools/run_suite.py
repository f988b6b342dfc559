#!/usr/bin/env python3
"""Sharded full-suite runner (VERDICT r7 ask #3): the 222-entry oracle
sweep dominates `pytest tests/` wall time and a single Spark session
can't be split inside one process (one JVM per process, no xdist in the
container) — so the suite runs as FIVE parallel pytest processes, each
with its own local[4] Spark session (20 cores total on the 32-thread
box):

  fast        -m "not oracle and not slow"      unit/contract/plan lints
  oracle-a/b/c  test_entry_oracle IFS_ORACLE_SHARD=i/3  sweep thirds
  fuzz-slow   dialect/pipeline fuzz + slow scale smokes

Lane partition is exact (every test runs in exactly one lane): `fast`
excludes both markers; the two fuzz modules and test_entry_oracle are
module-marked `oracle`; `fuzz-slow` selects the fuzz modules wholesale
plus `-m slow` over the remaining slow-carrying modules.  Suite wall
time = max(lane), ~half the sequential run.  Exit code is nonzero if
any lane fails; per-lane logs land in /tmp/ifs_suite_<lane>.log.

Usage: python tools/run_suite.py  [extra pytest args appended to every lane]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LANES: dict[str, tuple[list[str], dict[str, str]]] = {
    "fast": (["tests/", "-m", "not oracle and not slow"], {}),
    # explicit -m re-enables the oracle lane over pytest.ini's addopts
    # (plain `pytest` default-deselects oracle/slow — VERDICT r11 ask #3;
    # a later -m on the command line overrides the addopts one)
    "oracle-a": (
        ["tests/test_entry_oracle.py", "-m", "oracle"],
        {"IFS_ORACLE_SHARD": "0/3"},
    ),
    "oracle-b": (
        ["tests/test_entry_oracle.py", "-m", "oracle"],
        {"IFS_ORACLE_SHARD": "1/3"},
    ),
    "oracle-c": (
        ["tests/test_entry_oracle.py", "-m", "oracle"],
        {"IFS_ORACLE_SHARD": "2/3"},
    ),
    "fuzz-slow": (
        [
            "tests/test_dialect_fuzz.py",
            "tests/test_pipeline_fuzz.py",
            "tests/test_scale_smoke.py",
            "tests/test_pipeline_ops.py",
            "tests/test_plan_lint.py",
            "-m",
            "oracle or slow",
        ],
        {},
    ),
}


def main() -> int:
    extra = sys.argv[1:]
    procs: dict[str, tuple[subprocess.Popen, float, str]] = {}
    for lane, (args, env_over) in LANES.items():
        log = f"/tmp/ifs_suite_{lane}.log"
        env = dict(os.environ, **env_over)
        fh = open(log, "w")
        t0 = time.monotonic()
        procs[lane] = (
            subprocess.Popen(
                [sys.executable, "-m", "pytest", "-q", *args, *extra],
                cwd=REPO,
                env=env,
                stdout=fh,
                stderr=subprocess.STDOUT,
            ),
            t0,
            log,
        )
        print(f"[suite] launched {lane}: pytest {' '.join(args)} -> {log}")
    rc = 0
    for lane, (p, t0, log) in procs.items():
        code = p.wait()
        dt = time.monotonic() - t0
        tail = ""
        try:
            with open(log) as fh:
                lines = fh.read().strip().splitlines()
            tail = lines[-1] if lines else ""
        except OSError:
            pass
        status = "ok" if code == 0 else f"FAIL rc={code}"
        print(f"[suite] {lane}: {status} in {dt / 60:.1f} min — {tail}")
        rc |= code
    print(f"[suite] {'GREEN' if rc == 0 else 'RED'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
