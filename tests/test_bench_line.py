"""bench.py stdout-line budget (VERDICT r10 ask #2).

The driver captures only ~2000 stdout chars; BENCH_r08-r10 all recorded
``"parsed": null`` because the final line embedded the full per-query
timing dicts.  These tests lock the compact line to
``bench.COMPACT_LINE_BUDGET`` chars for both the normal shape and a
pathological every-query-regressed round, without a Spark session.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _payload(n_queries: int = 77, regressions: dict | None = None,
             errors: dict | None = None) -> dict:
    queries = {f"query_name_{i:03d}": 0.1234 for i in range(n_queries)}
    return {
        "metric": "headline query wall-clock at sf (sum of per-query sec)",
        "value": 30.1723,
        "unit": "sec",
        "queries": queries,
        "errors": errors or {},
        "sf": "0.1",
        "cpus": 32,
        "pass_totals": {"1": 31.2345, "2": 30.1723},
        "loadavg_at_start": 0.12,
        "regressions": regressions or {},
        "regression_baseline": "r10.json",
        "training": {
            "queries": {f"train_{i}": 1.5 for i in range(8)},
            "total": 15.7612,
            "errors": {},
            "regressions": {},
        },
    }


def test_normal_round_fits_budget():
    line = bench.compact_stdout_line(_payload())
    assert len(line) <= bench.COMPACT_LINE_BUDGET, len(line)
    rec = json.loads(line)
    assert rec["value"] == 30.1723
    assert rec["n_queries"] == 77
    assert rec["training"]["total"] == 15.7612
    assert rec["training"]["n_queries"] == 8
    assert "queries" not in rec and "queries" not in rec["training"]
    assert rec["full_record"] == "bench_results/latest.json"


def test_pathological_round_still_fits_and_parses():
    # every query regressed AND errored — the unbounded maps collapse to
    # count strings rather than overflowing the capture window
    reg = {
        f"query_name_{i:03d}": {"prev": 0.1, "now": 0.9, "ratio": 9.0}
        for i in range(77)
    }
    err = {f"query_name_{i:03d}": "RuntimeError: " + "x" * 200
           for i in range(77)}
    line = bench.compact_stdout_line(_payload(regressions=reg, errors=err))
    assert len(line) <= bench.COMPACT_LINE_BUDGET, len(line)
    rec = json.loads(line)
    assert "77 entries" in rec["regressions"]
    assert "77 entries" in rec["errors"]


def test_per_query_centiseconds_ride_the_line():
    """r12 (VERDICT r11 ask #2): the line carries per-query centisecond
    ints — full training lane under training.tpq, headline under pq
    filled slowest-first within the budget — so the driver can diff
    per-query across rounds without the full record."""
    p = _payload()
    p["queries"]["slowest_query"] = 9.8765
    line = bench.compact_stdout_line(p)
    assert len(line) <= bench.COMPACT_LINE_BUDGET, len(line)
    rec = json.loads(line)
    assert rec["pq"]["slowest_query"] == 988  # int(round(9.8765*100))
    assert rec["training"]["tpq"] == {f"train_{i}": 150 for i in range(8)}
    # slowest-first fill: every included entry is >= every omitted one
    assert rec["pq_omitted"] + len(rec["pq"]) == len(p["queries"])


def test_long_names_fill_partially_but_line_always_fits():
    # 200 very long names cannot all fit: the line must stay under
    # budget, include a slowest-first prefix, and count the omissions
    p = _payload(n_queries=0)
    p["queries"] = {
        f"extremely_long_query_name_padding_{i:05d}_{'x' * 30}": 0.5 + i
        for i in range(200)
    }
    line = bench.compact_stdout_line(p)
    assert len(line) <= bench.COMPACT_LINE_BUDGET, len(line)
    rec = json.loads(line)
    assert rec["pq"] and rec["pq_omitted"] > 0
    assert len(rec["pq"]) + rec["pq_omitted"] == 200
    included = set(rec["pq"])
    omitted_max = max(
        v for k, v in p["queries"].items() if k not in included
    )
    assert min(rec["pq"].values()) >= int(round(omitted_max * 100)) - 100


def test_small_regression_maps_survive_inline():
    reg = {"q3_shipping_priority": {"prev": 0.35, "now": 0.51, "ratio": 1.46}}
    line = bench.compact_stdout_line(_payload(regressions=reg))
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    rec = json.loads(line)
    assert rec["regressions"]["q3_shipping_priority"]["ratio"] == 1.46
