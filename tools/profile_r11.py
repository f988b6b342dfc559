#!/usr/bin/env python3
"""r11 optimization-round profiler: per-query timing + plan capture.

For each named query (default: the bench HEADLINE list) at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS]:

  * 2 warmup noop-sink runs, then N timed noop-sink runs (median kept);
  * separately times PLANNING (analyze+optimize+physical-plan, no
    execution) so plan-complexity-bound queries are legible;
  * counts plan features (Exchange, Sort, *EvalPython/MapIn*, joins,
    subtree count) from explain("formatted");
  * optionally writes the formatted plan to plans/r11/<name>_<tag>.txt.

Usage:
  python tools/profile_r11.py [--plans TAG] [--runs N] [--queries a,b,c]
Prints one JSON line per query and a sorted summary at the end.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def plan_features(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", plan)
        ),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "agg": len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)),
        "scans": len(re.findall(r"Scan parquet|FileScan", plan)),
        "chars": len(plan),
    }


def main() -> None:
    from interference_spark import build_spark
    from interference_spark import inventory
    import bench

    args = sys.argv[1:]
    plans_tag = None
    runs = 3
    names = list(bench.HEADLINE)
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_tag = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--queries":
            names = args[i + 1].split(",")
            i += 2
        elif args[i] == "--train-sf":
            # profile at the training-lane corpus instead
            globals()["SF_DIR"] = os.environ.get(
                "SPARK_GRAFT_TRAIN_SF_DIR", "/root/testdata/sf0.01"
            )
            i += 1
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    spark = build_spark(
        app_name="ifs-profile-r11",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.driver.memory": os.environ.get("IFS_DRIVER_MEM", "48g"),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    plans_dir = os.path.join(REPO, "plans", "r11")
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = inventory.QUERIES[name]
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        try:
            # planning-only time: build the DataFrame and force the
            # executedPlan string without running a job (median of 3)
            plan_times = []
            plan_str = ""
            for _ in range(3):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                plan_str = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                plan_times.append(time.perf_counter() - t0)
            plan_times.sort()

            for _ in range(2):
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            feats = plan_features(plan_str)
            rec = {
                "med": round(ts[len(ts) // 2], 4),
                "min": round(ts[0], 4),
                "plan_ms": round(plan_times[1] * 1000),
                **feats,
            }
            out[name] = rec
            print(json.dumps({name: rec}), flush=True)
            if plans_tag:
                with open(
                    os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
                ) as fh:
                    fh.write(plan_str)
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(json.dumps({name: out[name]}), flush=True)

    spark.stop()
    ranked = sorted(
        ((v.get("med", 99), k) for k, v in out.items()), reverse=True
    )
    print("\n=== slowest first (med sec | plan ms | exch | pyeval) ===")
    for med, k in ranked:
        v = out[k]
        print(
            f"{med:8.3f}  plan={v.get('plan_ms', '?'):>5}ms  "
            f"exch={v.get('exchanges', '?'):>2}  py={v.get('py_eval', '?'):>2}  {k}"
        )
    total = sum(v.get("med", 0) for v in out.values())
    print(f"TOTAL med: {total:.2f} s over {len(out)} queries")


if __name__ == "__main__":
    main()
