#!/usr/bin/env python3
"""Core-ratio scaling probe (VERDICT r11 ask #5): the sf0.1 bench sits at
the per-job scheduler floor, so its 8-core and 32-core totals are ~equal
and a parallelism regression would be invisible.  This probe times ONE
heavy operator family on a synthetic corpus big enough to be
compute-bound (default 1M docs ≈ 10× the sf0.1 row count) at 8 and at 32
cores — each in its OWN subprocess/JVM, because a Spark master is fixed
per JVM — and reports the speedup ratio.  A scale-correct plan shows a
ratio well above 1 (ideal 4.0 for 8→32 with no serial floor).

The result is written to bench_results/core_ratio.json; bench.py copies
it into its record's "scaling" stanza (measurement metadata — nothing is
cached across bench runs, the probe itself recomputes from synthetic
inputs every invocation).

Usage: python tools/core_ratio_probe.py [n_docs] [op]
  op in {minhash, hash_classifier}; default minhash 1000000
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from interference_spark import build_spark
from tools.scaling_probe import _docs
cores = int(sys.argv[1]); n = int(sys.argv[2]); op = sys.argv[3]
spark = build_spark(
    app_name=f"core-ratio-{{cores}}",
    master=f"local[{{cores}}]",
    shuffle_partitions=cores,
    extra_conf={{"spark.driver.memory": "24g",
                 "spark.ui.showConsoleProgress": "false"}},
)
docs = _docs(spark, n)


def run():
    if op == "minhash":
        from interference_spark.pipeline.dedup import minhash_dedup_pairs
        # full 128-perm signatures: the compute-dense Pandas-UDF stage
        # must dominate, or the probe measures stage-launch floors
        out = minhash_dedup_pairs(docs, num_perm=128, bands=16, shingle_k=3)
    else:
        from interference_spark.pipeline.text import hash_kernel_classifier
        out = hash_kernel_classifier(
            docs.withColumn("label", (docs.doc_id % 2 == 0).cast("string")),
            docs, d=16, iters=2, label_col="label", positive="true",
        )[1]
    out.write.format("noop").mode("overwrite").save()


run()  # warm: JIT + python workers + broadcast pools
best = min(
    (lambda t0: (run(), time.perf_counter() - t0)[1])(time.perf_counter())
    for _ in range(2)
)
print(f"RESULT {{best:.4f}}", flush=True)
spark.stop()
"""


def _time_at(cores: int, n: int, op: str) -> float:
    res = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=REPO), str(cores), str(n), op],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    for line in res.stdout.splitlines():
        if line.startswith("RESULT "):
            return float(line.split()[1])
    raise RuntimeError(
        f"probe at {cores} cores failed:\n{res.stdout[-2000:]}\n"
        f"{res.stderr[-2000:]}"
    )


def _spin(k: int) -> int:
    # module-level: multiprocessing must pickle the worker fn
    import hashlib

    h = b"x" * 64
    for _ in range(k):
        h = hashlib.sha256(h).digest()
    return 1


def _effective_cores(procs: int) -> float:
    """Pure-CPU capacity of THIS box at `procs`-way parallelism, in units
    of one process's throughput (hashlib spin, no Spark).  The sandbox
    VM is hypervisor-throttled: r12 measured 32 procs delivering only
    ~9.8x one process's rate (8 procs: ~6.3x), so the maximum POSSIBLE
    8->32 wall-clock ratio for ANY perfectly parallel job here is their
    quotient (~1.56), not 4.0.  Recording it alongside the operator
    ratio makes the ratio interpretable across hosts."""
    import multiprocessing as mp
    import time as _t

    spin = _spin
    work = 2_000_000
    t0 = _t.perf_counter()
    spin(work)
    one = work / (_t.perf_counter() - t0)
    t0 = _t.perf_counter()
    with mp.Pool(procs) as pool:
        pool.map(spin, [work] * procs)
    rate = work * procs / (_t.perf_counter() - t0)
    return round(rate / one, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    op = sys.argv[2] if len(sys.argv) > 2 else "minhash"
    t0 = time.time()
    load0 = round(os.getloadavg()[0], 2)
    eff8, eff32 = _effective_cores(8), _effective_cores(32)
    sec8 = _time_at(8, n, op)
    sec32 = _time_at(32, n, op)
    rec = {
        "op": op,
        "n_docs": n,
        "sec_at_8_cores": round(sec8, 4),
        "sec_at_32_cores": round(sec32, 4),
        "ratio_8_over_32": round(sec8 / sec32, 3),
        "host_effective_cores_at_8": eff8,
        "host_effective_cores_at_32": eff32,
        "host_max_possible_ratio": round(eff32 / eff8, 3),
        "loadavg_at_start": load0,
        "wall_s": round(time.time() - t0, 1),
    }
    out = os.path.join(REPO, "bench_results", "core_ratio.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
