#!/usr/bin/env python3
"""Render the OPTIMIZATION_r11.md per-query checklist table from the
committed profiler logs (before vs after) and the bench records."""
import json
import re
import sys

ACTIONS = {
    "lang_id_multiclass": "SQL featurize, Arrow weight rows, shared train_filter featurize",
    "quality_hash_classifier": "SQL featurize, step-invariant GD plan, Arrow weight rows, train_filter",
    "clean_repeated_passages": "sentinel-tail single explode; corpus doc_id join removed",
    "rank_rrf_fusion": "bm25 stats de-exploded + tf persisted; query vec as 1-row broadcast",
    "rank_bm25_topk": "stats from pre-explode rows; tf persisted across consumers",
    "sim_cosine_topk": "query vec as 1-row broadcast (eager .first() job removed)",
    "dedup_exact_substring_pairs": "counts+longest-run in ONE aggregation (16->6 exchanges)",
    "corpus_heaps_law": "single explode; diamond-plan repartition dropped",
    "exact_value_percentiles": "totals via full-partition window (8->4 exchanges)",
    "quality_model_scores": "Arrow path for the collected 1-row Gram matrix",
    "sim_lsh_topk": "hyperplane fingerprints persisted across query/candidate branches",
}
CROSS = "table-handle cache + cheaper construction (cross-cutting commits)"


def load(path):
    out = {}
    for line in open(path):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            for k, v in d.items():
                if isinstance(v, dict) and "med" in v:
                    out[k] = v
    return out


def main():
    before = load("plans/r11/profile_before.log")
    after = load(sys.argv[1] if len(sys.argv) > 1 else "plans/r11/profile_after.log")
    rows = []
    for k, b in sorted(before.items(), key=lambda kv: -kv[1]["med"]):
        a = after.get(k, {})
        act = ACTIONS.get(k, CROSS)
        rows.append(
            f"| {k} | {b['med']:.2f} | {a.get('med', float('nan')):.2f} | "
            f"{b['exchanges']}→{a.get('exchanges', '?')} | {act} |"
        )
    print("| query | before s | after s | exchanges | action |")
    print("|---|---|---|---|---|")
    print("\n".join(rows))
    tb = sum(v["med"] for v in before.values())
    ta = sum(v["med"] for v in after.values() if "med" in v)
    print(f"\nTOTAL: {tb:.2f} -> {ta:.2f} s over {len(before)} noop-able queries")


if __name__ == "__main__":
    main()
