"""Declarative data-quality constraint checking (Deequ/dbt-test-style).

A check suite is a list of constraint specs evaluated into one small report
DataFrame ``(check_name, table, violations, passed)`` — the pre-flight gate
a training-data pipeline runs before shipping a corpus snapshot.

Supported kinds:

* ``not_null``   — ``col`` has no nulls
* ``in_range``   — ``col`` within [lo, hi] (nulls don't violate; add a
                   not_null check for that)
* ``accepted``   — ``col`` ∈ values
* ``unique``     — the column tuple has no duplicate combinations
* ``fk``         — every non-null value of ``col`` exists in
                   ``ref_table.ref_col`` (referential integrity)

Scale shape: all row-level checks (not_null / in_range / accepted) on the
same table FUSE into one aggregate pass — one scan per table regardless of
check count, conditional counts inside Spark's partial aggregation.
``unique`` is one combiner-friendly groupBy that only ships keys with
count > 1; ``fk`` is a left-anti join (broadcast the reference side's
distinct keys when the dimension is small). Every check reduces to a 1-row
result before the union — the report never carries data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import InvalidParameter

_ROW_KINDS = ("not_null", "in_range", "accepted")
_KINDS = _ROW_KINDS + ("unique", "fk")


def _row_violation_expr(spec: dict):
    col = F.col(spec["col"])
    if spec["kind"] == "not_null":
        return col.isNull()
    if spec["kind"] == "in_range":
        return col.isNotNull() & (
            (col < spec["lo"]) | (col > spec["hi"])
        )
    if spec["kind"] == "accepted":
        return col.isNotNull() & ~col.isin(list(spec["values"]))
    raise InvalidParameter(f"not a row-level check: {spec['kind']!r}")


def check_report(engine, checks: list[dict]) -> DataFrame:
    """Evaluate a constraint suite; one output row per check, ordered as
    given via the caller's names. Each spec needs ``name``, ``table``,
    ``kind`` plus kind-specific fields (see module docstring)."""
    for spec in checks:
        if spec.get("kind") not in _KINDS:
            raise InvalidParameter(
                f"check {spec.get('name')!r}: kind must be one of {_KINDS}"
            )
    results: list[DataFrame] = []
    # fuse all row-level checks per table into ONE aggregate pass
    by_table: dict[str, list[dict]] = {}
    for spec in checks:
        if spec["kind"] in _ROW_KINDS:
            by_table.setdefault(spec["table"], []).append(spec)
    fused: dict[str, DataFrame] = {}
    for table, specs in by_table.items():
        df = engine.table(table)
        aggs = [
            F.count(F.when(_row_violation_expr(s), F.lit(1))).alias(s["name"])
            for s in specs
        ]
        fused[table] = df.agg(*aggs)
    for spec in checks:
        name, table, kind = spec["name"], spec["table"], spec["kind"]
        if kind in _ROW_KINDS:
            v = fused[table].select(
                F.col(name).cast("long").alias("violations")
            )
        elif kind == "unique":
            cols = list(spec["cols"])
            v = (
                engine.table(table)
                .groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                    .cast("long")
                    .alias("violations")
                )
            )
        else:  # fk
            child = engine.table(table).select(
                F.col(spec["col"]).alias("__k")
            ).filter(F.col("__k").isNotNull())
            ref = (
                engine.table(spec["ref_table"])
                .select(F.col(spec["ref_col"]).alias("__k"))
                .distinct()
            )
            v = (
                child.join(F.broadcast(ref), "__k", "left_anti")
                .agg(F.count(F.lit(1)).cast("long").alias("violations"))
            )
        results.append(
            v.select(
                F.lit(name).alias("check_name"),
                F.lit(table).alias("table_name"),
                "violations",
                (F.col("violations") == 0).alias("passed"),
            )
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
