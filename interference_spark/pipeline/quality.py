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


def profile_columns(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """Single-pass column profiling (the Deequ-profiles / describe()
    analogue): one output row per column with null count, exact distinct
    count, min/max, and an engine-exact mean.

    ``cols`` is ``[(name, kind)]`` with kind ∈ {num, str, ts}; timestamps
    profile as epoch seconds, strings carry null min/max/mean (lexical
    extremes belong to a typed report, not a double column).

    Exactness: the mean accumulates floor(x·1e6) as two split int64 sums
    (hi/lo, same scheme as the quantized aggregates elsewhere in this
    repo) so the double recombination is bit-identical in any engine —
    no float summation order anywhere.

    Scale shape: ALL columns profile in ONE aggregate pass over the data.
    The exact count(distinct) per column expands rows (Spark's Expand for
    multi-distinct) — at 100 TB swap it for the KMV sketch column
    (``pipeline/sketch``), same report shape."""
    num_kinds = {"num", "ts"}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, kind in cols:
        c = F.col(name)
        if kind == "ts":
            c = c.cast("timestamp").cast("long")
        aggs.append(
            F.count(F.when(F.col(name).isNull(), F.lit(1))).alias(f"__nn_{name}")
        )
        aggs.append(F.countDistinct(F.col(name)).alias(f"__nd_{name}"))
        if kind in num_kinds:
            q = F.floor(c * 1000000.0).cast("long")
            aggs.append(F.min(c).cast("double").alias(f"__mn_{name}"))
            aggs.append(F.max(c).cast("double").alias(f"__mx_{name}"))
            aggs.append(F.sum(F.shiftright(q, 20)).alias(f"__hi_{name}"))
            aggs.append(
                F.sum(q.bitwiseAND(F.lit((1 << 20) - 1))).alias(f"__lo_{name}")
            )
            aggs.append(F.count(c).alias(f"__nc_{name}"))
    row = df.agg(*aggs)
    structs = []
    for name, kind in cols:
        if kind in num_kinds:
            mean = (
                (
                    F.col(f"__hi_{name}").cast("double") * float(1 << 20)
                    + F.col(f"__lo_{name}").cast("double")
                )
                / 1000000.0
                / F.col(f"__nc_{name}").cast("double")
            )
            mn, mx = F.col(f"__mn_{name}"), F.col(f"__mx_{name}")
        else:
            mean = F.lit(None).cast("double")
            mn = F.lit(None).cast("double")
            mx = F.lit(None).cast("double")
        structs.append(
            F.struct(
                F.lit(name).alias("column_name"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nn_{name}").cast("long").alias("n_nulls"),
                F.col(f"__nd_{name}").cast("long").alias("n_distinct"),
                mn.alias("min_value"),
                mx.alias("max_value"),
                mean.alias("mean_value"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
