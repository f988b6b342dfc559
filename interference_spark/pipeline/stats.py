"""Exact distributed order statistics.

Spark's native ``percentile_approx`` is an approximation and its internal
quantile sketch is not reproducible across engines — useless for an oracle
and for pipelines that need THE median, not a near-median. This module
computes EXACT discrete percentiles scalably: aggregate to a per-group
(value → count) histogram first (size bounded by distinct values per group,
not rows), then take a running sum over the histogram. The only windowed
stage runs over histograms, never raw rows, so there is no per-group or
corpus-wide sort of the data at 100 TB.

Percentile definition (discrete / lower): the smallest value whose
cumulative count reaches ``ceil(p * n)`` — integer ranks, no interpolation,
bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_group_percentiles(
    df: DataFrame,
    key_cols: tuple[str, ...],
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One row per key group: group size and the exact discrete percentiles
    of ``value_col``. The Window partitions BY GROUP over histogram rows —
    parallel across groups, each partition is histogram-sized."""
    from pyspark.sql import Window

    hist = df.groupBy(*key_cols, value_col).agg(F.count("*").alias("__c"))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(w))
    totals = hist.groupBy(*key_cols).agg(F.sum("__c").alias("n_rows"))
    joined = cum.join(totals, list(key_cols))
    aggs = [F.first("n_rows").alias("n_rows")]
    for p in percentiles:
        name = f"p{round(p * 100)}"
        rank = F.ceil(F.lit(p) * F.col("n_rows"))
        aggs.append(
            F.min(F.when(F.col("__cum") >= rank, F.col(value_col))).alias(name)
        )
    return joined.groupBy(*key_cols).agg(*aggs)
