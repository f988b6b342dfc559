"""Cardinality sketching.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is the default at
scale, but its register layout is engine-specific — it cannot be verified
against another engine. :func:`kmv_distinct_count` is a K-Minimum-Values
sketch on deterministic md5-derived 52-bit hashes: same accuracy class
(relative error ≈ 1/√(k−2)), fully reproducible across engines, so the
DuckDB oracle recomputes the identical estimate.

Distributed shape: hash → distinct → ``orderBy().limit(k)``, which Spark
executes as per-partition top-k + driver merge of k·P values
(TakeOrderedAndProject) — exactly the partial-sketch-then-merge pattern,
never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO_52 = 4503599627370496.0  # 2^52


def kmv_hash(col: Column) -> Column:
    """Deterministic 52-bit uniform hash (first 13 hex chars of md5) —
    fits a double exactly, reproducible in any SQL engine."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "long"
    )


def kmv_distinct_count(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One-row DataFrame ``(est_distinct double)``: the KMV estimate
    (k−1)/(h_k/2^52), exact when fewer than k distinct values exist."""
    mins = (
        df.select(kmv_hash(F.col(col)).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
    s = mins.agg(F.count("*").alias("cnt"), F.max("hv").alias("mx"))
    est = F.when(
        F.col("cnt") < k, F.col("cnt").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("mx").cast("double") / F.lit(_TWO_52))
    )
    return s.select(est.alias("est_distinct"))
