"""Distributed id generation — the ``@DistributedId`` / ``@GeneratedValue``
analogue (reference ``core/DistributedId.java``; README "Distribute rules":
cluster-wide unique ids without coordination).

Two tiers:

* :func:`with_unique_id` — ``monotonically_increasing_id``: unique across
  the cluster with zero coordination and zero shuffle (partition id in the
  upper bits, per-partition counter in the lower). NOT dense. The right
  default for bulk ingest at 100 TB.
* :func:`with_sequential_id` — dense 1..n ids: per-partition counts →
  driver prefix-sum (P integers) → broadcast offsets + per-partition local
  rank. Two passes, no single-task stage — use when downstream semantics
  need gapless ids (the reference's incremental-id benchmark shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def with_unique_id(df: DataFrame, col: str = "id") -> DataFrame:
    """Cluster-wide unique (sparse) int64 ids, coordination-free."""
    return df.withColumn(col, F.monotonically_increasing_id())


def with_sequential_id(
    df: DataFrame, col: str = "id", start: int = 1
) -> DataFrame:
    """Dense sequential ids ``start..start+n-1`` in partition order.
    Materializes the partition layout (localCheckpoint) so the two passes
    see identical splits; each pass is fully parallel."""
    base = (
        df.withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = {
        r["__pid"]: r["cnt"]
        for r in base.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    acc = start
    rows = []
    for p in sorted(sizes):
        rows.append((p, acc))
        acc += sizes[p]
    if not rows:
        return df.withColumn(col, F.lit(None).cast("long"))
    off = df.sparkSession.createDataFrame(rows, "__pid int, __off long")
    lrn = F.row_number().over(
        W.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    )
    return (
        base.withColumn("__lrn", lrn)
        .join(F.broadcast(off), "__pid")
        .withColumn(col, F.col("__off") + F.col("__lrn") - 1)
        .drop("__pid", "__lrn", "__off")
    )
