"""Partitioning control: co-located joins and shuffle reuse.

At 100 TB the dominant cost of a large equi-join is shuffling BOTH sides.
Spark elides an Exchange when a side's existing ``HashPartitioning`` already
matches the join keys and partition count — so:

* within one query, pre-repartitioning both sides identically makes the
  join itself shuffle-free (this module);
* across queries, write fact tables hash-distributed on their join key
  (``partition_cols`` on managed tables / bucketed writes on a real
  deployment) and every later join skips both shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def co_partitioned_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    num_partitions: int,
    how: str = "inner",
) -> DataFrame:
    """Join after hashing both sides into the same partitioning on the join
    keys. Catalyst sees matching ``HashPartitioning(keys, n)`` on both
    children and inserts no further Exchange — the join is a per-partition
    merge of co-located data. Use when the same keyed shuffle would
    otherwise happen several times (multi-stage pipelines re-joining on one
    key), or to fix the partition count of a huge join explicitly instead
    of inheriting ``spark.sql.shuffle.partitions``."""
    keys = [on] if isinstance(on, str) else list(on)
    l = left.repartition(num_partitions, *keys)
    r = right.repartition(num_partitions, *keys)
    return l.join(r, keys, how)


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "day",
) -> None:
    """Persist an event table PARTITIONED BY a derived time bucket — the
    hypertable layout: a time-range predicate becomes a partition filter, so
    a "last 7 days" query over a 100 TB/years-deep table lists and reads
    only the matching day directories (directory-level pruning, like the
    IVF centroid probe). Readers get the bucket back as the ``__bucket``
    partition column; the raw ``ts_col`` is preserved for row-level
    filtering inside partitions."""
    from pyspark.sql import functions as F

    if granularity == "day":
        bucket = F.to_date(F.col(ts_col))
    elif granularity == "hour":
        bucket = F.date_trunc("hour", F.col(ts_col))
    else:
        raise ValueError(f"unsupported granularity {granularity!r}")
    (
        df.withColumn("__bucket", bucket)
        .write.mode("overwrite")
        .partitionBy("__bucket")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str] | str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Persist ``df`` as a bucketed (and bucket-sorted) table and return the
    catalog-backed scan. This is the *across-queries* co-location story:
    bucketing records ``HashPartitioning(keys, num_buckets)`` in table
    metadata, so every later equi-join or aggregation on ``keys`` between
    tables bucketed the same way runs with ZERO Exchange on either side —
    the shuffle was paid once at write time. ``sort=True`` additionally
    pre-sorts within buckets; Spark still inserts a (cheap, co-located)
    per-task Sort unless each bucket is a single file, but never an
    Exchange.

    At 100 TB: write fact tables bucketed on their dominant join key
    (orders/lineitem on orderkey) and re-joining them daily costs a
    co-located merge instead of two 100 TB shuffles. ``path`` makes the
    table external (data at ``path``, bucketing metadata in the session
    catalog); omit it to use ``spark.sql.warehouse.dir``."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format("parquet").mode("overwrite").bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)
    return df.sparkSession.table(name)
