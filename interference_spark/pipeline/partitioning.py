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
