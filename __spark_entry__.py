"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the reference manual's multiway equi-join shape
executed through the full stack (dialect parser → resolver → DataFrame
compiler → Catalyst) on sf0.001.

``queries()`` / ``oracle_sql()`` — the SURVEY §2 operator inventory plus the
training-data pipeline operators; definitions live in
``interference_spark.inventory`` (one decorated function per operator, with
its DuckDB oracle alongside).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from interference_spark import inventory

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return inventory.QUERIES["dialect_multiway_join"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return inventory.queries()


def oracle_sql() -> dict[str, str]:
    return inventory.oracle_sql()
