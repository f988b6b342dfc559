"""Distributed as-of (temporal) join — an operator Spark lacks natively
(the reference has no join beyond inner equi/theta either; this is part of
the training-pipeline extension surface).

Plan: tag both sides, align schemas, UNION, then one window pass per key
ordered by (ts, side) with ``last(..., ignorenulls=True)`` carrying the most
recent right-side values forward onto left rows. Exactly ONE shuffle (the
window's hash partition on the keys) regardless of table sizes — the
classic scalable as-of shape, vs. the naive range-join which explodes into
an O(n·m) theta join per key.

Backward inclusive semantics: each left row gets the latest right row with
``right_ts <= left_ts`` in its key group (right rows sort before left rows
at equal ts). If several right rows share (key, ts), pre-deduplicate the
right side — order among them is not defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of-backward join. Right columns (except keys) are appended,
    renamed with ``suffix`` on collision; unmatched left rows keep nulls."""
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys]
    rvals = [c for c in right.columns if c not in keys]
    out_name = {
        c: (c + suffix if c in left.columns else c) for c in rvals
    }

    l2 = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        *lcols,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in rvals
        ],
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    )
    w = (
        W.partitionBy(*keys)
        .orderBy("__ts", "__src")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l2.unionByName(r2).select(
        *keys,
        "__src",
        *lcols,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(out_name[c])
            for c in rvals
        ],
    )
    return filled.filter(F.col("__src") == 1).drop("__src")
