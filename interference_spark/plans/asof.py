"""Distributed as-of (temporal) join — an operator Spark lacks natively
(the reference has no join beyond inner equi/theta either; this is part of
the training-pipeline extension surface).

Plan: tag both sides, align schemas, UNION, then one window pass per key
ordered by (ts, side) with ``last(..., ignorenulls=True)`` carrying the most
recent right-side values forward onto left rows. Exactly ONE shuffle (the
window's hash partition on the keys) regardless of table sizes — the
classic scalable as-of shape, vs. the naive range-join which explodes into
an O(n·m) theta join per key.

Directions (both inclusive at equal timestamps):

* ``backward`` — each left row gets the LATEST right row with
  ``right_ts <= left_ts`` (the default; market-data "last known value").
* ``forward``  — each left row gets the EARLIEST right row with
  ``right_ts >= left_ts`` (next-event attribution) — the same single
  window pass with the sort reversed.

``tolerance_seconds`` bounds the match distance: a carried right row
further than the tolerance nulls out (pandas ``merge_asof`` semantics).

If several right rows share (key, ts), pre-deduplicate the right side —
order among them is not defined.
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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join. Right columns (except keys) are appended, renamed
    with ``suffix`` on collision; unmatched (or out-of-tolerance) left
    rows keep nulls."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
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
    # a NULL-timestamp right row can never be anyone's nearest match —
    # drop it up front (with desc NULLS LAST ordering it would otherwise
    # be carried into every forward row)
    r2 = r2.filter(F.col("__ts").isNotNull())
    # backward: ascending ts, right (0) before left (1) at equal ts;
    # forward: descending ts, right still first at equal ts — in both, the
    # window's carried "last right row seen" is exactly the direction's
    # nearest match. NULL-ts LEFT rows must sort before any right row in
    # both directions (→ no match, symmetric): asc defaults to NULLS
    # FIRST; desc needs it explicitly.
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__src").asc()]
    else:
        order = [F.col("__ts").desc_nulls_first(), F.col("__src").asc()]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(out_name[c])
        for c in rvals
    ]
    mts = F.last(
        F.when(F.col("__src") == 0, F.col("__ts")), ignorenulls=True
    ).over(w)
    filled = l2.unionByName(r2).select(
        *keys, "__ts", "__src", *lcols, *carried, mts.alias("__mts")
    )
    out = filled.filter(F.col("__src") == 1)
    if tolerance_seconds is not None:
        # TIMESTAMP_NTZ cannot cast straight to DOUBLE (the r2
        # events_agg_by_type lesson) — route timestamp variants through
        # TIMESTAMP first; plain numerics cast directly
        from pyspark.sql import types as T

        def secs(c):
            if isinstance(
                filled.schema["__ts"].dataType, (T.TimestampType, T.TimestampNTZType)
            ):
                return c.cast("timestamp").cast("double")
            return c.cast("double")

        diff = secs(F.col("__ts")) - secs(F.col("__mts"))
        if direction == "forward":
            diff = -diff
        ok = F.col("__mts").isNotNull() & (diff <= tolerance_seconds)
        out = out.select(
            *keys, "__ts", *lcols,
            *[
                F.when(ok, F.col(out_name[c])).alias(out_name[c])
                for c in rvals
            ],
        )
    return out.drop("__src", "__mts", "__ts")
