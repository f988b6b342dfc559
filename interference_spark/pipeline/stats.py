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
    # group totals via a full-partition window over the SAME key
    # partitioning instead of a second aggregation of hist (r11): the old
    # totals branch re-evaluated the histogram groupBy — a second full
    # shuffle of the input — and joined it back; both window specs share
    # one exchange, and the final groupBy reuses the established key
    # partitioning.
    wtot = Window.partitionBy(*key_cols)
    joined = hist.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "n_rows", F.sum("__c").over(wtot)
    )
    aggs = [F.first("n_rows").alias("n_rows")]
    for p in percentiles:
        name = f"p{round(p * 100)}"
        rank = F.ceil(F.lit(p) * F.col("n_rows"))
        aggs.append(
            F.min(F.when(F.col("__cum") >= rank, F.col(value_col))).alias(name)
        )
    return joined.groupBy(*key_cols).agg(*aggs)


def event_funnel(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_seconds: int | None = None,
) -> DataFrame:
    """Multi-step conversion funnel: per user, how far through ``steps`` did
    they get, requiring each step to occur strictly AFTER the previous one
    (and, with ``within_seconds``, within that many seconds of it). Returns
    one row per user: ``(user, reached, t_<step>… epoch seconds)`` where
    ``reached`` counts completed steps.

    Shape at scale: ONE shuffle — per-user sorted timestamp arrays per step
    (collect_list of a step's epochs is bounded by that user's own events),
    then the stage chain is a per-row fold over those arrays with
    higher-order functions: t₁ = first(step₁), tₖ = first element of
    stepₖ's array after tₖ₋₁ (+window). No self-joins, no window over raw
    events, deterministic integer arithmetic end to end.
    """
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    arrs = [
        F.sort_array(
            F.collect_list(F.when(F.col(type_col) == s, epoch))
        ).alias(f"__a{i}")
        for i, s in enumerate(steps)
    ]
    per_user = df.groupBy(user_col).agg(*arrs)
    cols = [F.col(user_col)]
    prev_t = None
    t_exprs = []
    for i, s in enumerate(steps):
        arr = F.col(f"__a{i}")
        if prev_t is None:
            t = F.get(arr, 0)
        else:
            nxt = F.filter(arr, lambda x: x > prev_t)  # noqa: B023
            if within_seconds is not None:
                nxt = F.filter(
                    nxt, lambda x: x <= prev_t + within_seconds  # noqa: B023
                )
            t = F.when(prev_t.isNotNull(), F.get(nxt, 0))
        t_exprs.append(t.alias(f"t_{s}"))
        prev_t = t
    reached = None
    for te, s in zip(t_exprs, steps):
        bit = F.when(F.col(f"t_{s}").isNotNull(), 1).otherwise(0)
        reached = bit if reached is None else reached + bit
    return per_user.select(*cols, *t_exprs).select(
        user_col, *[f"t_{s}" for s in steps], reached.alias("reached")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86400,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period (cohort), counted in each later period they return —
    ``(cohort_period, k, n_users)`` with k = periods since the cohort's
    start (k = 0 is the cohort size itself).

    Shape at scale: dedup to (user, period) first — everything after runs
    on at most users×periods rows, never raw events; the cohort assignment
    is a per-user min + an equi-join on the user key; the final aggregate
    is combiner-friendly on (cohort, k). All integer arithmetic.
    """
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    ud = (
        df.select(
            F.col(user_col).alias("u"),
            F.floor(epoch / period_seconds).cast("long").alias("p"),
        )
        .distinct()
    )
    cohorts = ud.groupBy("u").agg(F.min("p").alias("c"))
    return (
        ud.join(cohorts, "u")
        .groupBy(F.col("c").alias("cohort_period"), (F.col("p") - F.col("c")).alias("k"))
        .agg(F.count("*").alias("n_users"))
    )


def robust_outliers(
    df: DataFrame,
    key_cols: tuple[str, ...],
    value_col: str,
    k_mad: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier profile via median/MAD — the quality gate
    that survives the outliers it is hunting (mean/stddev do not): one row
    per group with the exact discrete median, the exact median absolute
    deviation, and how many rows sit beyond ``k_mad`` MADs.

    Two passes, both the exact-percentile shape (value-histogram + running
    sum over histogram rows, never a sort of raw data): pass 1 computes
    medians; pass 2 re-keys deviations |x − median| through the same
    machinery and counts exceedances. Subtraction/abs of doubles is exact
    IEEE, so the whole profile is engine-reproducible.
    """
    med = exact_group_percentiles(df, key_cols, value_col, (0.5,)).select(
        *key_cols, F.col("p50").alias("__med")
    )
    dev = df.join(med, list(key_cols)).select(
        *key_cols,
        F.col("__med"),
        F.abs(F.col(value_col) - F.col("__med")).alias("__dev"),
    )
    mad = exact_group_percentiles(dev, key_cols, "__dev", (0.5,)).select(
        *key_cols, F.col("n_rows"), F.col("p50").alias("mad")
    )
    out = (
        dev.join(mad, list(key_cols))
        .groupBy(*key_cols)
        .agg(
            F.first("__med").alias("median"),
            F.first("mad").alias("mad"),
            F.first("n_rows").cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("__dev") > F.lit(k_mad) * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )
    return out.select(*key_cols, "n_rows", "median", "mad", "n_outliers")


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """First-order transition counts over each user's event stream:
    ``(from_type, to_type, n, frac)`` where frac is the row-normalized
    transition probability (exact integer counts divided once — the Markov
    adjacency matrix behind journey analysis and next-event baselines).

    One window pass partitioned by user (parallel across users, bounded by
    each user's own history) + one combiner-friendly pair aggregate; the
    normalizing totals ride a second tiny aggregate over the pair counts,
    never the events. Ties on ts are broken by ``order_tiebreak`` (pass an
    id column for full determinism on dup timestamps).
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.select(
            F.col(user_col),
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("__t"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type", "to_type", F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("__t").cast("double")).alias("frac"),
        )
    )


def quantile_tiers(
    df: DataFrame,
    key_cols: tuple[str, ...],
    value_col: str,
    n_tiers: int = 4,
    out_col: str = "tier",
) -> DataFrame:
    """Per-group quantile tiers: every row labeled 1..n_tiers by which
    within-group quantile band its value falls in (tier 1 = lowest) — the
    quality-tiered mixture tool ("oversample the top quartile per
    language"). Exact discrete cut points from the percentile histogram
    machinery (never a raw sort); the cuts broadcast back, so the data
    side is a pure projection join.

    Ties at a cut point: values ≤ cut_k belong to tier ≤ k (cut values
    from :func:`exact_group_percentiles`' discrete definition), matching
    the SQL oracle exactly.
    """
    qs = tuple(i / n_tiers for i in range(1, n_tiers))
    cuts = exact_group_percentiles(df, key_cols, value_col, qs)
    cut_names = [f"p{round(q * 100)}" for q in qs]
    tier = F.lit(1)
    for name in cut_names:
        tier = tier + F.when(F.col(value_col) > F.col(name), 1).otherwise(0)
    return (
        df.join(F.broadcast(cuts.select(*key_cols, *cut_names)), list(key_cols))
        .withColumn(out_col, tier.cast("int"))
        .drop(*cut_names, "n_rows")
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Key-distribution skew diagnostics: the ``top_n`` heaviest keys with
    their absolute count, corpus share, skew ratio vs a uniform
    distribution (``cnt · n_keys / total`` — 1.0 means perfectly uniform),
    and cumulative share in heaviness order.  This is the pre-flight check
    for every shuffle key in this repo: a key with share ≫ 1/parallelism
    needs salting (``pipeline/skew.py``) before it becomes the straggler
    partition at 100 TB.

    Scale shape: per-key counts are a combiner-friendly hash aggregation;
    the heaviest-key selection is ``orderBy().limit()`` →
    TakeOrderedAndProject (distributed partial top-k, never a global
    sort); the cumulative window then runs over exactly ``top_n`` rows.
    Corpus totals are a 1-row broadcast."""
    from pyspark.sql import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col(key_col).asc()).limit(top_n)
    w = (
        Window.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        ))
        .withColumn("cum_cnt", F.sum("cnt").over(w))
        .select(
            F.col(key_col),
            "cnt",
            "rank",
            (F.col("cnt").cast("double") / F.col("total").cast("double")).alias("share"),
            (
                (F.col("cnt") * F.col("n_keys")).cast("double")
                / F.col("total").cast("double")
            ).alias("skew_ratio"),
            (F.col("cum_cnt").cast("double") / F.col("total").cast("double")).alias("cum_share"),
            "n_keys",
            "total",
        )
    )


def decayed_activity(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window_rows: int = 16,
) -> DataFrame:
    """Per-event exponentially-decayed activity score over the last
    ``window_rows`` events of the key: score = Σ value_{t-j} · 2^(−j) —
    the classic recency-weighted engagement / fraud-velocity feature.

    The decay is computed in EXACT integer arithmetic: each value is
    quantized to q = floor(v·1e6) and the 2^−j weight becomes an
    arithmetic shift ``q >> j`` — no pow(), so the result is bit-identical
    in any engine (IEEE halving would be exact too, but the shift keeps
    the whole accumulation in int64).

    Scale shape: one hash exchange on the key + per-key ordered window;
    the frame is ROWS-bounded (≤ window_rows values per row), so state per
    row is constant. The collect_list carries quantized longs, not raw
    rows."""
    from pyspark.sql import Window

    q = F.floor(F.col(value_col) * 1000000.0).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    score_q = F.expr(
        "aggregate(sequence(0, size(__arr) - 1), 0L, "
        "(acc, i) -> acc + shiftright(element_at(__arr, size(__arr) - i), i))"
    )
    # collect_list skips NULL values, so an all-NULL window leaves an
    # EMPTY array — and sequence(0, -1) counts DOWN to [0, -1], driving
    # element_at(arr, 0) into INVALID_INDEX_OF_ZERO (same pitfall guarded
    # in text.ngrams_from_tokens). Empty window → NULL score, matching
    # SQL list_sum([]) semantics in the oracle.
    score = F.when(
        F.size(F.col("__arr")) == 0, F.lit(None).cast("double")
    ).otherwise(score_q.cast("double") / 1000000.0)
    return (
        df.select(id_col, key_col, ts_col, q.alias("__qv"))
        .withColumn("__arr", F.collect_list("__qv").over(w))
        .select(
            id_col,
            key_col,
            F.col(ts_col),
            score.alias("decayed_score"),
        )
    )


def kanonymity_audit(
    df: DataFrame, qid_cols: tuple[str, ...], k: int = 5
) -> DataFrame:
    """Privacy audit: quasi-identifier combinations held by FEWER than
    ``k`` rows — the groups whose members a release would re-identify.
    One combiner-friendly groupBy on the quasi-identifier tuple; the
    violating-group output is at most the number of small groups, never
    the data."""
    return (
        df.groupBy(*[F.col(c) for c in qid_cols])
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def frequent_sequences(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
    n: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Top-k most frequent length-``n`` event-type sequences across user
    streams (sequence mining's contiguous-pattern core — the n>2
    generalization of the transition matrix): ``(seq, n, support)`` where
    seq is '>'-joined and support = n / total sequences.

    Plan: one window pass per user stream builds the n-grams with
    ``lead`` columns (no arrays collected, constant state); a
    combiner-friendly groupBy counts them; top-k is
    TakeOrderedAndProject; the support denominator is a 1-row broadcast.
    Null-propagating concat (not concat_ws) keeps stream-tail partial
    windows out — identical to SQL ``||`` semantics."""
    from pyspark.sql import Window

    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(user_col).orderBy(*order)
    parts = [F.col(type_col)]
    for i in range(1, n):
        parts.extend([F.lit(">"), F.lead(type_col, i).over(w)])
    seqs = (
        df.select(F.concat(*parts).alias("seq"))
        .filter(F.col("seq").isNotNull())
    )
    counts = seqs.groupBy("seq").agg(F.count(F.lit(1)).alias("n"))
    total = seqs.agg(F.count(F.lit(1)).alias("total"))
    top = counts.orderBy(F.col("n").desc(), F.col("seq").asc()).limit(top_k)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "seq", "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias("support"),
        )
    )
