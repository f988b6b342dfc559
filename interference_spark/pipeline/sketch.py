"""Cardinality and frequency sketching.

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

:func:`cms_sketch` / :func:`cms_heavy_hitters` add a Count-Min sketch on the
same deterministic hash family: frequency estimation and heavy-hitter
extraction whose d×w counter table is an *additive* aggregate — partial
sketches merge by cell-wise sum, which is exactly what Spark's partial
aggregation does for the ``groupBy(d, b).count()`` formulation. The sketch
(d·w rows) is broadcast for the probe join, so estimating frequencies never
shuffles the fact side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def cms_bucket(col: Column, seed: str, width: int) -> Column:
    """Deterministic Count-Min bucket: 52-bit md5 hash of ``seed ⊕ value``
    mod ``width`` — reproducible in any engine with md5 (the DuckDB oracle
    recomputes it via ``('0x' || substring(md5(...), 1, 13))::BIGINT``)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), col.cast("string"))), 1, 13), 16, 10
    ).cast("long")
    return h % F.lit(width)


def _cms_probes(col: Column, width: int, depth: int) -> Column:
    """array<struct<d,b>> of this value's ``depth`` sketch cells."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), cms_bucket(col, f"cms{d}:", width).alias("b")
            )
            for d in range(depth)
        ]
    )


def cms_sketch(df: DataFrame, col: str, width: int = 64, depth: int = 4) -> DataFrame:
    """Count-Min sketch of ``df[col]`` as a ``(d, b, cnt)`` DataFrame with at
    most ``depth × width`` rows. One wide pass over the data: each row
    explodes into its ``depth`` cells and a single groupBy counts them —
    Spark's map-side partial aggregation makes this the canonical
    "local sketch per partition, merge by cell-wise sum" plan with only the
    tiny counter table on the shuffle."""
    return (
        df.select(F.explode(_cms_probes(F.col(col), width, depth)).alias("p"))
        .select("p.d", "p.b")
        .groupBy("d", "b")
        .agg(F.count("*").alias("cnt"))
    )


def hist_bin(col: Column, lo: float, hi: float, bins: int) -> Column:
    """Fixed-width histogram bin index of ``col`` over [lo, hi): values
    outside the range clamp to the edge bins. With a power-of-two-friendly
    width ((hi-lo)/bins exactly representable) the double division is
    bit-identical in any IEEE-754 engine."""
    w = (hi - lo) / bins
    b = F.floor((col - F.lit(lo)) / F.lit(w)).cast("long")
    return F.least(F.lit(bins - 1), F.greatest(F.lit(0), b))


def hist_group_quantiles(
    df: DataFrame,
    keys: tuple[str, ...],
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 256,
) -> DataFrame:
    """Approximate per-group quantiles from a *mergeable* fixed-width
    histogram sketch: per-group bin counts (≤ ``bins`` rows per group,
    whatever the data size), a running sum windowed over histogram rows
    only, then linear interpolation inside the target bin.

    Scale shape: one map-side-combined groupBy produces the sketch — the
    shuffle carries at most ``groups × bins`` rows, never the data; the
    window partitions by group so cumulation is parallel across groups.
    Bin counts are additive, so partial sketches from separate part files /
    days merge by cell-wise sum (same property the incremental rollups
    exploit for KMV/CMS). Unlike ``percentile_approx`` (GK sketch,
    engine-specific) every step here — clamped bin index, integer targets,
    one double interpolation from integer inputs — is reproducible in any
    engine, so the DuckDB oracle recomputes the identical estimate.

    Output: ``keys…, n_rows, q_<nn> double per quantile`` (e.g. ``q_50``).
    """
    w = (hi - lo) / bins
    h = (
        # NULL values are excluded up front: a NULL bin would otherwise
        # enter n_rows and sort FIRST in the cumulation (Spark ASC nulls
        # first), shifting every rank and making the crossing bin's
        # estimate NULL — and it would diverge from the rollup 'hist'
        # partial, which never scatters a NULL cell
        df.filter(F.col(col).isNotNull())
        .groupBy(*keys, hist_bin(F.col(col), lo, hi, bins).alias("bin"))
        .agg(F.count("*").alias("c"))
    )
    win = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("bin")
    cum = h.withColumn("cum", F.sum("c").over(win))
    tot = h.groupBy(*keys).agg(F.sum("c").alias("n_rows"))
    j = cum.join(tot, list(keys))
    aggs = [F.min("n_rows").cast("long").alias("n_rows")]
    for q in qs:
        # target rank: smallest integer ≥ q·n (≥1). Exactly ONE bin has
        # prev < target ≤ cum — interpolate in that bin only (a bare
        # min-over-all-qualifying picks later bins whose extrapolated
        # estimate dips BELOW the crossing bin's: target − prev goes
        # negative there, so the interpolation is non-monotonic in bin)
        target = F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(q) * F.col("n_rows")))
        prev = F.col("cum") - F.col("c")
        est = F.lit(lo) + F.lit(w) * (
            F.col("bin").cast("double")
            + (target - prev).cast("double") / F.col("c").cast("double")
        )
        name = f"q_{str(q)[2:]}"
        aggs.append(
            F.min(
                F.when((F.col("cum") >= target) & (prev < target), est)
            ).alias(name)
        )
    return j.groupBy(*keys).agg(*aggs)


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    width: int = 64,
    depth: int = 4,
    frac_den: int = 40,
) -> DataFrame:
    """Items whose Count-Min estimated frequency is ≥ ``1/frac_den`` of all
    rows, as ``(v, est_count)``. est = min over the item's ``depth`` cells
    (the classic CMS upper-bound estimate; collisions only ever
    over-estimate, so no true heavy hitter is missed). The total row count
    is read from the sketch itself (sum of any one depth row) — no second
    scan of the data; integer cross-multiplication avoids float thresholds.

    At 100 TB the ``distinct()`` candidate set is the scaling concern, not
    the sketch: cap it by probing only candidates that survive a per-
    partition local top-k or a deterministic hash-sample, then estimate via
    the (broadcast, tiny) sketch exactly as here."""
    sketch = cms_sketch(df, col, width, depth)
    total = sketch.filter(F.col("d") == 0).agg(F.sum("cnt").alias("total"))
    est = (
        df.select(F.col(col).alias("v"))
        .distinct()
        .select("v", F.explode(_cms_probes(F.col("v"), width, depth)).alias("p"))
        .select("v", "p.d", "p.b")
        .join(F.broadcast(sketch), ["d", "b"])
        .groupBy("v")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("est_count") * frac_den >= F.col("total"))
        .select("v", "est_count")
    )


def kmv_slice_sketches(
    df: DataFrame, slice_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-slice KMV sketch rows ``(s, hv)``: the k minimum distinct
    52-bit hashes of ``value_col`` within each slice.  The per-slice
    top-k is a window rank over the distinct (slice, hash) rows — the
    shuffle carries hashes, not values, and each slice retains ≤ k rows."""
    w = Window.partitionBy("s").orderBy("hv")
    return (
        df.select(
            F.col(slice_col).alias("s"), kmv_hash(F.col(value_col)).alias("hv")
        )
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_pair_overlap(
    df: DataFrame, slice_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Pairwise set-cardinality estimates between slices WITHOUT comparing
    the underlying sets: for every slice pair (sa < sb), the KMV estimates
    of |A|, |B|, |A∪B| and the inclusion-exclusion |A∩B| (clamped at 0).

    This is the mergeable-sketch property doing real work: the union
    sketch of two slices is exactly the k minimum values of the UNION of
    their k-sets — so pair overlap costs O(slices² · k) on sketch rows,
    never a pass over the data.  When the merged sketch holds fewer than
    k hashes both inputs were complete and every figure is exact.

    All arithmetic is the deterministic (k−1)/(h_k/2^52) chain on
    md5-derived hashes — reproducible in any engine, oracle-verifiable."""
    sk = kmv_slice_sketches(df, slice_col, value_col, k)
    per = sk.groupBy("s").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("hv").alias("mx")
    )
    est = lambda cnt, mx: F.when(  # noqa: E731
        cnt < k, cnt.cast("double")
    ).otherwise(F.lit(float(k - 1)) / (mx.cast("double") / F.lit(_TWO_52)))
    per = per.select(
        "s", est(F.col("cnt"), F.col("mx")).alias("est")
    )
    slices = sk.select("s").distinct()
    pairs = (
        slices.select(F.col("s").alias("sa"))
        .join(slices.select(F.col("s").alias("sb")), F.col("sa") < F.col("sb"))
    )
    merged = (
        pairs.join(sk.select(F.col("s").alias("sa"), "hv"), "sa")
        .select("sa", "sb", "hv")
        .unionByName(
            pairs.join(sk.select(F.col("s").alias("sb"), "hv"), "sb")
            .select("sa", "sb", "hv")
        )
        .distinct()
    )
    wp = Window.partitionBy("sa", "sb").orderBy("hv")
    usk = (
        merged.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= k)
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("ucnt"), F.max("hv").alias("umx"))
        .select("sa", "sb", est(F.col("ucnt"), F.col("umx")).alias("est_union"))
    )
    ea = per.select(F.col("s").alias("sa"), F.col("est").alias("est_a"))
    eb = per.select(F.col("s").alias("sb"), F.col("est").alias("est_b"))
    inter = F.greatest(
        F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
    )
    return (
        usk.join(ea, "sa")
        .join(eb, "sb")
        .select(
            "sa", "sb", "est_a", "est_b", "est_union",
            inter.alias("est_intersection"),
        )
    )


def cms_join_size_estimate(
    dfa: DataFrame,
    dfb: DataFrame,
    col_a: str,
    col_b: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Equi-join cardinality estimate WITHOUT running the join: the
    Count-Min inner-product estimator — |A ⋈ B| on a key equals the dot
    product of the key-frequency vectors, and min over the sketch's
    ``depth`` rows of Σ_b cntA[d,b]·cntB[d,b] upper-bounds it tightly
    (AMS/CMS classic; exact when no bucket collisions).  The
    what-if input to join planning, skew triage, and output sizing.

    Scale shape: each side is one combiner-friendly sketch aggregation
    (shuffle carries ≤ depth·width counter rows); the dot product joins
    the two d×w tables cell-on-cell. Deterministic md5 bucketing →
    engine-reproducible, hash-oracle-able."""
    sa = cms_sketch(dfa, col_a, width, depth).withColumnRenamed("cnt", "ca")
    sb = cms_sketch(dfb, col_b, width, depth).withColumnRenamed("cnt", "cb")
    per_row = (
        sa.join(sb, ["d", "b"])
        .groupBy("d")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    # a depth row whose buckets never collide has true dot product 0 —
    # it must participate in the min as 0, not silently vanish (which
    # would both overestimate and return NULL on fully-disjoint inputs)
    depths = dfa.sparkSession.range(depth).select(F.col("id").cast("int").alias("d"))
    return (
        depths.join(per_row, "d", "left")
        .select(F.coalesce(F.col("dot"), F.lit(0)).alias("dot"))
        .agg(F.min("dot").cast("long").alias("est_join_size"))
    )
