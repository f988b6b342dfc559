"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB design demands:

* **brute force** — exact cosine top-k with a JVM-side dot product
  (``zip_with`` + ``aggregate``: stays in codegen, no Python). O(n·d) scan,
  embarrassingly parallel, then a tiny ``orderBy().limit(k)`` which Spark
  executes as per-partition top-k + merge (TakeOrderedAndProject — no full
  sort shuffle).
* **IVF** — deterministic coarse quantizer (no training nondeterminism):
  centroids are a fixed sample of the corpus; search probes only the
  ``nprobe`` nearest partitions.  At scale the assignment is written
  partitioned-by-centroid so a query touches ~nprobe/k of the data.

An exact-decimal variant backs the DuckDB correctness oracle: float sums
are order-dependent, so the oracle path accumulates exact decimals and only
then converts to double — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product: fold of zip_with — whole-stage codegen."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine vs a constant query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    out = df.select(
        F.col(id_col),
        cosine(F.col(vec_col), q).alias("cosine"),
    )
    return out.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def cosine_topk_exact_decimal(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Oracle-grade top-k: per-position double products are exact and
    deterministic; sums accumulate as decimal(38,14) (exact, order-free);
    the final cosine is a deterministic chain of double ops. Mirrors the
    DuckDB oracle SQL exactly."""
    qexp = query_df.select(
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "qv")
    )
    eexp = df.select(
        F.col(id_col), F.posexplode(_as_double(F.col(vec_col))).alias("pos", "v")
    )
    dec = "decimal(38,14)"
    joined = eexp.join(F.broadcast(qexp), "pos")
    dots = joined.groupBy(id_col).agg(
        F.sum((F.col("v") * F.col("qv")).cast(dec)).alias("dot_d"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("n_e"),
        F.sum((F.col("qv") * F.col("qv")).cast(dec)).alias("n_q"),
    )
    cos = F.col("dot_d").cast("double") / (
        F.sqrt(F.col("n_e").cast("double")) * F.sqrt(F.col("n_q").cast("double"))
    )
    return (
        dots.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------- IVF
def ivf_build(
    df: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Deterministic IVF index: centroids = the n lowest-id vectors
    (reproducible without iterative training); assignment = argmax cosine.
    Returns (assignments DF with `centroid` column, centroid list).
    At 100 TB: write assignments partitioned by `centroid` so probing
    reads only matching partitions (partition pruning)."""
    cents = [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in df.orderBy(id_col).limit(n_centroids).collect()
    ]
    assigned = df.select(
        F.col(id_col),
        F.col(vec_col),
        _argmax_centroid(F.col(vec_col), cents).alias("centroid"),
    )
    return assigned, cents


def _argmax_centroid(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    pairs = [
        F.struct(
            cosine(vec, F.array(*[F.lit(v) for v in cvec])).alias("s"),
            F.lit(cid).alias("c"),
        )
        for cid, cvec in cents
    ]
    return F.greatest(*pairs).getField("c")


def ivf_search(
    assigned: DataFrame,
    cents: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the nprobe centroids nearest to the query, brute-force inside."""
    import numpy as np

    qa = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(qa) or 1.0

    def cos_to(cvec):
        ca = np.asarray(cvec, dtype=np.float64)
        cn = np.linalg.norm(ca) or 1.0
        return float(ca @ qa / (cn * qn))

    ranked = sorted(cents, key=lambda cv: (-cos_to(cv[1]), cv[0]))
    probe_ids = [cid for cid, _ in ranked[:nprobe]]
    cand = assigned.filter(F.col("centroid").isin(probe_ids))
    return cosine_topk(cand, query_vec, k, vec_col, id_col)
