"""Product quantization (PQ) for approximate nearest neighbor — the
compression half of the IVF-PQ pairing that is the de-facto standard for
billion-scale ANN (Jégou et al., "Product Quantization for Nearest
Neighbor Search", public knowledge; no reference analogue — the reference
has no vector operations at all).

The embedding space is split into ``m`` contiguous subspaces; each
subspace gets its own ``k``-centroid codebook (k-means under squared-L2),
and a vector is stored as ``m`` small codes — at m=8, k=16 that is 8
codes ≈ 4 bytes replacing 64 float32s (64×).  Query scoring is ADC
(asymmetric distance computation): one ``m×k`` table of
query-to-centroid partial distances, then every vector's approximate
distance is ``m`` table lookups + adds — no float math per candidate.

Determinism contract (what makes the driver's SQL oracle possible — the
same discipline as the IVF/SemDeDup oracles, here applied to L2):

* every partial distance is ``Σ_j floor((x_j-c_j)²·1e10)`` — an exact
  int64; assignment argmin tie-breaks to the LOWEST code id;
* codebook means are floor-quantized sums divided once (``qs/n/1e10``);
  empty clusters keep their previous centroid;
* ADC totals are sums of int64 table entries — order-free; top-k orders
  by ``(adist ASC, id ASC)``.

Scale shape: training state is ``m·k·dsub`` centroid doubles (driver /
broadcast — 1024 doubles at 8×16×8); each Lloyd iteration is ONE
vectorized assignment pass + ONE combiner aggregate collecting
``m·k·dsub`` quantized cells.  Encoding is a single Arrow-batched pass
emitting m codes/vector; the ADC scan is a projection + half-k-row
top-k (TakeOrderedAndProject) — no shuffle wider than the final k rows.
At 100 TB, pair with the IVF partition pruning in
``pipeline/similarity.py`` (probe lists prune parquet directories) so
the ADC scan touches only probed partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_QP = 1e10  # fixed-point scale shared with the IVF score/mean arithmetic


Codebooks = list[list[tuple[int, list[float]]]]  # [sub][(code, centroid)]


def _seed_codebooks(
    df: DataFrame, m: int, k: int, vec_col: str, id_col: str
) -> Codebooks:
    """Codes 0..k-1 = the first k vectors in id order, sliced per
    subspace (positional ids — PQ codes are indexes, not vector ids)."""
    rows = df.orderBy(id_col).limit(k).collect()
    if not rows:
        raise ValueError("cannot seed PQ codebooks from an empty DataFrame")
    if len(rows) < k:
        raise ValueError(
            f"need at least k={k} vectors to seed {k} PQ codes, got {len(rows)}"
        )
    d = len(rows[0][vec_col])
    dsub = d // m
    if m * dsub != d:
        raise ValueError(f"dim {d} not divisible into {m} subspaces")
    return [
        [
            (code, [float(x) for x in r[vec_col]][s * dsub : (s + 1) * dsub])
            for code, r in enumerate(rows)
        ]
        for s in range(m)
    ]


def _encode_udf(books: Codebooks) -> Column:
    """Arrow-batched encoder: m argmin codes per vector under the exact
    quantized-L2 distance (ties → lowest code)."""
    C = np.stack(
        [np.stack([np.asarray(v) for _, v in sub]) for sub in books]
    )  # (m, k, dsub)
    m, k, dsub = C.shape

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def enc(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        X = X.reshape(n, m, dsub)
        # per-subspace loop: peak temp is (batch, k, dsub) — m× smaller
        # than the broadcast (batch, m, k, dsub) form, whose alloc/free
        # churn across 32 workers measurably thrashed the kernel at the
        # 1M-vector scaling-probe point (98% sys time). Same arithmetic,
        # identical codes (argmin keeps first occurrence = lowest code).
        codes = np.empty((n, m), dtype=np.int64)
        for s in range(m):
            d = X[:, s, None, :] - C[s][None, :, :]  # (n, k, dsub)
            qd = np.floor(d * d * _QP).astype(np.int64).sum(axis=2)
            codes[:, s] = np.argmin(qd, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return enc


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Codebooks:
    """Per-subspace k-means codebooks (quantized-L2, fixed iteration
    count, deterministic seeds/ties — the oracle unrolls this exactly).
    All m subspaces train in the SAME jobs: one encode pass + one
    (sub, code, pos) combiner aggregate per iteration.

    Spec bound: the codebook mean is computed as exact Python int
    division ``qs / n`` on the quantized coordinate sum, and the DuckDB
    oracle computes ``CAST(qs AS DOUBLE) / n``.  The two are
    bit-identical only while ``|qs| <= 2^53`` — at the _QP=1e10 scale
    that is ~9e5 unit-scale coordinates per (sub, code, pos) cell.
    Beyond that the parity contract (like the k-means CTE family it
    mirrors) requires re-quantizing the accumulator; that bound is part
    of the spec, not an accident of this implementation."""
    books = _seed_codebooks(df, m, k, vec_col, id_col)
    dsub = len(books[0][0][1])
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for _ in range(iters):
        enc = _encode_udf(books)
        assigned = df.select(
            enc(F.col(vec_col)).alias("codes"),
            F.posexplode(vec_d).alias("pos", "x"),
        ).select(
            (F.col("pos") / dsub).cast("long").alias("sub"),
            F.col("pos"),
            F.element_at("codes", (F.col("pos") / dsub).cast("int") + 1).alias(
                "code"
            ),
            "x",
        )
        cells = (
            assigned.groupBy("sub", "code", "pos")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("x") * _QP).cast("long")).alias("qs"),
            )
            .collect()
        )
        got: dict[tuple[int, int, int], float] = {
            (r["sub"], r["code"], r["pos"]): r["qs"] / r["n"] / _QP
            for r in cells
        }
        books = [
            [
                (
                    code,
                    [
                        got.get((s, code, s * dsub + j), old[j])
                        for j in range(dsub)
                    ],
                )
                for code, old in sub
            ]
            for s, sub in enumerate(books)
        ]
    return books


def pq_encode(
    df: DataFrame,
    books: Codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes) — the stored PQ index: m int codes per vector."""
    return df.select(
        F.col(id_col), _encode_udf(books)(F.col(vec_col)).alias("codes")
    )


def adc_table(books: Codebooks, query_vec: list[float]) -> np.ndarray:
    """(m, k) int64 table of query-to-centroid partial distances."""
    q = np.asarray(query_vec, dtype=np.float64)
    m = len(books)
    dsub = len(books[0][0][1])
    out = np.empty((m, len(books[0])), dtype=np.int64)
    for s, sub in enumerate(books):
        qs = q[s * dsub : (s + 1) * dsub]
        for code, cvec in sub:
            d = qs - np.asarray(cvec)
            out[s, code] = int(np.floor(d * d * _QP).astype(np.int64).sum())
    return out


def pq_search(
    encoded: DataFrame,
    books: Codebooks,
    query_vec: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the PQ index: approximate distance = m JVM array
    lookups + integer adds per candidate (codegen — the encode UDF never
    runs at query time), then (adist ASC, id ASC) top-k →
    TakeOrderedAndProject."""
    from . import lit_int_array

    table = adc_table(books, query_vec)
    cols = [
        F.element_at(
            lit_int_array(table[s]),
            F.col("codes")[s].cast("int") + 1,
        )
        for s in range(len(books))
    ]
    adist = cols[0]
    for c in cols[1:]:
        adist = adist + c
    return (
        encoded.select(F.col(id_col), adist.alias("adist"))
        .orderBy(F.asc("adist"), F.asc(id_col))
        .limit(topk)
    )


# --------------------------------------------------------------- IVF-PQ
def ivfpq_build(
    df: DataFrame,
    n_coarse: int = 8,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Full IVF-PQ index build — the billion-scale ANN architecture:
    a coarse quantizer partitions the space (the engine's exact-math IVF
    k-means, so probe lists prune partitions), and each vector's RESIDUAL
    against its coarse centroid is product-quantized (residuals are what
    PQ compresses well — their energy is a fraction of the raw vectors').

    Returns ``(cents, books, encoded)``: the coarse centroid list, the
    per-subspace residual codebooks, and the stored index
    ``(id, cid, codes)`` — one small int + m codes per vector.  The
    residual computation is a JVM ``zip_with`` against the broadcast
    centroid table; no Python touches data outside the (Arrow-batched)
    encode passes."""
    from .similarity import ivf_train_exact

    cents = ivf_train_exact(
        df, n_centroids=n_coarse, iters=iters, vec_col=vec_col, id_col=id_col
    )
    resid = _residuals(df, cents, vec_col, id_col)
    books = pq_train(
        resid, m=m, k=k, iters=iters, vec_col="resid", id_col=id_col
    )
    encoded = resid.select(
        F.col(id_col),
        "cid",
        _encode_udf(books)(F.col("resid")).alias("codes"),
    )
    return cents, books, encoded


def _residuals(
    df: DataFrame, cents, vec_col: str, id_col: str
) -> DataFrame:
    """(id, cid, resid) — coarse assignment under the exact quantized
    score plus the vector's residual against its centroid, as a JVM
    ``zip_with`` over the broadcast centroid table (no Python)."""
    from .similarity import _argmax_centroid_exact

    cdf = df.sparkSession.createDataFrame(
        [(cid, list(map(float, cv))) for cid, cv in cents],
        "cid long, cvec array<double>",
    )
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        df.select(
            F.col(id_col),
            vec_d.alias("__v"),
            _argmax_centroid_exact(F.col(vec_col), cents).alias("cid"),
        )
        .join(F.broadcast(cdf), "cid")
        .select(
            F.col(id_col),
            "cid",
            F.zip_with("__v", "cvec", lambda a, b: a - b).alias("resid"),
        )
    )


def ivfpq_encode(
    df: DataFrame,
    cents,
    books: Codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode vectors against an ALREADY-TRAINED index — the incremental
    ingest path: a new batch gets (cid, m codes) rows from the frozen
    coarse centroids + residual codebooks, deterministically and without
    any retraining or shuffle (assignment and encoding are per-row
    against broadcast state), so a streaming ``foreachBatch`` can append
    straight into the cid-partitioned store `ivfpq_write` lays out."""
    resid = _residuals(df, cents, vec_col, id_col)
    return resid.select(
        F.col(id_col),
        "cid",
        _encode_udf(books)(F.col("resid")).alias("codes"),
    )


def ivfpq_write(encoded: DataFrame, path: str) -> None:
    """Persist an IVF-PQ index PARTITIONED BY coarse cell — the layout
    that makes a probe read ~nprobe/n_coarse of the index bytes: the
    search's ``cid IN (...)`` becomes a partition filter (directory-level
    pruning, zero files opened for unprobed cells).  The stored bytes are
    (id, m codes) per vector — the 64× compression is what fits a 100 TB
    corpus's index in a fraction of the space."""
    encoded.write.mode("overwrite").partitionBy("cid").parquet(path)


def ivfpq_search_stored(
    spark,
    path: str,
    cents,
    books: Codebooks,
    query_vec: list[float],
    nprobe: int = 4,
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Probed ADC search over an ``ivfpq_write`` layout: `ivfpq_search`'s
    cid filter lands on the partition column, so only the nprobe probed
    directories are listed and read (asserted as ``PartitionFilters`` in
    tests) — probe cost is capped by cell count, not corpus size."""
    return ivfpq_search(
        spark.read.parquet(path), cents, books, query_vec,
        nprobe=nprobe, topk=topk, id_col=id_col,
    )


def ivfpq_search(
    encoded: DataFrame,
    cents,
    books: Codebooks,
    query_vec: list[float],
    nprobe: int = 4,
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Probed ADC search over an IVF-PQ index: rank coarse centroids with
    the same exact score as assignment, take ``nprobe``, build one
    per-probe ADC table from the QUERY's residual against that centroid
    (the asymmetric part — each probe has its own query residual), and
    score only candidates in probed cells.  The per-probe tables join as
    a broadcast (nprobe·m·k rows) onto the exploded codes — integer sums,
    ``(adist ASC, id ASC)`` top-k.  With the index stored partitioned by
    ``cid`` (as `similarity.ivf_write` does), the cid filter prunes
    parquet directories and the scan never touches unprobed cells."""
    from .similarity import probe_centroids_exact

    spark = encoded.sparkSession
    probes = probe_centroids_exact(cents, query_vec, nprobe)
    cmap = dict(cents)
    q = np.asarray(query_vec, dtype=np.float64)
    rows = []
    for cid in probes:
        table = adc_table(books, list(q - np.asarray(cmap[cid])))
        for s in range(table.shape[0]):
            for code in range(table.shape[1]):
                rows.append((cid, s, code, int(table[s, code])))
    tdf = spark.createDataFrame(rows, "cid long, sub long, code long, qd long")
    cand = encoded.filter(F.col("cid").isin([int(p) for p in probes]))
    ex = cand.select(
        F.col(id_col), "cid", F.posexplode("codes").alias("sub", "code")
    )
    return (
        ex.join(F.broadcast(tdf), ["cid", "sub", "code"])
        .groupBy(id_col)
        .agg(F.sum("qd").alias("adist"))
        .orderBy(F.asc("adist"), F.asc(id_col))
        .limit(topk)
    )


def ivfpq_rerank(
    encoded: DataFrame,
    emb: DataFrame,
    cents,
    books: Codebooks,
    query_vec: list[float],
    nprobe: int = 4,
    shortlist: int = 20,
    topk: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production two-stage ANN serving path: the compressed index
    shortlists ``shortlist`` candidates by ADC distance
    (:func:`ivfpq_search` — integer sums over probed cells only), then
    ONLY those candidates' full vectors are fetched and re-ranked by
    exact cosine.  The expensive exact math touches ``shortlist`` rows
    regardless of corpus size; the full-vector fetch is an id-keyed join
    against the embedding table (shortlist side broadcast — at 100 TB
    the index scan reads codes, the re-rank reads O(shortlist) vectors,
    and nothing else moves).  Scores reuse the oracle-grade
    decimal-accumulated cosine, so the final ranking value-hashes."""
    from .similarity import cosine_topk_exact_decimal

    spark = emb.sparkSession
    short = ivfpq_search(
        encoded, cents, books, query_vec,
        nprobe=nprobe, topk=shortlist, id_col=id_col,
    ).select(id_col)
    qdf = spark.createDataFrame(
        [([float(x) for x in query_vec],)], f"{vec_col} array<double>"
    )
    cand = emb.join(F.broadcast(short), id_col)
    return cosine_topk_exact_decimal(
        cand, qdf, k=topk, vec_col=vec_col, id_col=id_col
    )
