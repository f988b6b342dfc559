"""Training-export operators: leakage-safe dataset splits and
deterministic shuffle-to-shards — the last mile of a training-data
pipeline (no reference analogue; driver mandate).

Split/shuffle keys use a deterministic integer mix rather than rand():
reproducible across runs, engines (a plain-SQL oracle computes the same
assignment), and cluster topologies — rand() with a seed is NOT stable
across partitionings, which silently changes the split when the cluster
size changes.  Two mixers:

* ``mix64`` — xxhash64 (JVM-side, codegen) for production keys of any
  type; fast, well-distributed.
* ``knuth_mix`` — multiplicative hashing ``(key * 2654435761) mod 2^32``
  (Knuth §6.4) for integer keys; exact in BIGINT arithmetic in ANY SQL
  engine, which is what makes the driver's DuckDB value-hash comparison
  possible.  Distribution is adequate for splitting; use mix64 when
  adversarial keys matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761  # 2^32 / golden ratio, Knuth multiplicative constant
_M32 = 1 << 32


def knuth_mix(col: Column) -> Column:
    """(key * 2654435761) mod 2^32 — portable integer mix (exact in int64
    for keys < ~3.5e9; larger ids should pre-fold with ``% 2^31``)."""
    return F.pmod(col.cast("long") * F.lit(_KNUTH), F.lit(_M32))


def knuth_mix_sql(expr: str) -> str:
    """DuckDB/ANSI rendering of :func:`knuth_mix` (same int64 arithmetic)."""
    return f"((CAST({expr} AS BIGINT) * {_KNUTH}) % {_M32} + {_M32}) % {_M32}"


def mix64(col: Column) -> Column:
    """Production mixer: xxhash64 (any column type, JVM codegen)."""
    return F.xxhash64(col)


_TWO_52 = 4503599627370496.0  # 2^52 — width of the md5-derived hash family


def hash52(salt: str, col: Column) -> Column:
    """Deterministic 52-bit uniform hash of ``salt ∥ value`` (first 13 hex
    chars of md5) — the shared hash family behind every sampler here and
    the sketches (``sketch.kmv_hash``): reproducible in any engine, and
    shared so the cross-sampler nested-sample guarantees hold."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")


def assign_split(
    df: DataFrame,
    unit_col: str,
    fractions: dict[str, float],
    mixer=knuth_mix,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the hash is computed on the
    LEAKAGE UNIT (user, document group, url-domain...), so every row of a
    unit lands in the same split — the property rand()-per-row splits
    violate.  Adds a ``split`` column; no shuffle (pure projection).

    ``fractions``: ordered {name: fraction}, summing to 1.0 (validated).
    Assignment: unit buckets h∈[0,10000) carved into cumulative ranges —
    e.g. {train: .8, val: .1, test: .1} → [0,8000) [8000,9000) [9000,10000).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    bucket = F.pmod(mixer(F.col(unit_col)), F.lit(10_000))
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(round(cum * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def assign_split_sql(unit_expr: str, fractions: dict[str, float]) -> str:
    """Oracle-side CASE expression mirroring :func:`assign_split` with the
    knuth mixer (use in a SELECT: ``... AS split``)."""
    bucket = f"({knuth_mix_sql(unit_expr)}) % 10000"
    parts, cum = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        parts.append(f"WHEN {bucket} < {int(round(cum * 10_000))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def shuffled_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    mixer=knuth_mix,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training export: shard =
    mix(id) % n_shards, within-shard order = (mix(id), id).  The
    "shuffle" is a pseudorandom but reproducible permutation — exporting
    twice (or from a differently-sized cluster) yields byte-identical
    shards, which rand() ordering cannot promise.

    Adds ``shard`` and ``shuffle_pos`` (0-based dense position within the
    shard).  Plan: one hash exchange on ``shard`` + per-shard sort — the
    row_number window partitions by shard, so no global single-task sort;
    shard count should be chosen ≫ executor count at 100 TB (e.g. 10k
    shards) so each sort fits in memory."""
    from pyspark.sql import Window

    h = mixer(F.col(id_col))
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)))
        .withColumn("shuffle_pos", F.row_number().over(w) - F.lit(1))
        .drop("__h")
    )


def write_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    path: str,
    mixer=knuth_mix,
) -> None:
    """Materialize shuffled shards as ``shard=N/`` parquet directories:
    repartition on the shard column (ONE exchange, co-locating each shard
    in one task) + in-task sort by shuffle position, so files are written
    in shuffle order — a trainer streams each shard sequentially with no
    further sort."""
    sharded = shuffled_shards(df, id_col, n_shards, mixer)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def write_jsonl_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    path: str,
    mixer=knuth_mix,
) -> None:
    """Same deterministic shuffle-to-shards layout as :func:`write_shards`,
    materialized as ``shard=N/`` directories of JSON-lines files — the
    format most training data loaders stream natively. Identical plan (one
    exchange + in-task sort, rows written in shuffle order); JSONL trades
    parquet's compression for splittable line-oriented streaming."""
    sharded = shuffled_shards(df, id_col, n_shards, mixer)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col,
    budget: int,
    n_shards: int = 4,
    mixer=knuth_mix,
) -> DataFrame:
    """GPT-style sequence packing (concat-then-chunk): documents are laid
    out in the deterministic shuffle order within each shard, token counts
    accumulate, and a document's pack is the budget-chunk its START falls
    into — the standard "concatenate everything, cut every ``budget``
    tokens" training layout (a document may straddle a cut; its tokens
    simply continue into the next pack, exactly like the real
    concatenated-token stream).

    Adds ``shard``, ``pack`` (0-based within shard), and ``pack_offset``
    (token offset of the doc inside the concatenated shard stream).  Plan:
    the same single hash exchange + per-shard window as
    :func:`shuffled_shards` — cumulative sums partition by shard, so no
    global single-task stage; shard count is the parallelism lever."""
    from pyspark.sql import Window

    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    h = mixer(F.col(id_col))
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)))
        .withColumn("__t", tok.cast("long"))
        .withColumn("__cum", F.sum("__t").over(w))
        .withColumn("pack_offset", F.col("__cum") - F.col("__t"))
        .withColumn(
            "pack", F.floor(F.col("pack_offset") / F.lit(int(budget))).cast("long")
        )
        .drop("__h", "__t", "__cum")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    unit_col: str,
    salt: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — corpus MIXTURE construction
    (e.g. keep 50% of English, 10% of each long-tail language): keep a row
    when md5(salt ∥ unit) falls in the lowest ``rates[stratum]`` fraction
    of hash space; strata missing from ``rates`` get ``default_rate``.
    Same hash family as ``text.hash_sample``, so a unit kept at rate r is
    also kept at every rate ≥ r (nested samples — raising a mixture weight
    only ADDS documents, never swaps them).  Pure projection+filter, zero
    shuffle; reproducible across runs, engines, partitionings."""
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for stratum {k!r} must be in [0,1], got {v}")
    h = hash52(salt, F.col(unit_col))
    thr = None
    for k, v in rates.items():
        t = int(v * 4503599627370496.0)
        cond = F.col(strata_col) == k
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        F.lit(int(default_rate * 4503599627370496.0))
        if thr is None
        else thr.otherwise(int(default_rate * 4503599627370496.0))
    )
    return df.filter(h < thr)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    scale: float = 1.0,
) -> DataFrame:
    """Deterministic importance sampling: keep each row with probability
    ``min(1, weight·scale)`` — the quality-weighted downsampling step of
    mixture building (keep high-quality docs more often), with the same
    reproducibility contract as the engine's other samplers: the keep
    decision is ``mix(id)/2³² < p``, a pure function of the row, so re-runs
    and differently-partitioned clusters keep the identical subset, and
    raising ``scale`` only ADDS rows (nested-sample property — a 2× budget
    bump never drops previously kept docs). Zero shuffle, pure projection.
    """
    p = F.least(F.lit(1.0), weight.cast("double") * F.lit(scale))
    u = knuth_mix(F.col(id_col)).cast("double") / float(_M32)
    return df.filter(u < p)


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    target_frac: float = 0.5,
) -> DataFrame:
    """Per-stratum keep probabilities for α=0.5 temperature sampling
    (the XLM-R-style multilingual rebalance: output shares ∝ √(stratum
    size), flattening head strata while keeping the long tail), at a
    total budget of ``target_frac`` of the corpus.

    Exactness: α=0.5 is chosen deliberately — IEEE sqrt is correctly
    rounded (pow(x, 0.3) is not), and the √ weights are floor-quantized
    to int64 BEFORE summing so the normalizer is an exact integer with no
    float accumulation order to diverge between engines.

    NULL strata are EXCLUDED from both the budget and the output — a
    null-keyed row would otherwise inflate the normalizer while the
    equi-join in :func:`temperature_sample` could never keep it (silent
    under-delivery). Fill or filter null strata upstream.

    Returns ``(strata, c, p_keep)`` — one row per stratum."""
    counts = (
        df.filter(F.col(strata_col).isNotNull())
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    counts = counts.withColumn(
        "wq",
        F.floor(F.sqrt(F.col("c").cast("double")) * 1000000.0).cast("long"),
    )
    tot = counts.agg(F.sum("c").alias("n"), F.sum("wq").alias("W"))
    target = F.floor(F.col("n").cast("double") * F.lit(float(target_frac)))
    p = F.least(
        F.lit(1.0),
        target.cast("double")
        * F.col("wq").cast("double")
        / F.col("W").cast("double")
        / F.col("c").cast("double"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(strata_col, "c", p.alias("p_keep"))
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    unit_col: str,
    target_frac: float = 0.5,
    salt: str = "t0",
) -> DataFrame:
    """α=0.5 temperature sampling: keep each row when md5(salt ∥ unit)
    falls below its stratum's ``p_keep`` (see :func:`temperature_rates`).
    Same hash family as the engine's other samplers → nested-sample
    property (raising the budget only ADDS rows) and identical output on
    any engine/partitioning.  Plan: rates are a tiny broadcast onto a
    pure projection+filter — the data never shuffles."""
    rates = temperature_rates(df, strata_col, target_frac)
    h = hash52(salt, F.col(unit_col))
    thr = F.floor(F.col("p_keep") * _TWO_52).cast("long")
    return (
        df.join(F.broadcast(rates.drop("c")), strata_col)
        .filter(h < thr)
        .drop("p_keep")
    )


def token_budget_mix(
    df: DataFrame,
    strata_col: str,
    budgets: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assemble a training mixture against EXACT per-stratum token
    budgets: within each stratum docs are ranked (longest first, id ties
    ascending — substitute a quality score upstream by adding it as a
    column and re-ranking) and greedily kept while the tokens BEFORE a
    doc are under the stratum's budget, so the first doc crossing the
    line is still included and every budget is met or exceeded by less
    than one document.  Strata without a budget are dropped.  Returns
    ``(id, stratum, n_tokens, cum_tokens)``.

    Unlike rate sampling, the output token count is guaranteed, which is
    what "train on 30B tokens of code, 10B of forum text" actually
    requires.  Plan: one hash exchange on the stratum + a per-stratum
    running sum; budgets broadcast.  At 100 TB a head stratum is one
    window partition — rank on a coarse quality BUCKET first and cumsum
    bucket totals (two bounded aggregates) to cut within the bucket,
    keeping the exact-budget property without a serial stratum scan."""
    from pyspark.sql import Window

    for k, v in budgets.items():
        if v < 0:
            raise ValueError(f"budget for stratum {k!r} must be >= 0, got {v}")
    ntok = F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
    ).cast("long")
    bdf = df.sparkSession.createDataFrame(
        list(budgets.items()), f"{strata_col} string, __budget long"
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.desc("n_tokens"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = df.select(F.col(id_col), F.col(strata_col), ntok.alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return (
        d.join(F.broadcast(bdf), strata_col)
        .select(
            F.col(id_col),
            F.col(strata_col),
            "n_tokens",
            cum.alias("cum_tokens"),
            "__budget",
        )
        .filter(F.col("cum_tokens") - F.col("n_tokens") < F.col("__budget"))
        .drop("__budget")
    )


def group_sample_k(
    df: DataFrame,
    strata_col: str,
    unit_col: str,
    k: int,
    salt: str = "g0",
) -> DataFrame:
    """Deterministic k-per-group sampling (balanced eval-set construction):
    within each stratum keep the k rows whose md5(salt ∥ unit) hashes are
    smallest — a uniform without-replacement sample that is identical on
    every run, engine, and partitioning, and STABLE under corpus growth in
    a precise sense: a row only leaves the sample when a new row with a
    smaller hash enters its stratum (bounded churn, unlike re-rolled
    rand()).

    Plan: one hash exchange on the stratum + per-stratum top-k window over
    (hash, id) — never a global sort; ties impossible while unit ids are
    unique (the hash includes the unit)."""
    from pyspark.sql import Window

    h = hash52(salt, F.col(unit_col))
    w = Window.partitionBy(strata_col).orderBy(
        F.col("__h").asc(), F.col(unit_col).asc()
    )
    return (
        df.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__h", "__rn")
    )


def write_tar_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    path: str,
    content_col: str | None = None,
    mixer=knuth_mix,
) -> None:
    """WebDataset-style export: the deterministic shuffle-to-shards layout
    materialized as ``shard-NNNNN.tar`` archives, one member per row —
    ``<id>.json`` (all non-binary columns) plus ``<id>.bin`` when
    ``content_col`` names a binary column.  Tar is the container
    multimodal trainers stream sequentially (WebDataset et al.): one open
    file per shard, no per-sample filesystem ops at read time.

    Determinism: same shard assignment and in-tar member order as every
    other exporter here (mix(id), id); tar metadata (mtime/uid) is zeroed,
    so exports are byte-identical across runs and cluster sizes.

    Plan: ONE exchange repartitioning on shard + in-task sort, then each
    task streams its shard straight into one tar — rows never collect to
    the driver. Requires a filesystem reachable from executors (local/NFS/
    FUSE mount; on object stores write locally and upload per shard)."""
    import io
    import json as _json
    import os
    import tarfile

    from pyspark.sql import types as T

    os.makedirs(path, exist_ok=True)
    sharded = shuffled_shards(df, id_col, n_shards, mixer)
    # json membership is decided by column TYPE, not per-row value type:
    # a nullable second binary column would otherwise appear as a null
    # json key in some rows and be absent in others — inconsistent
    # per-member schemas across one export
    bin_cols = {
        f.name for f in df.schema.fields if isinstance(f.dataType, T.BinaryType)
    }
    meta_cols = [c for c in df.columns if c != content_col and c not in bin_cols]
    bin_col = content_col

    def write_partition(rows) -> None:
        tars: dict[int, tarfile.TarFile] = {}
        try:
            for row in rows:
                shard = row["shard"]
                tf = tars.get(shard)
                if tf is None:
                    tf = tarfile.open(
                        os.path.join(path, f"shard-{shard:05d}.tar"), "w"
                    )
                    tars[shard] = tf
                rid = row[id_col]
                meta = {c: row[c] for c in meta_cols}
                payload = _json.dumps(meta, sort_keys=True, default=str).encode()
                info = tarfile.TarInfo(name=f"{rid}.json")
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))
                if bin_col is not None and row[bin_col] is not None:
                    blob = bytes(row[bin_col])
                    binfo = tarfile.TarInfo(name=f"{rid}.bin")
                    binfo.size = len(blob)
                    binfo.mtime = 0
                    tf.addfile(binfo, io.BytesIO(blob))
        finally:
            for tf in tars.values():
                tf.close()

    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_pos")
        .foreachPartition(write_partition)
    )


def read_tar_shards(spark, path: str) -> DataFrame:
    """Read WebDataset-style tar shards back as ``(shard, member_name,
    content binary)`` rows: the shard tars load via Spark's binaryFile
    source (one task per tar — matches how trainers consume them) and a
    ``mapInPandas`` unpacks members. Pair ``<id>.json`` / ``<id>.bin``
    members downstream with a self-join on the stem."""
    import io
    import os
    import re
    import tarfile
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("shard", T.LongType(), False),
            T.StructField("member_name", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                m = re.search(r"shard-(\d+)\.tar$", os.path.basename(fpath))
                shard = int(m.group(1)) if m else -1
                names, blobs = [], []
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for member in tf.getmembers():
                        names.append(member.name)
                        fh = tf.extractfile(member)
                        blobs.append(fh.read() if fh else None)
                yield pd.DataFrame(
                    {
                        "shard": [shard] * len(names),
                        "member_name": names,
                        "content": blobs,
                    }
                )

    return (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "shard-*.tar"))
        .select("path", "content")
        .mapInPandas(unpack, schema)
    )
