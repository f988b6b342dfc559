"""Managed table storage: a directory of parquet part files.

The reference stores rows in fixed-size frames across striped data files
(``core/Frame.java``, ``persistent/DataFile.java``) with frame-level
replication.  None of that is ported — Spark's unit of storage parallelism is
the parquet row-group/file, and durability comes from shared storage.  What
this module keeps is the *operation surface*:

* ``append``           — blind insert (``@NoCheck`` path, reference
                         ``persistent/Table.java:1208,1306``): writes a new
                         part file, never touching existing ones.  This is
                         what makes a managed table double as a *stream*
                         (table-is-a-queue duality, reference README): a
                         Structured-Streaming file source over the table
                         directory sees the snapshot and then every new file.
* ``upsert``           — persist-by-@Id (reference
                         ``persistent/Table.java:1187-1409``): anti-join +
                         union + atomic swap (the Delta-less MERGE).
* ``add_tombstones`` / ``maybe_compact`` — THE delete path (transactional
                         delete / CEP ``purge``, routed via
                         ``session.py`` commit): deletes write id
                         tombstone files (O(deleted ids), never a table
                         rewrite); ``read_managed`` anti-joins them out,
                         and compaction folds them into data files only
                         past a file-count/bytes threshold.
* ``apply_threshold``  — ``@Threshold(n)`` ring-buffer retention
                         (``core/Threshold.java``): keep the newest n rows
                         by id.

Concurrency note: single-writer per table (the reference serializes writers
with frame/table locks — ``persistent/Table.java:2403-2437``; we document the
same requirement instead of porting locks). Readers are safe against
appends; upsert swaps are atomic at the file level (write-new-then-delete-
old), so a concurrent reader sees at worst a consistent-older set plus new
files — on a real deployment, swap-based ops would go through Delta/Iceberg
instead.
"""

from __future__ import annotations

import glob
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from ..catalog import TableDef
from ..errors import InvalidParameter


def _parts(td: TableDef) -> list[str]:
    return sorted(glob.glob(os.path.join(td.path, "*.parquet")))


def _tombstone_dir(td: TableDef) -> str:
    # underscore prefix → invisible to Spark's FileIndex, so batch reads and
    # file-stream sources over the table dir never see it
    return os.path.join(td.path, "_tombstones")


def _tombstone_parts(td: TableDef) -> list[str]:
    return sorted(glob.glob(os.path.join(_tombstone_dir(td), "*.parquet")))


def init_table_dir(td: TableDef) -> None:
    os.makedirs(td.path, exist_ok=True)


def read_managed(spark: SparkSession, td: TableDef) -> DataFrame:
    """Current table contents = part files minus tombstoned ids.

    Tombstones are the poor-man's deletion vectors (Delta-style): PROCESS
    and streaming deletes append id files under ``_tombstones/`` instead of
    rewriting parts — crucial for PROCESS STREAM, whose own file source
    would otherwise re-ingest rewritten part files as new data."""
    schema = td.require_schema()
    files = _parts(td)
    if not files:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(*files)
    tombs = _tombstone_parts(td)
    if tombs and td.id_col:
        dead = spark.read.parquet(*tombs).select(td.id_col).distinct()
        df = df.join(dead, td.id_col, "left_anti")
    return df


def add_tombstones(spark: SparkSession, td: TableDef, ids_df: DataFrame) -> None:
    """Logical delete: append an id file; readers anti-join it."""
    if td.id_col is None:
        raise InvalidParameter(f"table {td.name} has no @Id column")
    os.makedirs(_tombstone_dir(td), exist_ok=True)
    tmp = td.path + f".tmp-{uuid.uuid4().hex}"
    ids_df.select(td.id_col).write.mode("overwrite").parquet(tmp)
    for f in glob.glob(os.path.join(tmp, "*.parquet")):
        os.rename(
            f, os.path.join(_tombstone_dir(td), f"ts-{uuid.uuid4().hex}.parquet")
        )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def add_tombstone_ids(td: TableDef, ids: list) -> None:
    """Driver-side tombstone append for small id batches (the commit-time
    delete path): one pyarrow file write, no Spark job — mirrors
    ``append_rows``. At 100 TB a 10-row delete costs one ~1 KB file, never
    a table rewrite; readers anti-join, ``maybe_compact`` amortizes."""
    if td.id_col is None:
        raise InvalidParameter(f"table {td.name} has no @Id column")
    if not ids:
        return
    id_field = next(f for f in td.require_schema().fields if f.name == td.id_col)
    table = pa.Table.from_pydict(
        {td.id_col: list(ids)},
        schema=pa.schema([pa.field(td.id_col, _to_arrow(id_field.dataType))]),
    )
    os.makedirs(_tombstone_dir(td), exist_ok=True)
    path = os.path.join(_tombstone_dir(td), f"ts-{uuid.uuid4().hex}.parquet")
    tmp = os.path.join(_tombstone_dir(td), "." + os.path.basename(path) + ".tmp")
    pq.write_table(table, tmp, compression="zstd")
    os.rename(tmp, path)


# compaction triggers: tombstones are pure win until the anti-join's build
# side stops being trivially broadcastable or the file listing gets long.
# The byte-fraction trigger has an absolute floor: a lone ~1 KB id file on a
# small table must not force a rewrite (that would re-create the very
# full-table-rewrite path tombstones exist to avoid).
MAX_TOMBSTONE_FILES = 32
MAX_TOMBSTONE_FRACTION = 0.05
MIN_TOMBSTONE_BYTES = 16 << 20


def maybe_compact(spark: SparkSession, td: TableDef) -> bool:
    """Apply tombstones physically once they exceed thresholds (count of
    tombstone files, or tombstone bytes vs table bytes). Returns True if a
    compaction ran. Cheap when it doesn't fire: two directory stats."""
    tombs = _tombstone_parts(td)
    if not tombs:
        return False
    t_bytes = sum(os.path.getsize(f) for f in tombs)
    if len(tombs) >= MAX_TOMBSTONE_FILES or (
        t_bytes > MIN_TOMBSTONE_BYTES
        and t_bytes > _table_bytes(td) * MAX_TOMBSTONE_FRACTION
    ):
        compact(spark, td)
        return True
    return False


def compact(spark: SparkSession, td: TableDef) -> None:
    """Physically apply tombstones and merge small part files."""
    if not _tombstone_parts(td):
        return
    overwrite(td, read_managed(spark, td).coalesce(_target_parts(td)))


def _new_part(td: TableDef) -> str:
    return os.path.join(td.path, f"part-{uuid.uuid4().hex}.parquet")


def _arrow_table(td: TableDef, rows: list[dict]) -> pa.Table:
    schema = td.require_schema()
    arrow_schema = pa.schema(
        [pa.field(f.name, _to_arrow(f.dataType), f.nullable) for f in schema.fields]
    )
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema.fields}
    return pa.Table.from_pydict(cols, schema=arrow_schema)


def stage_rows(spark: SparkSession, td: TableDef, rows: list[dict]) -> tuple[DataFrame, str]:
    """Driver-side parquet staging of a small row batch, returned as a
    parquet-backed DataFrame plus the staging path (caller removes it after
    its jobs finish). This replaces ``spark.createDataFrame(rows)`` on the
    MERGE path: a parallelize-based DataFrame drags a Python-runner stage
    into the merge plan, which under the output-sizing ``coalesce`` runs
    single-worker-serialized (measured: 4.5 s vs 0.9 s for the same 10k-row
    upsert). A parquet scan keeps the whole merge JVM-side."""
    path = td.path + f".stage-{uuid.uuid4().hex}.parquet"
    pq.write_table(_arrow_table(td, rows), path, compression="zstd")
    return spark.read.schema(td.require_schema()).parquet(path), path


def append_rows(td: TableDef, rows: list[dict]) -> str:
    """Driver-side small-batch append (the ``persist`` hot path).  Uses
    pyarrow directly — a Spark job per 1-row insert would be absurd; this is
    what lets the ingest bench match the reference's ~100k obj/s figure."""
    if not rows:
        return ""
    table = _arrow_table(td, rows)
    path = _new_part(td)
    # write-then-rename: a crash mid-write must never leave a torn parquet
    # at a live part path (one torn file breaks every later scan). The tmp
    # name is dot-prefixed so Spark's FileIndex ignores a crash leftover
    # too; rename within one fs is atomic.
    tmp = os.path.join(td.path, "." + os.path.basename(path) + ".tmp")
    pq.write_table(table, tmp, compression="zstd")
    os.rename(tmp, path)
    return path


def append_df(td: TableDef, df: DataFrame) -> None:
    """Distributed append: executors write to a tmp dir, then the files move
    into the table dir (rename within one filesystem = atomic-enough)."""
    tmp = td.path + f".tmp-{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(tmp)
    for f in glob.glob(os.path.join(tmp, "*.parquet")):
        os.rename(f, _new_part(td))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def overwrite(td: TableDef, df: DataFrame) -> None:
    """Replace table contents: write new parts, then remove old parts and
    any tombstones (content is physical again)."""
    old = _parts(td)
    tmp = td.path + f".tmp-{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(tmp)
    for f in glob.glob(os.path.join(tmp, "*.parquet")):
        os.rename(f, _new_part(td))
    # snapshot-pinned files archive instead of vanishing (time travel)
    _retire_files(td, old)
    _retire_files(td, _tombstone_parts(td))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def vacuum(td: TableDef) -> int:
    """Remove crash debris from the table dir: orphaned ``.tmp-*`` write
    directories and dot-prefixed ``.part-*.tmp`` files left by a writer
    that died between write and rename.  Safe while readers run — Spark's
    FileIndex never lists either pattern (tmp dirs live NEXT to the table
    dir; dot-files are hidden), and a LIVE writer's tmp is never older
    than the write itself, so only call vacuum when no writer is active
    (same single-writer rule as every mutation here).  Returns the number
    of artifacts removed."""
    import shutil

    n = 0
    for d in glob.glob(td.path + ".tmp-*"):
        shutil.rmtree(d, ignore_errors=True)
        n += 1
    for f in glob.glob(td.path + ".stage-*.parquet"):
        os.remove(f)
        n += 1
    # advisory locks (Session.lock) left by a crashed writer — safe under
    # the same no-active-writer rule as the rest of vacuum
    for f in glob.glob(os.path.join(td.path + ".locks", "*.lock")):
        os.remove(f)
        n += 1
    for pat in (
        ".*.tmp",
        os.path.join("_tombstones", ".*.tmp"),
        os.path.join("_snapshots", ".*.tmp"),
    ):
        for f in glob.glob(os.path.join(td.path, pat)):
            os.remove(f)
            n += 1
    return n


def cluster_table(
    spark: SparkSession,
    td: TableDef,
    cluster_by: tuple[str, ...],
    n_parts: int | None = None,
) -> None:
    """OPTIMIZE … CLUSTER BY: rewrite the table's parts range-partitioned
    and sorted on ``cluster_by``, so each part's parquet min/max statistics
    become tight and pairwise disjoint — point and range predicates on the
    cluster key then skip whole files/row-groups at scan time instead of
    reading the table (the single-dimension form of Delta's OPTIMIZE
    ZORDER).  Applies tombstones as a side effect (content is physical
    after the rewrite).  Cost: one distributed range-shuffle + sort over
    the table — an offline maintenance op; at 100 TB run it per partition
    directory (e.g. per day of a time-partitioned table), never the whole
    table at once."""
    df = read_managed(spark, td)
    cols = list(cluster_by)
    if n_parts is None:
        n_parts = max(1, len(_parts(td)))
    out = df.repartitionByRange(n_parts, *cols).sortWithinPartitions(*cols)
    overwrite(td, out)


# below this table size a one-pass full-rewrite MERGE beats the targeted
# plan's three jobs (locate, rewrite-affected, append); above it, rewriting
# the whole table per upsert is the thing that cannot scale
FULL_REWRITE_MAX_BYTES = 512 << 20


def _table_bytes(td: TableDef) -> int:
    return sum(os.path.getsize(f) for f in _parts(td))


# rewrite paths size their output to ~128 MB parts: without this, every
# full-rewrite MERGE/compact inherits the plan's task count (32+ on
# local[32]) and the table's file count GROWS per upsert — the second
# commit reads 42 tiny parts, the tenth reads hundreds (measured: commit
# latency 1.5 s → 4.2 s between two identical upserts purely from file
# growth). coalesce (no shuffle) keeps compute parallel at scale: a 10 GB
# table still rewrites through 80 tasks, a 1 MB one through 1.
TARGET_PART_BYTES = 128 << 20


def _target_parts(td: TableDef, extra_bytes: int = 0) -> int:
    return max(1, -(-(_table_bytes(td) + extra_bytes) // TARGET_PART_BYTES))


def upsert(
    spark: SparkSession,
    td: TableDef,
    new_df: DataFrame,
    full_rewrite_max_bytes: int = FULL_REWRITE_MAX_BYTES,
) -> None:
    """MERGE-by-id: update matching ids, insert the rest
    (reference persist(): ``persistent/Session.java:436-457``).

    Small tables: one-pass full-rewrite merge. Large tables: targeted-
    rewrite merge (the Delta MERGE file-pruning pattern) — an id-column
    scan locates the part files that actually contain matched ids; ONLY
    those parts are rewritten (minus matched rows) and the new rows land
    as a fresh part. Write amplification is O(affected parts + new), not
    O(table) — with id-clustered inserts (ring tables, incremental ids) an
    upsert touches one or two parts of a 100 TB table.
    """
    if td.id_col is None:
        raise InvalidParameter(f"table {td.name} has no @Id column; use append")
    cols = [f.name for f in td.require_schema().fields]
    files = _parts(td)
    if not files:
        append_df(td, new_df.select(*cols))
        return
    # scoped AQE conf (r12): every shuffle inside a MERGE is BATCH-sized
    # by construction (new-id distinct, affected-part distinct) while the
    # heavy bytes move through coalesce+write, so size-derived partition
    # coalescing is safe at any scale and removes the 32-task floor each
    # of the merge's small stages pays per commit (same rationale as
    # pipeline.iterative_stage_conf; measured 2.66 -> 1.47 s on the
    # 10k-upsert bench with these settings session-wide).
    from ..pipeline import set_iterative_stage_conf, restore_stage_conf

    _conf = set_iterative_stage_conf(spark)
    try:
        _upsert_body(spark, td, new_df, cols, files, full_rewrite_max_bytes)
    finally:
        restore_stage_conf(spark, _conf)


def _upsert_body(
    spark: SparkSession,
    td: TableDef,
    new_df: DataFrame,
    cols: list[str],
    files: list[str],
    full_rewrite_max_bytes: int,
) -> None:
    if _tombstone_parts(td):
        # tombstoned ids may be re-inserted by this upsert; make content
        # physical first so the old tombstones can't hide the new rows
        compact(spark, td)
        files = _parts(td)
    from pyspark.sql import functions as F

    new_ids = new_df.select(td.id_col).distinct()
    schema = td.require_schema()
    if len(files) <= 2 or _table_bytes(td) <= full_rewrite_max_bytes:
        # locating affected parts can't save enough — one-pass merge
        cur = read_managed(spark, td)
        merged = cur.join(
            F.broadcast(new_ids), td.id_col, "left_anti"
        ).unionByName(new_df.select(*cols))
        overwrite(td, merged.coalesce(_target_parts(td)))
        return
    located = (
        spark.read.schema(schema)
        .parquet(*files)
        .select(F.col(td.id_col), F.input_file_name().alias("__f"))
        .join(F.broadcast(new_ids), td.id_col)
        .select("__f")
        .distinct()
    )
    # input_file_name() returns a URI (percent-encoded, file:// scheme) —
    # comparing it against raw filesystem paths silently matches NOTHING
    # for warehouses containing spaces/unicode, which would keep the old
    # rows AND append the new ones (duplicate @Ids). Part names are
    # uuid-unique within the table, so compare decoded basenames.
    from urllib.parse import unquote, urlparse

    located_names = {
        os.path.basename(unquote(urlparse(r["__f"]).path))
        for r in located.collect()
    }
    affected = {f for f in files if os.path.basename(f) in located_names}
    if affected:
        n_out = max(1, -(-sum(os.path.getsize(f) for f in affected) // TARGET_PART_BYTES))
        survivors = (
            spark.read.schema(schema)
            .parquet(*sorted(affected))
            .join(F.broadcast(new_ids), td.id_col, "left_anti")
            .coalesce(n_out)
        )
        tmp = td.path + f".tmp-{uuid.uuid4().hex}"
        survivors.write.mode("overwrite").parquet(tmp)
        for f in glob.glob(os.path.join(tmp, "*.parquet")):
            os.rename(f, _new_part(td))
        # snapshot-pinned files archive instead of vanishing (time travel)
        _retire_files(td, sorted(affected))
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    append_df(td, new_df.select(*cols))


def apply_threshold(spark: SparkSession, td: TableDef) -> None:
    """@Threshold(n): drop oldest rows past n, ordered by the id column
    (ids are monotonically increasing in the reference's ring tables)."""
    if not td.threshold or td.id_col is None:
        return
    cur = read_managed(spark, td)
    if cur.count() <= td.threshold:
        return
    from pyspark.sql import functions as F

    cutoff = (
        cur.select(td.id_col)
        .orderBy(F.desc(td.id_col))
        .limit(td.threshold)
        .agg(F.min(td.id_col).alias("m"))
        .first()["m"]
    )
    overwrite(td, cur.filter(F.col(td.id_col) >= cutoff))


def _to_arrow(dt) -> pa.DataType:
    from pyspark.sql import types as T

    if isinstance(dt, T.ByteType):
        return pa.int8()
    if isinstance(dt, T.ShortType):
        return pa.int16()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.BinaryType):
        return pa.binary()
    if isinstance(dt, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(dt, T.DateType):
        return pa.date32()
    if isinstance(dt, T.ArrayType):
        return pa.list_(_to_arrow(dt.elementType))
    if isinstance(dt, T.MapType):
        return pa.map_(_to_arrow(dt.keyType), _to_arrow(dt.valueType))
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    raise InvalidParameter(f"unsupported type for managed store: {dt}")


def table_manifest(spark: SparkSession, td: TableDef) -> DataFrame:
    """Data-release manifest: one row per live part file — ``(file, n_rows,
    n_bytes, digest)`` with an md5 content digest. The digest work is
    distributed (binaryFile source: each executor hashes its files);
    row counts come from parquet footers read driver-side (metadata-only,
    ~KB per file). Publishing this next to an exported dataset makes a
    release byte-verifiable: a consumer re-lists, re-hashes, and diffs.

    At 100 TB: hashing is embarrassingly parallel and IO-bound; run it once
    per immutable part at write/compact time and store incrementally
    rather than re-hashing the table per release."""
    from pyspark.sql import functions as F

    files = _parts(td)
    if not files:
        return spark.createDataFrame(
            [], "file string, n_rows long, n_bytes long, digest string"
        )
    rows = {
        os.path.basename(f): pq.ParquetFile(f).metadata.num_rows for f in files
    }
    rows_df = spark.createDataFrame(
        list(rows.items()), "file string, n_rows long"
    )
    digests = (
        spark.read.format("binaryFile")
        .load(os.path.join(td.path, "part-*.parquet"))
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file"),
            F.length(F.col("content")).cast("long").alias("n_bytes"),
            F.md5(F.col("content")).alias("digest"),
        )
    )
    return digests.join(F.broadcast(rows_df), "file").select(
        "file", "n_rows", "n_bytes", "digest"
    )


def _zorder_key(cols: list[tuple[str, float, float]], bits: int = 16):
    """Interleaved-bit z-order key: each column range-bucketed to ``bits``
    bits over its [lo, hi) domain, buckets bit-interleaved so files sorted
    by the key are tight in EVERY dimension at once."""
    from pyspark.sql import functions as F

    n = len(cols)
    buckets = []
    for name, lo, hi in cols:
        w = (hi - lo) / float(1 << bits)
        b = F.floor((F.col(name).cast("double") - F.lit(lo)) / F.lit(w)).cast("long")
        buckets.append(F.least(F.lit((1 << bits) - 1), F.greatest(F.lit(0), b)))
    key = F.lit(0).cast("long")
    for i in range(bits):
        for c, b in enumerate(buckets):
            key = key + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + c
            )
    return key


def cluster_table_zorder(
    spark: SparkSession,
    td: TableDef,
    cluster_by: tuple[str, ...],
    n_parts: int | None = None,
    bits: int = 16,
) -> None:
    """OPTIMIZE … ZORDER BY: multi-dimensional clustering. Single-column
    CLUSTER BY gives disjoint per-file stats on ONE column — predicates on
    any other column still read every file. Z-ordering interleaves the
    bucket bits of every cluster column, so each rewritten file covers a
    small hyper-rectangle: parquet min/max stats become tight in ALL
    cluster dimensions and point/range predicates on ANY of them skip
    files (the Delta OPTIMIZE ZORDER idea on plain parquet).

    Domain bounds come from one cheap min/max pass (offline maintenance
    op, like `cluster_table`); cost is the same single range-shuffle +
    sort. At 100 TB run per partition directory."""
    from pyspark.sql import functions as F

    n_dims = len(cluster_by)
    # the interleaved key must fit a signed long: bit position
    # (bits-1)*n + (n-1) ≤ 62 — cap bits rather than let shiftleft(·,63)
    # wrap into the sign bit and garble the sort order
    bits = min(bits, 63 // max(1, n_dims))
    df = read_managed(spark, td)
    aggs = []
    for c in cluster_by:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    r = df.agg(*aggs).first()
    cols = []
    for c in cluster_by:
        lo, hi = r[f"__lo_{c}"], r[f"__hi_{c}"]
        hi = hi + 1.0 if hi is not None else 1.0  # half-open upper bound
        cols.append((c, float(lo or 0.0), float(hi)))
    key = _zorder_key(cols, bits)
    if n_parts is None:
        n_parts = max(1, len(_parts(td)))
    out = df.withColumn("__zk", key).repartitionByRange(
        n_parts, "__zk"
    ).sortWithinPartitions("__zk").drop("__zk")
    overwrite(td, out)


# ------------------------------------------------------------ snapshots
#
# Time travel for managed tables, Delta/Iceberg-style but file-based:
# a snapshot is a JSON manifest pinning the CURRENT set of part files and
# tombstone files.  Mutations that would delete a pinned file move it to
# `_archive/` instead (underscore prefix → invisible to Spark's FileIndex,
# so live readers and the table-as-stream file source never see it);
# `read_snapshot` resolves each pinned basename against the live dir first,
# then the archive.  Dropping a snapshot releases its pins; files no longer
# pinned by ANY snapshot are removed at drop time.  Appends never invalidate
# snapshots (old manifests simply don't list the new files) — only rewrite
# ops (upsert's targeted rewrite, compact, overwrite, clustering) archive.


def _snapshot_dir(td: TableDef) -> str:
    return os.path.join(td.path, "_snapshots")


def _archive_dir(td: TableDef) -> str:
    return os.path.join(td.path, "_archive")


def _snapshot_files(td: TableDef) -> list[str]:
    return sorted(glob.glob(os.path.join(_snapshot_dir(td), "snap-*.json")))


def create_snapshot(td: TableDef) -> int:
    """Record the current table state; returns the snapshot id. O(1) data
    cost — the manifest holds file NAMES, never data.

    Ids are MONOTONIC via a persisted SEQ counter, never recycled: deriving
    the next id from surviving manifests alone would re-issue an id after
    its snapshot was dropped, silently resolving a stale consumer-held id
    to a DIFFERENT table state instead of raising SnapshotUnavailable."""
    import json

    os.makedirs(_snapshot_dir(td), exist_ok=True)
    seq_path = os.path.join(_snapshot_dir(td), "SEQ")
    last = 0
    if os.path.exists(seq_path):
        with open(seq_path) as fh:
            last = int(fh.read().strip() or 0)
    existing = [
        int(os.path.basename(p)[5:-5]) for p in _snapshot_files(td)
    ]
    sid = max([last] + existing) + 1
    # dot-prefixed .tmp so a crash leftover matches vacuum's debris glob
    seq_tmp = os.path.join(
        _snapshot_dir(td), f".SEQ-{uuid.uuid4().hex}.tmp"
    )
    with open(seq_tmp, "w") as fh:
        fh.write(str(sid))
    os.rename(seq_tmp, seq_path)
    meta = {
        "id": sid,
        "parts": [os.path.basename(p) for p in _parts(td)],
        "tombstones": [os.path.basename(p) for p in _tombstone_parts(td)],
    }
    path = os.path.join(_snapshot_dir(td), f"snap-{sid:09d}.json")
    tmp = os.path.join(_snapshot_dir(td), f".snap-{sid:09d}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.rename(tmp, path)
    return sid


def list_snapshots(td: TableDef) -> list[dict]:
    import json

    out = []
    for p in _snapshot_files(td):
        with open(p) as fh:
            out.append(json.load(fh))
    return out


def _pinned_basenames(td: TableDef) -> set[str]:
    pinned: set[str] = set()
    for meta in list_snapshots(td):
        pinned.update(meta["parts"])
        pinned.update(meta["tombstones"])
    return pinned


def _retire_files(td: TableDef, files: list[str]) -> None:
    """Delete files a mutation replaced — unless a snapshot pins them, in
    which case they move to the archive (rename within one fs = atomic)."""
    pinned = _pinned_basenames(td)
    archived = False
    for f in files:
        if os.path.basename(f) in pinned:
            os.makedirs(_archive_dir(td), exist_ok=True)
            os.rename(f, os.path.join(_archive_dir(td), os.path.basename(f)))
            archived = True
        else:
            os.remove(f)
    if archived:
        pass  # archive is append-only here; drop_snapshot reclaims


def drop_snapshot(td: TableDef, snap_id: int) -> None:
    """Release a snapshot's pins and reclaim archive files nothing pins."""
    from ..errors import SnapshotUnavailable

    path = os.path.join(_snapshot_dir(td), f"snap-{snap_id:09d}.json")
    if not os.path.exists(path):
        raise SnapshotUnavailable(f"snapshot {snap_id} of {td.name} not found")
    os.remove(path)
    still = _pinned_basenames(td)
    for f in glob.glob(os.path.join(_archive_dir(td), "*.parquet")):
        if os.path.basename(f) not in still:
            os.remove(f)


def read_snapshot(spark: SparkSession, td: TableDef, snap_id: int) -> DataFrame:
    """The table AS OF a snapshot: pinned parts minus pinned tombstones.
    Reads with the current registered schema, so columns added after the
    snapshot surface as nulls (same contract as reading old part files
    after ALTER TABLE ADD COLUMN)."""
    import json

    from ..errors import SnapshotUnavailable

    path = os.path.join(_snapshot_dir(td), f"snap-{snap_id:09d}.json")
    if not os.path.exists(path):
        raise SnapshotUnavailable(f"snapshot {snap_id} of {td.name} not found")
    with open(path) as fh:
        meta = json.load(fh)

    def resolve(basename: str, sub: str | None) -> str:
        live = (
            os.path.join(td.path, sub, basename)
            if sub
            else os.path.join(td.path, basename)
        )
        if os.path.exists(live):
            return live
        arch = os.path.join(_archive_dir(td), basename)
        if os.path.exists(arch):
            return arch
        raise SnapshotUnavailable(
            f"snapshot {snap_id} of {td.name} expired: {basename} is gone"
        )

    schema = td.require_schema()
    parts = [resolve(b, None) for b in meta["parts"]]
    if not parts:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(*parts)
    tombs = [resolve(b, "_tombstones") for b in meta["tombstones"]]
    if tombs and td.id_col:
        dead = spark.read.parquet(*tombs).select(td.id_col).distinct()
        df = df.join(dead, td.id_col, "left_anti")
    return df


def snapshot_changes(
    spark: SparkSession, td: TableDef, from_id: int, to_id: int
) -> DataFrame:
    """Row-level change feed between two snapshots (CDC without a log):
    full-outer join on @Id of the two AS-OF states; each output row is one
    ``insert`` (only in the later state), ``delete`` (only in the
    earlier), or ``update`` (non-id columns differ — struct equality is
    null-safe), with the old and new row structs alongside.

    Scale shape: one hash exchange per side on the id; unchanged rows
    (the overwhelming majority) are dropped by the struct-equality filter
    before anything leaves the join. No manifests are diffed — file-level
    diffs misclassify compaction/upsert survivor rewrites as churn."""
    from pyspark.sql import functions as F

    from ..errors import InvalidParameter

    if td.id_col is None:
        raise InvalidParameter(f"table {td.name} has no @Id column")
    a = read_snapshot(spark, td, from_id)
    b = read_snapshot(spark, td, to_id)
    others = [c for c in a.columns if c != td.id_col]
    a2 = a.select(td.id_col, F.struct(*others).alias("old_row"))
    b2 = b.select(td.id_col, F.struct(*others).alias("new_row"))
    j = a2.join(b2, td.id_col, "full_outer")
    op = (
        F.when(F.col("old_row").isNull(), F.lit("insert"))
        .when(F.col("new_row").isNull(), F.lit("delete"))
        .when(~F.col("old_row").eqNullSafe(F.col("new_row")), F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(td.id_col, "op", "old_row", "new_row")
    )
