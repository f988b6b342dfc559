"""PROCESS <table> WITHIN <EventProcessor> [WHERE ...] — batch and stream.

Reference semantics (``sql/SQLSelect.java:163-177``, exec
``sql/FrameJoinTask.java:193-201``, manual PROCESS section): visit every
(filtered) row with ``ep.process(row)`` on all nodes in parallel; delete the
row if ``ep.delete()`` returns true; single table, no joins.

Spark-first execution: the row visits run distributed via ``mapInPandas``
(the processor object ships to executors by pickle); deletions come back as
an id set and are applied with one anti-join rewrite — the moral equivalent
of the reference's cluster-locked delete pass, minus the cluster lock
(single-writer storage contract, see dml/store.py).

The EventProcessor surface (reference ``core/EventProcessor.java:3-6``):

    class MyProcessor:
        def process(self, row: dict) -> bool: ...   # visit; True = processed
        def delete(self) -> bool: ...               # delete processed rows?
"""

from __future__ import annotations

import importlib
from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..dialect.ast import Query
from ..dialect.compiler import _cond_expr
from ..errors import InvalidParameter, UnableToLockTableForProcess
from ..streaming.stream_queue import ProcessResult


def resolve_processor(engine, name: str):
    """Processor lookup: engine registry first (register_processor), then a
    dotted import path ("pkg.mod.Class")."""
    if name in getattr(engine, "processors", {}):
        obj = engine.processors[name]
        return obj() if isinstance(obj, type) else obj
    if "." in name:
        mod, _, cls = name.rpartition(".")
        try:
            return getattr(importlib.import_module(mod), cls)()
        except (ImportError, AttributeError) as e:
            raise InvalidParameter(f"cannot resolve processor {name!r}: {e}")
    raise InvalidParameter(
        f"processor {name!r} not registered; use engine.register_processor"
    )


def _visit(df, ep, id_col: str, id_type: T.DataType):
    """Distributed visit: returns (id, processed, delete) per row. __id
    carries the table's own @Id DataType — string/decimal ids are as legal
    here as in find/persist (a hardcoded LongType broke them in Arrow
    conversion)."""
    out_schema = T.StructType(
        [
            T.StructField("__id", id_type),
            T.StructField("__processed", T.BooleanType()),
            T.StructField("__delete", T.BooleanType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, procs, dels = [], [], []
            for row in pdf.to_dict("records"):
                p = bool(ep.process(row))
                ids.append(row[id_col])
                procs.append(p)
                dels.append(p and bool(ep.delete()))
            yield pd.DataFrame({"__id": ids, "__processed": procs, "__delete": dels})

    return df.mapInPandas(op, out_schema)


def run_process(session, q: Query) -> ProcessResult:
    engine = session.engine
    td = engine.catalog.get(q.tables[0].name)
    ep = resolve_processor(engine, q.within)
    if q.stream:
        return _run_process_stream(session, q, td, ep)
    if td.id_col is None:
        raise InvalidParameter(f"PROCESS requires an @Id column on {td.name}")

    df = engine.read_table(td).alias(q.tables[0].alias)
    if q.where is not None:
        df = df.filter(_cond_expr(q.where))

    visited = _visit(
        df, ep, td.id_col, td.require_schema()[td.id_col].dataType
    ).cache()
    try:
        processed = visited.filter("__processed").count()
        to_delete = visited.filter("__delete").select(
            F.col("__id").alias(td.id_col)
        )
        deleted = to_delete.count()
        if deleted:
            if not td.managed:
                raise UnableToLockTableForProcess(
                    f"table {td.name} is read-only; PROCESS cannot delete"
                )
            from . import store

            store.add_tombstones(engine.spark, td, to_delete)
    finally:
        visited.unpersist()
    return ProcessResult(processed=processed, deleted=deleted, table=td.name)


class ProcessStreamHandle:
    """Continuous PROCESS (reference D12: PROCESS STREAM via the stream
    path). stop() ends it; counters accumulate per micro-batch."""

    def __init__(self, query) -> None:
        self._query = query
        self.processed = 0
        self.deleted = 0

    def process_all_available(self) -> None:
        self._query.processAllAvailable()

    def stop(self) -> None:
        try:
            self._query.stop()
        except Exception:
            pass

    @property
    def is_active(self) -> bool:
        return self._query.isActive


def _run_process_stream(session, q: Query, td, ep) -> ProcessStreamHandle:
    import os
    import uuid

    engine = session.engine
    if not td.managed or td.id_col is None:
        raise InvalidParameter("PROCESS STREAM requires a managed table with @Id")
    schema = td.require_schema()
    alias = q.tables[0].alias
    source = (
        engine.spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(td.path)
    )
    sdf = source.alias(alias)
    if q.where is not None:
        sdf = sdf.filter(_cond_expr(q.where))

    handle = ProcessStreamHandle(None)

    def per_batch(batch_df, epoch_id: int) -> None:
        visited = _visit(
            batch_df, ep, td.id_col, schema[td.id_col].dataType
        ).cache()
        try:
            handle.processed += visited.filter("__processed").count()
            to_delete = visited.filter("__delete").select(
                F.col("__id").alias(td.id_col)
            )
            n = to_delete.count()
            if n:
                from . import store

                # tombstones, not rewrites: a rewrite would surface new part
                # files to this very stream's source and re-ingest the rows
                store.add_tombstones(engine.spark, td, to_delete)
                handle.deleted += n
        finally:
            visited.unpersist()

    checkpoint = os.path.join(engine.warehouse, "_checkpoints", uuid.uuid4().hex)
    handle._query = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(per_batch)
        .start()
    )
    session._streams.append(handle)
    return handle
