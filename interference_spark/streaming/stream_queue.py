"""StreamQueue: the consumer handle for SELECT STREAM results.

Counterpart of the reference's ``sql/StreamQueue.java`` (bounded queue with
``poll()`` and ``stop()``, capacity 10000).  Backed by a Structured
Streaming query writing via ``foreachBatch`` into a thread-safe driver-side
queue; each micro-batch is ordered by the table's @Id column before
enqueueing — the reference's own ordering assumption (its streams are fed in
frame order keyed by monotonically increasing ids; manual "Tumbling
windows": grouping order is based on the @Id value).

Divergence (SURVEY §7.4.4): the reference streams *uncommitted* inserts
(dirty reads); we stream committed appends only — each committed append is a
new parquet part file picked up by the file source.
"""

from __future__ import annotations

import queue
import threading
from typing import Any

from pyspark.sql import DataFrame, Row

CAPACITY = 10_000  # reference sql/StreamQueue.java:44


class StreamQueue:
    def __init__(
        self,
        df: DataFrame,
        order_col: str | None,
        query_name: str,
        checkpoint_dir: str | None = None,
        drop_order: bool = False,
    ) -> None:
        self._q: queue.Queue[Row] = queue.Queue(maxsize=CAPACITY)
        self._stopped = threading.Event()
        # when the @Id was re-attached under a hidden name purely for
        # ordering, it is dropped before rows reach the consumer
        self.columns = [
            c for c in df.columns if not (drop_order and c == order_col)
        ]

        def feed(batch_df: DataFrame, epoch_id: int) -> None:
            if drop_order:
                # runner.py guarantees the hidden order column is present;
                # a silent skip here would let it leak to consumers
                assert order_col and order_col in batch_df.columns, (
                    f"hidden order column {order_col!r} missing from "
                    f"micro-batch columns {batch_df.columns}"
                )
            ordered = (
                batch_df.orderBy(order_col)
                if order_col and order_col in batch_df.columns
                else batch_df
            )
            if drop_order:
                ordered = ordered.drop(order_col)
            rows = ordered.collect()
            for r in rows:
                # bounded put that stays interruptible: a plain blocking
                # put() deadlocks once a batch exceeds CAPACITY and the
                # consumer is itself blocked in processAllAvailable()
                # (drain_available), and makes stop() unable to unblock the
                # micro-batch thread. Backpressure semantics unchanged —
                # the producer still waits for queue space.
                while not self._stopped.is_set():
                    try:
                        self._q.put(r, timeout=0.25)
                        break
                    except queue.Full:
                        continue
                if self._stopped.is_set():
                    return

        writer = (
            df.writeStream.outputMode("append")
            .queryName(query_name)
            .foreachBatch(feed)
        )
        if checkpoint_dir:
            # per-session checkpoint = the reference's per-session stream
            # resume position (Session.streamFramePtr,
            # persistent/Session.java:694-700)
            writer = writer.option("checkpointLocation", checkpoint_dir)
        self._query = writer.start()

    # ------------------------------------------------------------- consumer
    def poll(self, timeout: float | None = 0.5) -> Row | None:
        """Next row or None (reference StreamQueue.poll)."""
        try:
            return self._q.get(timeout=timeout)
        except queue.Empty:
            return None

    def drain_available(self) -> list[Row]:
        """Process everything currently in the source, then drain the queue
        (synchronous snapshot semantics for tests/batch analyses).

        Drains CONCURRENTLY with processing: ``processAllAvailable`` blocks
        until the micro-batch completes, but a batch larger than CAPACITY
        can only complete if someone is consuming — so the wait runs in a
        helper thread while this thread drains."""
        waiter = threading.Thread(
            target=self._query.processAllAvailable, daemon=True
        )
        waiter.start()
        out: list[Row] = []
        while waiter.is_alive() or not self._q.empty():
            try:
                out.append(self._q.get(timeout=0.1))
            except queue.Empty:
                pass
        waiter.join()
        return out

    def stop(self) -> None:
        """Terminate the continuous query (reference StreamQueue.stop)."""
        self._stopped.set()
        try:
            self._query.stop()
        except Exception:
            pass

    @property
    def is_active(self) -> bool:
        return self._query.isActive


class ProcessResult:
    """Outcome of PROCESS ... WITHIN (batch): counts + surviving table."""

    def __init__(self, processed: int, deleted: int, table: str) -> None:
        self.processed = processed
        self.deleted = deleted
        self.table = table

    def __repr__(self) -> str:  # pragma: no cover
        return f"ProcessResult(processed={self.processed}, deleted={self.deleted}, table={self.table!r})"
