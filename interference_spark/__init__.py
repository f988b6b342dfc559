"""interference_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of interference-project/interference (reference
read-only at /root/reference), re-designed Spark-first.

Layers
------
* :mod:`.engine` / :mod:`.session` — Engine (SparkSession + catalog +
  warehouse) and the JPA-like Session facade (persist/find/delete/execute).
* :mod:`.dialect` — the reference SQL dialect (SELECT / SELECT STREAM /
  PROCESS, WINDOW BY count-windows, contains-LIKE, bracket IN-lists) parsed
  into an IR and compiled to lazy DataFrame plans for Catalyst.
* :mod:`.dml` — managed parquet store (append/upsert/delete/retention) and
  the PROCESS ... WITHIN runner.
* :mod:`.streaming` — SELECT STREAM via Structured Streaming: StreamQueue
  handle, tumbling key-change and sliding count-window stateful operators.
* :mod:`.pipeline` — large-scale training-data operators beyond the
  reference's surface: dedup (exact/minhash-LSH/simhash/jaccard/embedding),
  similarity search, text analysis, multimodal column plumbing.
"""

from .engine import Engine, build_spark
from .session import Session
from . import errors

__all__ = ["Engine", "Session", "build_spark", "errors"]
__version__ = "0.1.0"
