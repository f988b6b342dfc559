"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side design is real and tested: schema, Arrow batch shape,
``mapInPandas`` operator signatures, partition sizing. The actual
codec work (image decode, audio resample, frame extraction) is stubbed —
the decode libraries aren't in this container — behind
``decoder="fake"`` (deterministic bytes-derived features, used in tests)
vs ``decoder="real"`` (raises NotImplementedError with the intended
implementation documented).

At 100 TB: binary payloads dominate partition size, so operators here take a
``target_batch_bytes`` hint — ``mapInPandas`` yields multiple small pandas
batches instead of one giant one, keeping Arrow transfer and executor memory
bounded. Repartition by size (``spark.sql.files.maxPartitionBytes``) rather
than row count when reading.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("content", T.BinaryType(), True),    # opaque payload
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("head_hex", T.StringType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ]
)


def with_binary_payload(df: DataFrame, src_col: str, id_col: str) -> DataFrame:
    """Wrap an existing column as an opaque binary payload (testdata has no
    real media; any bytes exercise the same plumbing)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col(src_col).cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("src"), F.lit(src_col)).alias("meta"),
    )


def _fake_decode(payload: bytes | None, frame_bytes: int) -> tuple[int, str, int]:
    if payload is None:
        return 0, "", 0
    n = len(payload)
    head = payload[:8].hex().upper()
    return n, head, n // frame_bytes + 1


def feature_extract(
    df: DataFrame,
    decoder: str = "fake",
    frame_bytes: int = 256,
    target_batch_rows: int = 1024,
) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas.

    ``fake`` decoder: deterministic features derived from the raw bytes
    (length, first-8-bytes hex, synthetic frame count) — lets every piece of
    the distributed plumbing run and be oracle-checked without codecs.
    ``real`` decoder: stub — would use PIL/libsndfile/pyav per batch.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decode requires PIL/soundfile/av (not in this "
            "container); the fake decoder exercises identical Spark plumbing"
        )

    from . import ensure_parallelism

    df = ensure_parallelism(df)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), target_batch_rows):
                chunk = pdf.iloc[start : start + target_batch_rows]
                feats = [
                    _fake_decode(c, frame_bytes) for c in chunk["content"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "byte_len": [f[0] for f in feats],
                        "head_hex": [f[1] for f in feats],
                        "n_frames": [f[2] for f in feats],
                    }
                )

    return df.select("media_id", "content").mapInPandas(op, FEATURE_SCHEMA)
