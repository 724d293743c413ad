"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``NotImplementedError`` unless the deterministic
fake is requested); everything Spark-side — schema, partitioning, UDF
signature, Arrow batch shape — is real and oracle-tested via the
byte-level features (length / sha256), which don't need a codec.

Scale notes: ``mapInPandas`` streams Arrow batches executor→Python
worker; feature extraction is embarrassingly parallel (narrow, no
shuffle). For 100 TB of media, partition input by file-size-balanced
splits (``spark.sql.files.maxPartitionBytes``) and keep per-batch
memory bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the typed metadata struct carried next to every payload
MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # image|audio|video|text
        T.StructField("codec", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),      # image/video only
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio only
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)


def to_media_table(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table: payload = UTF-8 bytes
    of text (the deterministic stand-in for real image/audio blobs),
    meta = typed struct. This is the ingest shape a real pipeline would
    read from parquet with a binary column."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("utf-8").alias("codec"),
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, codec: str) -> object:
    """STUB — real decode needs PIL/libjpeg, absent in this container.
    The Spark plumbing around it (byte_features below) is real."""
    raise NotImplementedError(
        "image decode requires an image codec library (PIL); "
        "not available in this environment"
    )


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """STUB — video frame sampling requires ffmpeg/pyav."""
    raise NotImplementedError("frame sampling requires a video codec library")


def byte_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads:
    (doc_id, n_bytes, sha256-hex). The pattern generalizes: swap the
    body for decode+resize+embed once codecs exist."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)
