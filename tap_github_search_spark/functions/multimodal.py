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


def decode_image(payload: bytes, codec: str, fake: bool = False):
    """Real decode needs PIL/libjpeg, absent in this container — STUB
    unless ``fake=True``, which returns a deterministic pseudo-image
    (width, height, flat pixel bytes derived from the payload) so the
    decode→resize→feature pipeline SHAPE is executable and testable.
    The Spark plumbing around it (byte_features below) is real."""
    if fake:
        w = max(1, len(payload) % 16)
        h = max(1, (len(payload) // 16) % 16)
        px = bytes((payload * ((w * h) // max(1, len(payload)) + 1))[: w * h])
        return (w, h, px)
    raise NotImplementedError(
        "image decode requires an image codec library (PIL); "
        "not available in this environment"
    )


def resize_image(img, new_w: int, new_h: int):
    """Nearest-neighbor resize over the deterministic fake image — the
    stand-in for a real thumbnailing step (PIL.Image.resize); shape and
    batch semantics identical to what a codec-backed version would do."""
    w, h, px = img
    out = bytearray()
    for y in range(new_h):
        sy = min(h - 1, (y * h) // new_h)
        for x in range(new_w):
            sx = min(w - 1, (x * w) // new_w)
            out.append(px[sy * w + sx])
    return (new_w, new_h, bytes(out))


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """STUB — video frame sampling requires ffmpeg/pyav."""
    raise NotImplementedError("frame sampling requires a video codec library")


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumb_sha", T.StringType()),
        T.StructField("thumb_checksum", T.LongType()),
    ]
)

#: polynomial checksum constants — shared with textops.rolling_hash so
#: the DuckDB oracle mirrors the fold with list_reduce
_CK_MULT = 131
_CK_MOD = 1_000_000_007


def pixel_checksum(px: bytes) -> int:
    """Order-sensitive polynomial fold over pixel bytes:
    acc = (acc*131 + byte) mod 1e9+7 — the oracle-expressible stand-in
    for a perceptual hash (DuckDB recomputes it with ``list_reduce``
    over byte values)."""
    acc = 0
    for b in px:
        acc = (acc * _CK_MULT + b) % _CK_MOD
    return acc


def thumbnail_features(media: DataFrame, w: int = 4, h: int = 4) -> DataFrame:
    """The decode→resize pipeline over Arrow batches using the
    deterministic fake decoder: proves the full multimodal dataflow
    (binary column → per-batch decode → resize → feature) without any
    codec in the container. Swap ``fake=True`` for a PIL-backed decode
    on a real cluster — nothing else changes. ``thumb_checksum`` is the
    driver-oracle-checkable feature (polynomial over resized pixels);
    ``thumb_sha`` stays for content-addressing."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(
                lambda b: decode_image(bytes(b), "fake", fake=True)
            )
            thumbs = decoded.map(lambda img: resize_image(img, w, h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": decoded.map(lambda i: i[0]).astype("int32"),
                    "src_h": decoded.map(lambda i: i[1]).astype("int32"),
                    "thumb_w": thumbs.map(lambda t: t[0]).astype("int32"),
                    "thumb_h": thumbs.map(lambda t: t[1]).astype("int32"),
                    "thumb_sha": thumbs.map(
                        lambda t: hashlib.sha256(t[2]).hexdigest()
                    ),
                    "thumb_checksum": thumbs.map(
                        lambda t: pixel_checksum(t[2])
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(extract, schema=THUMB_SCHEMA)


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
