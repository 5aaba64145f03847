"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake behind ``use_fake_decode=True``; the real path raises
NotImplementedError with the library it needs).  Everything around the
decode — schema, Arrow batch shape, mapInPandas plumbing, partitioning —
is real and tested, so swapping in PIL/librosa on a real cluster touches
one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

DECODED_SCHEMA = (
    "media_id long, media_type string, byte_len long, sha string, "
    "width int, height int, channels int"
)

# Magic-byte prefixes → container format (hex of first bytes).
_MAGIC = {
    "FFD8FF": "jpeg",
    "89504E47": "png",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi
    "494433": "mp3",
    "000000": "mp4ish",
}


def as_media(df: DataFrame, id_col: str, payload_col: str, source_col: str) -> DataFrame:
    """Lift any table with a binary-able payload into the media schema.
    (Test corpus: documents.text cast to binary stands in for blobs.)"""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("media_type"),
        F.col(source_col).alias("source"),
    )


def sniff_format(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Metadata extraction with pure built-ins (no UDF): byte length,
    md5, magic-byte format sniff — runs at scan speed on any volume."""
    prefix = F.upper(F.hex(F.substring(F.col(content_col), 1, 4)))
    fmt = F.lit("unknown")
    for magic, name in _MAGIC.items():
        fmt = F.when(prefix.startswith(magic), F.lit(name)).otherwise(fmt)
    return df.withColumn("byte_len", F.octet_length(content_col)).withColumn(
        "sha", F.md5(F.col(content_col))
    ).withColumn("format", fmt)


def _fake_decode(content: bytes | None) -> tuple[int, int, int]:
    """Deterministic FAKE decode: derives (width, height, channels) from
    the payload bytes.  Stands in for PIL/ffmpeg in this container."""
    if not content:
        return (0, 0, 0)
    h = sum(content[:64])
    return (64 + h % 193, 64 + (h // 7) % 193, 3)


def decode_media(df: DataFrame, use_fake_decode: bool = True) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow-batched, partition-
    parallel, constant memory per batch.  The real decoder needs PIL /
    soundfile (absent here) → NotImplementedError unless the clearly-
    marked deterministic fake is requested."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not use_fake_decode:
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile; pass use_fake_decode=True"
                )
            dims = pdf["content"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "sha": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "width": dims.map(lambda t: t[0]),
                    "height": dims.map(lambda t: t[1]),
                    "channels": dims.map(lambda t: t[2]),
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, use_fake_decode: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame" of the
    payload (fake: a frame per ``every_n_bytes`` window).  Demonstrates
    the 1→N mapInPandas expansion shape a real video sampler uses."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not use_fake_decode:
                raise NotImplementedError("real frame sampling requires ffmpeg bindings")
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = len(content) if content is not None else 0
                for i in range(0, max(n, 1), every_n_bytes):
                    chunk = content[i : i + every_n_bytes] if content else b""
                    rows.append((mid, i // every_n_bytes, len(chunk)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame_bytes"])

    return df.mapInPandas(batches, schema="media_id long, frame_no int, frame_bytes int")


def media_summary(documents: DataFrame) -> DataFrame:
    """Oracle-checkable metadata query: documents.text as binary payload →
    per-source byte/hash accounting, all built-ins."""
    media = sniff_format(as_media(documents, "doc_id", "text", "source"))
    return (
        media.groupBy("source")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("byte_len").alias("total_bytes"),
            F.countDistinct("sha").alias("distinct_payloads"),
        )
        .orderBy("source")
    )
