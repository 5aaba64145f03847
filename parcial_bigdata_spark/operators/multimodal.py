"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

WAV audio decodes FOR REAL via the stdlib ``wave`` module (sample rate,
channels, frames, duration from actual bytes — no dependencies).  The
container has no image/video codecs, so those DECODE steps are stubbed
(deterministic fake behind ``use_fake_decode=True``; the real path raises
NotImplementedError with the library it needs).  Everything around the
decode — schema, Arrow batch shape, mapInPandas plumbing, partitioning —
is real and tested, so swapping in PIL/ffmpeg on a real cluster touches
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
    "width int, height int, channels int, sample_rate int, "
    "n_frames long, duration_ms double"
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


def _decode_wav(content: bytes) -> dict | None:
    """REAL audio decode for RIFF/WAVE payloads via the stdlib ``wave``
    module (zero extra dependencies): channel count, sample rate, frame
    count, and duration from the actual container header.  Returns None
    for payloads that carry the RIFF magic but are not parseable WAV —
    the caller falls through to the fake/raise path."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(content)) as w:
            ch, sr, nf = w.getnchannels(), w.getframerate(), w.getnframes()
    except Exception:
        # broad by contract: wave.open raises wave.Error/EOFError on most
        # corruption but a mangled chunk size escapes as a bare
        # RuntimeError from _Chunk.skip (found by fuzzing) — ANY parse
        # failure must fall through, never kill the batch
        return None
    return {
        "channels": ch,
        "sample_rate": sr,
        "n_frames": nf,
        "duration_ms": round(nf / sr * 1000.0, 3) if sr else 0.0,
    }


def _is_wav(content: bytes | None) -> bool:
    return (
        content is not None
        and len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"WAVE"
    )


def decode_media(df: DataFrame, use_fake_decode: bool = True) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow-batched, partition-
    parallel, constant memory per batch.

    WAV audio decodes FOR REAL (stdlib ``wave`` — sample rate, channel
    count, frame count, duration from the actual bytes) on both the fake
    and real paths.  Other media types need PIL/ffmpeg (absent in this
    container) → NotImplementedError unless the clearly-marked
    deterministic fake is requested; audio fields are null for them."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                wav = _decode_wav(content) if _is_wav(content) else None
                if wav is not None:
                    dims = (0, 0, wav["channels"])
                    audio = (
                        wav["sample_rate"], wav["n_frames"], wav["duration_ms"]
                    )
                elif not use_fake_decode:
                    raise NotImplementedError(
                        "real decode for non-WAV media requires PIL/ffmpeg; "
                        "pass use_fake_decode=True"
                    )
                else:
                    dims = _fake_decode(content)
                    audio = (None, None, None)
                rows.append(
                    (
                        mid,
                        mtype,
                        len(content) if content is not None else 0,
                        hashlib.md5(content).hexdigest()
                        if content is not None
                        else None,
                        *dims,
                        *audio,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "byte_len", "sha",
                    "width", "height", "channels",
                    "sample_rate", "n_frames", "duration_ms",
                ],
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
