"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7.1 M6).

Media are opaque ``binary`` columns + a typed metadata struct. The
Spark-side machinery — schema, partition-preserving mapInPandas, Arrow
batch shapes, UDF signatures — is real and tested; the actual
decode/resize/frame-sample kernels are STUBS (the image/audio libraries
are not in this container): ``decode_media`` raises NotImplementedError
unless ``fake=True``, which substitutes a deterministic md5-derived
decode so the distributed plumbing is exercisable end-to-end.

Scale notes: media bytes never pass through the driver; mapInPandas
streams Arrow batches (bounded by spark.sql.execution.arrow.
maxRecordsPerBatch) so a 100 MB-per-row video column flows through
per-batch memory, not per-partition. Keep media tables partitioned on a
content-group key and store bytes in parquet as binary (or externalize
to object storage and keep URIs — same operator shapes apply).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("source_uri", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)


def media_from_documents(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a synthetic media table from documents (deterministic bytes
    = utf-8 payload), for exercising the binary-column plumbing."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.concat(F.lit("synthetic://doc/"), F.col(id_col)).alias("source_uri"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Native (no-Python) metadata pass: byte length + content hash.

    This is the shape of the cheap pre-filter that runs BEFORE any
    expensive decode at scale (drop empty/oversized/duplicate payloads).
    """
    return df.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("content_sha256"),
    )


def _fake_decode(payload: bytes | None, kind: str) -> dict[str, Any]:
    """Deterministic stand-in decode: dimensions/duration derived from
    the payload's md5 so tests are stable and engine-independent."""
    if payload is None:
        return {"n_bytes": None, "width": None, "height": None, "duration_ms": None, "feature_hash": None}
    h = hashlib.md5(payload).hexdigest()
    v = int(h[:8], 16)
    out: dict[str, Any] = {
        "n_bytes": len(payload),
        "width": None,
        "height": None,
        "duration_ms": None,
        "feature_hash": h,
    }
    if kind == "image":
        out["width"] = 64 + v % 1920
        out["height"] = 64 + (v >> 8) % 1080
    elif kind == "audio":
        out["duration_ms"] = 100 + v % 600000
    else:  # video
        out["width"] = 64 + v % 1920
        out["height"] = 64 + (v >> 8) % 1080
        out["duration_ms"] = 1000 + v % 7200000
    return out


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract media via mapInPandas (Arrow-batched).

    With ``fake=False`` this raises NotImplementedError at execution time:
    the real kernels need PIL/ffmpeg/torchaudio, which are not in this
    container. The distributed plumbing (schema, batching, signature) is
    identical either way — swap ``_fake_decode`` for the real decoder.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in this container); "
                    "pass fake=True for the deterministic stand-in"
                )
            rows = [
                {"media_id": mid, "kind": kind, **_fake_decode(payload, kind)}
                for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Frame-sampling stub for video: one output row per sampled frame.

    Demonstrates the 1→N mapInPandas expansion shape (video → frames)
    with bounded batch memory. Fake mode derives a deterministic frame
    count from the decoded duration.
    """
    frame_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_ts_ms", IntegerType(), False),
            StructField("frame_hash", StringType(), True),
        ]
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; pass fake=True"
                )
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or payload is None:
                    continue
                dur = _fake_decode(payload, kind)["duration_ms"]
                n = min(dur // every_ms, 8)
                h = hashlib.md5(payload).hexdigest()
                for i in range(int(n)):
                    out.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_ts_ms": i * every_ms,
                            "frame_hash": hashlib.md5(f"{h}|{i}".encode()).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in frame_schema.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(frames, schema=frame_schema)
