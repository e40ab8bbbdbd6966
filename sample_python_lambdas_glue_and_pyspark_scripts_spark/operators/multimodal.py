"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7.1 M6).

Media are opaque ``binary`` columns + a typed metadata struct. The
Spark-side machinery — schema, partition-preserving mapInPandas, Arrow
batch shapes, UDF signatures — is real and tested. Decode has two tiers:

- **Real header metadata (stdlib only)**: JPEG SOF / PNG IHDR / GIF /
  BMP width×height, WAV duration, and MP4 (ISO-BMFF) duration +
  presentation dimensions are parsed with ``struct`` —
  ``decode_media(fake=False)`` runs these for every kind.
  Pixel/sample decode needs PIL/ffmpeg (not in this container) and
  remains the one gated stub: ``sample_frames`` real mode raises
  NotImplementedError.
- **Fake mode** (``fake=True``): deterministic md5-derived decode for
  exercising the distributed plumbing on arbitrary (non-media) bytes.

Scale notes: media bytes never pass through the driver; mapInPandas
streams Arrow batches (bounded by spark.sql.execution.arrow.
maxRecordsPerBatch) so a 100 MB-per-row video column flows through
per-batch memory, not per-partition. Keep media tables partitioned on a
content-group key and store bytes in parquet as binary (or externalize
to object storage and keep URIs — same operator shapes apply).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, Window
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


def parse_media_header(payload: bytes | None) -> dict[str, Any] | None:
    """Stdlib-only media header parse: container format, pixel dimensions
    (JPEG/PNG/GIF/BMP), audio duration (WAV). Returns None for
    unrecognized/truncated payloads — never raises on hostile bytes.

    Formats (all public container specs):
    - PNG: 8-byte signature; IHDR chunk fixed at offset 8 → width/height
      big-endian u32 at bytes 16..24.
    - GIF87a/89a: logical screen width/height little-endian u16 at 6..10.
    - BMP: 'BM'; BITMAPINFOHEADER width/height signed LE i32 at 18..26
      (height may be negative = top-down).
    - JPEG: walk 0xFF-marker segments to the first SOFn (0xC0-0xCF minus
      0xC4/0xC8/0xCC); height/width big-endian u16 at payload bytes 1..5.
    - WAV: RIFF/WAVE chunk walk; 'fmt ' byte-rate (LE u32 at +16) and
      'data' declared size → duration_ms = data_size / byte_rate.
    - MP4/ISO-BMFF ('ftyp' at bytes 4..8): box walk to moov→mvhd for
      timescale/duration (v0 and v1 layouts), moov→trak→tkhd for the
      16.16 fixed-point presentation width/height of the first track
      that declares nonzero dimensions. Header metadata only — frame
      pixel decode still needs ffmpeg and stays out of scope.
    """
    if payload is None or len(payload) < 10:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return {"fmt": "png", "width": w, "height": h, "duration_ms": None}
        return None
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return {"fmt": "gif", "width": w, "height": h, "duration_ms": None}
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return {"fmt": "bmp", "width": abs(w), "height": abs(h), "duration_ms": None}
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # no-payload markers
                i += 2
                continue
            if i + 4 > len(b):
                return None
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return {"fmt": "jpeg", "width": w, "height": h, "duration_ms": None}
            i += 2 + seg_len
        return None
    if len(b) >= 16 and b[4:8] == b"ftyp":
        width = height = dur = None

        def boxes(lo: int, hi: int):
            i = lo
            while i + 8 <= hi:
                size = struct.unpack(">I", b[i : i + 4])[0]
                typ = b[i + 4 : i + 8]
                off = 8
                if size == 1:  # 64-bit largesize
                    if i + 16 > hi:
                        return
                    size = struct.unpack(">Q", b[i + 8 : i + 16])[0]
                    off = 16
                elif size == 0:  # box extends to end of enclosing scope
                    size = hi - i
                if size < off or i + size > hi:
                    return
                yield typ, i + off, i + size
                i += size

        for typ, lo, hi in boxes(0, len(b)):
            if typ != b"moov":
                continue
            for t2, lo2, hi2 in boxes(lo, hi):
                if t2 == b"mvhd" and hi2 - lo2 >= 20:
                    ver = b[lo2]
                    if ver == 1 and hi2 - lo2 >= 32:
                        ts = struct.unpack(">I", b[lo2 + 20 : lo2 + 24])[0]
                        du = struct.unpack(">Q", b[lo2 + 24 : lo2 + 32])[0]
                    else:
                        ts = struct.unpack(">I", b[lo2 + 12 : lo2 + 16])[0]
                        du = struct.unpack(">I", b[lo2 + 16 : lo2 + 20])[0]
                    if ts:
                        dur = round(du * 1000 / ts)
                elif t2 == b"trak":
                    for t3, lo3, hi3 in boxes(lo2, hi2):
                        # width/height are the final 8 bytes in both
                        # tkhd versions (16.16 fixed point)
                        if t3 == b"tkhd" and hi3 - lo3 >= 84:
                            ww, hh = struct.unpack(">II", b[hi3 - 8 : hi3])
                            ww, hh = ww >> 16, hh >> 16
                            if width is None and (ww or hh):
                                width, height = ww, hh
        return {"fmt": "mp4", "width": width, "height": height, "duration_ms": dur}
    if b[:4] == b"RIFF" and len(b) >= 12 and b[8:12] == b"WAVE":
        i = 12
        byte_rate = None
        data_size = None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            size = struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 20 <= len(b):
                byte_rate = struct.unpack("<I", b[i + 16 : i + 20])[0]
            elif cid == b"data":
                data_size = size  # declared size; bytes may be elsewhere
                break
            i += 8 + size + (size % 2)
        if byte_rate:
            dur = (
                round(data_size * 1000 / byte_rate) if data_size is not None else None
            )
            return {"fmt": "wav", "width": None, "height": None, "duration_ms": dur}
        return None
    return None


def _i32(v: Any) -> int | None:
    """Clamp-to-NULL for the IntegerType output columns: hostile headers
    can declare u32-max dimensions or absurd durations (WAV byte_rate=1),
    which would overflow the Arrow int32 conversion and kill the task —
    the robustness contract is NULL metadata, never a crashed job."""
    if v is None:
        return None
    v = int(v)
    return v if 0 <= v <= 2**31 - 1 else None


def _real_decode(payload: bytes | None, kind: str) -> dict[str, Any]:
    """Header-metadata decode for image/audio/video containers.

    Video is header-only (MP4 mvhd/tkhd via ``parse_media_header``);
    frame PIXEL decode still requires ffmpeg (not in this container) —
    that remains the one documented stub, in ``sample_frames``'s real
    mode. A payload whose container is unrecognized (including a
    'video'-kinded row that is not ISO-BMFF) yields NULL metadata, never
    a crashed task.
    """
    if payload is None:
        return {
            "n_bytes": None, "width": None, "height": None,
            "duration_ms": None, "feature_hash": None,
        }
    hdr = parse_media_header(payload) or {}
    return {
        "n_bytes": _i32(len(payload)),
        "width": _i32(hdr.get("width")),
        "height": _i32(hdr.get("height")),
        "duration_ms": _i32(hdr.get("duration_ms")),
        "feature_hash": hashlib.md5(payload).hexdigest(),
    }


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract media via mapInPandas (Arrow-batched).

    ``fake=False`` (real mode) parses container headers with the stdlib
    (see ``parse_media_header``; MP4 covers the video kind) —
    unrecognized payloads get NULL dimensions, never a crashed task.
    ``fake=True`` substitutes the deterministic md5-derived decode
    (works on any bytes)."""
    decode_one = _fake_decode if fake else _real_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"media_id": mid, "kind": kind, **decode_one(payload, kind)}
                for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def synthetic_real_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL-container payloads (PNG / GIF / WAV / MP4
    headers built with ``struct``) with id-derived dimensions, so the
    non-fake decode path is exercisable — and oracle-checkable — without
    media libraries: width = 100 + id%500, height = 50 + id%300,
    wav duration_ms = (id%10 + 1) * 100, mp4 duration_ms =
    (id%20 + 1) * 500 exactly (mvhd timescale 1000).
    """
    # identity transformation matrix used by both mvhd and tkhd
    mp4_matrix = struct.pack(
        ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 100 + mid % 500, 50 + mid % 300
                if mid % 4 == 0:  # minimal PNG: sig + IHDR
                    payload = (
                        b"\x89PNG\r\n\x1a\n"
                        + struct.pack(">I", 13) + b"IHDR"
                        + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                    )
                    kind, mime = "image", "image/png"
                elif mid % 4 == 1:  # GIF89a logical screen
                    payload = b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"
                    kind, mime = "image", "image/gif"
                elif mid % 4 == 2:  # canonical WAV: fmt(16) + data header
                    byte_rate = 16000
                    data_size = (mid % 10 + 1) * 1600  # → (id%10+1)*100 ms
                    payload = (
                        b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
                        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, byte_rate, 2, 16)
                        + b"data" + struct.pack("<I", data_size)
                    )
                    kind, mime = "audio", "audio/wav"
                else:  # minimal ISO-BMFF: ftyp + moov(mvhd + trak(tkhd))
                    dur = (mid % 20 + 1) * 500
                    ftyp = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0)
                    mvhd = (
                        struct.pack(">I", 108) + b"mvhd" + b"\x00\x00\x00\x00"
                        + struct.pack(">II", 0, 0)        # creation, modification
                        + struct.pack(">II", 1000, dur)   # timescale, duration
                        + struct.pack(">I", 0x00010000)   # rate 1.0
                        + struct.pack(">H", 0x0100)       # volume
                        + b"\x00" * 10                    # reserved
                        + mp4_matrix
                        + b"\x00" * 24                    # pre_defined
                        + struct.pack(">I", 2)            # next_track_ID
                    )
                    tkhd = (
                        struct.pack(">I", 92) + b"tkhd" + b"\x00\x00\x00\x07"
                        + struct.pack(">IIII", 0, 0, 1, 0)  # creation/mod/track/rsv
                        + struct.pack(">I", dur)
                        + b"\x00" * 8
                        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/alt/vol/rsv
                        + mp4_matrix
                        + struct.pack(">II", w << 16, h << 16)  # 16.16 fixed
                    )
                    trak = struct.pack(">I", 100) + b"trak" + tkhd
                    moov = struct.pack(">I", 216) + b"moov" + mvhd + trak
                    payload = ftyp + moov
                    kind, mime = "video", "video/mp4"
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload": payload,
                        "mime": mime,
                        "source_uri": f"synthetic://media/{mid}",
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return df.select(id_col).mapInPandas(build, schema=MEDIA_SCHEMA)


def fake_pixel_rows(hash_col, seed: str = "p"):
    """Deterministic fake 9x8 grayscale grid for a frame: row r is the
    first 18 hex chars of md5(frame_hash || '|' || seed || r) — nine
    2-hex-char pixels (00-ff). Fixed-width lowercase hex compares
    LEXICOGRAPHICALLY exactly like the byte value, so downstream
    comparisons never parse numbers (engine-exact by construction).
    Native column expression — the real-pixel sibling would decode via
    mapInPandas (PIL/ffmpeg, not in this container) and emit the same
    array<string> shape."""
    c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    return F.array(
        *[
            F.substring(
                F.md5(F.concat(c, F.lit(f"|{seed}{r}"))), 1, 18
            )
            for r in range(8)
        ]
    )


def dhash_from_rows(rows_col) -> dict[str, Any]:
    """64-bit difference hash (dHash — the public perceptual-hash
    scheme: per row, bit c is 1 iff pixel c is brighter than pixel
    c+1) over an array of eight 18-hex-char pixel rows
    (``fake_pixel_rows`` shape, 9 pixels per row).

    Returns column expressions keyed ``d_bands`` (array of 8 per-row
    bytes, ints 0-255 — the LSH band values), ``sig_hi`` / ``sig_lo``
    (rows 0-3 / 4-7 packed little-endian into two 32-bit halves held in
    bigints — two halves so no value ever touches the sign bit and
    xor/bit_count parity across engines is trivial). A one-pixel
    perturbation changes at most 2 bits (its two adjacent comparisons),
    which is what makes dHash a NEAR-dup key.

    Callers must materialize ``rows_col`` in its own projection first
    (the CLAUDE.md nested-HOF CSE rule): every byte reads the array."""
    rows = F.col(rows_col) if isinstance(rows_col, str) else rows_col

    def row_byte(row):
        b = F.lit(0).cast("bigint")
        for c in range(8):
            px = F.substring(row, 2 * c + 1, 2)
            nxt = F.substring(row, 2 * c + 3, 2)
            b = b + F.when(px > nxt, F.lit(2**c).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        return b

    # one transform over the materialized rows — the byte expression is
    # emitted ONCE (loop body), not 8x, keeping generated code well
    # under the JVM's 64 KB method limit (inlining every byte into
    # d_bands AND the two signature halves tripled the tree and pushed
    # the stage out of whole-stage codegen — 19 s on 200 rows)
    return {"d_bands": F.transform(rows, row_byte)}


def _dhash_sigs(bands_col) -> dict[str, Any]:
    """Pack the 8 materialized row bytes into the two 32-bit signature
    halves (little-endian; two halves so neither value ever nears the
    bigint sign bit and xor/bit_count parity is trivial)."""
    b = F.col(bands_col) if isinstance(bands_col, str) else bands_col

    def half(lo: int):
        return sum(
            (
                F.element_at(b, lo + r + 1) * F.lit(256**r).cast("bigint")
                for r in range(1, 4)
            ),
            F.element_at(b, lo + 1),
        )

    return {"sig_hi": half(0), "sig_lo": half(4)}


def frame_dhash(
    df: DataFrame,
    hash_col: str = "frame_hash",
    rows_col: str | None = None,
    seed: str = "p",
) -> DataFrame:
    """Attach the dHash signature columns (``d_bands``, ``sig_hi``,
    ``sig_lo``) to a frame table. ``rows_col`` names a precomputed
    pixel-row array (the perturbation hook for near-dup tests and the
    seam where a REAL pixel decode would plug in); otherwise fake rows
    derive from ``hash_col``. Map-side only — zero shuffles."""
    if rows_col is None:
        df = df.withColumn("_px", fake_pixel_rows(hash_col, seed))
        rows_col = "_px"
    keep = [c for c in df.columns if c != "_px"]
    # two staged projections: bands from rows, then signatures from the
    # MATERIALIZED bands — never re-inline the byte expressions
    banded = df.select(
        *keep, dhash_from_rows(rows_col)["d_bands"].alias("d_bands")
    )
    sigs = _dhash_sigs("d_bands")
    return banded.select(
        *keep,
        "d_bands",
        sigs["sig_hi"].alias("sig_hi"),
        sigs["sig_lo"].alias("sig_lo"),
    )


def audio_fingerprint(
    df: DataFrame,
    hash_col: str = "clip_hash",
    rows_col: str | None = None,
    seed: str = "a",
) -> DataFrame:
    """Per-window band-energy SIGN fingerprint for audio clips — the
    spectral-difference family (Haitsma & Kalker 2002's sub-fingerprint
    sign bits / chromaprint's filter signs): the fake decode derives an
    8-window x 9-band energy grid from the clip hash
    (``fake_pixel_rows`` with the audio seed — each energy a 00-ff hex
    byte; a REAL decode would emit the SAME array<string> grid from
    windowed FFT band energies via mapInPandas — ffmpeg is not in this
    container), and window w's fingerprint byte sets bit b iff
    E[b] > E[b+1] — the identical difference-sign signature dHash takes
    over pixel rows, so ``dedup.dhash_near_pairs`` and its
    pigeonhole-exact hamming<=7 recall guarantee apply verbatim (8
    window bytes = 8 LSH bands; a pair differing in <= 7 bits leaves
    >= 1 band intact). A single perturbed band energy feeds only its
    two adjacent comparisons, so small re-encodes stay within
    hamming 2 per touched window. Emits ``d_bands`` / ``sig_hi`` /
    ``sig_lo``; map-side only — zero shuffles.

    ``rows_col`` names a precomputed energy-window array (the
    perturbation hook for near-dup tests and the seam where a real FFT
    decode plugs in)."""
    return frame_dhash(df, hash_col=hash_col, rows_col=rows_col, seed=seed)


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


def video_scene_changes(
    frames: DataFrame,
    media_col: str = "media_id",
    idx_col: str = "frame_idx",
    hash_col: str = "frame_hash",
    threshold: int = 16,
    rows_col: str | None = None,
    seed: str = "p",
) -> DataFrame:
    """Shot-boundary (scene-cut) detection over sampled video frames —
    the standard preprocessing step before per-scene frame selection /
    captioning in multimodal pipelines: the dHash hamming distance
    between CONSECUTIVE frames of a video (perceptual content distance;
    the public content-based shot-detection recipe), a distance >
    ``threshold`` marks a cut, and ``scene_id`` is the running cut
    count (frame 0 opens scene 1). Identical frames distance 0; a
    one-pixel retouch moves ≤ 2 bits — far under any sane threshold —
    while unrelated content sits near 32 (random bits).

    Plan: the signature build is the map-side :func:`frame_dhash`
    (fake-mode pixels unless ``rows_col`` supplies real decoded rows);
    the lag and the running cut count share ONE (media)-partitioned
    window exchange (frame counts per video are bounded — the
    ``sample_frames`` contract). Returns ``(media_col, idx_col,
    hamming, scene_id)`` with ``hamming`` NULL on each video's first
    frame.
    """
    sigs = frame_dhash(frames, hash_col=hash_col, rows_col=rows_col, seed=seed)
    w = Window.partitionBy(media_col).orderBy(idx_col)
    prev_hi = F.lag("sig_hi").over(w)
    prev_lo = F.lag("sig_lo").over(w)
    ham = (
        F.bit_count(F.col("sig_hi").bitwiseXOR(prev_hi))
        + F.bit_count(F.col("sig_lo").bitwiseXOR(prev_lo))
    ).cast("int")
    staged = sigs.withColumn("hamming", ham)
    is_cut = F.when(
        F.col("hamming").isNull() | (F.col("hamming") > int(threshold)), 1
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return staged.select(
        media_col,
        idx_col,
        "hamming",
        F.sum(is_cut).over(wc).cast("int").alias("scene_id"),
    )


# ---------------------------------------------------------------------------
# Cross-modal pair alignment (the LAION-style CLIP-score cut — Schuhmann
# et al. 2021/2022: score each (text, image) pair by the cosine of its
# two modality embeddings and keep pairs above a threshold/quantile).
# The standard multimodal curation step AFTER near-dup removal: misaligned
# pairs (wrong caption, watermark boilerplate, decorative images) score
# low regardless of each side's unimodal quality.
# ---------------------------------------------------------------------------


def synthetic_paired_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_col: str = "pair_embedding",
    seed: str = "xm|",
) -> DataFrame:
    """Deterministic md5-derived second-modality embedding for each row
    (the fake-decode precedent: real CLIP encoders aren't in this
    container, so the harness derives a reproducible paired vector and
    the Spark-side plumbing stays real and oracle-checkable).

    ``pair[j] = v[j] + amp(id) * coef(id, j)`` where ``amp`` ∈ [0, 2)
    scales a per-row noise level (high-amp rows are the "misaligned"
    pairs the filter must cut) and ``coef`` ∈ [-1, 1] is the SRP md5
    recipe (`similarity._srp_coef`). All arithmetic is IEEE-exact from
    md5-derived integers, so DuckDB reproduces the array bit-identically
    via ``list_transform`` (1-based index shifted to match Spark's
    0-based ``transform`` — CLAUDE.md round-3 ordinality note).
    Map-side only: no shuffle, no UDF.
    """
    from .similarity import _dbl, _srp_coef

    sid = F.col(id_col).cast("string")
    amp = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("amp|"), sid)), 1, 15), 16, 10
        ).cast("bigint")
        % 1000
    ) / F.lit(500.0)
    return df.withColumn(
        pair_col,
        F.transform(
            _dbl(vec_col),
            lambda x, j: x + amp * _srp_coef(F.col(id_col), j, seed),
        ),
    )


def cross_modal_alignment(
    df: DataFrame,
    vec_a: str = "embedding",
    vec_b: str = "pair_embedding",
    out_col: str = "alignment",
) -> DataFrame:
    """Per-row cosine alignment between the two modality embeddings of
    a pair, rounded to 6dp (parity kit): ``round(cos(a, b), 6)``, NULL
    when either side is NULL/zero-norm/NaN-poisoned (the
    `similarity.cosine_from_norms` contract, so a poisoned pair can
    never pass a threshold).

    Plan shape: pure map-side column expressions (zip-multiply dot +
    two norms) — zero shuffles, whole-stage codegen, scales linearly in
    pairs at any corpus size. Cut the result with a fixed threshold or
    `text.quantile_threshold_filter` (one broadcast aggregate).
    """
    from .similarity import _dbl, cosine_from_norms, dot, l2_norm

    a, b = _dbl(vec_a), _dbl(vec_b)
    return df.withColumn(
        out_col,
        F.round(cosine_from_norms(a, b, l2_norm(a), l2_norm(b)), 6),
    )
