"""Multimodal column plumbing: image/audio/video as opaque BinaryType
columns with typed metadata, processed via Arrow-batched mapInPandas
(north-star operators; SURVEY.md §7 phase 6).

Two modalities run END-TO-END REAL with stdlib-only codecs: audio (RIFF/WAVE
via `wave`, exact integer DSP) and image (spec-compliant PNG encode/decode —
CRC-verified chunks, zlib inflate, all five scanline filters incl. Paeth —
see `_png_bytes`/`decode_png`). Only the generic kind-dispatch feature
kernel (`extract_features`) keeps a deterministic stub behind
`_decode_image_stub` (clearly marked) for formats with no stdlib codec
(JPEG, video containers); its Spark-side plumbing — schema, batch
iteration, partition-parallel UDF signature, metadata struct — is real and
tested, and swapping the stub for PIL/pyav is a one-function change.

Scale: mapInPandas streams Arrow record batches (bounded memory per task,
`spark.sql.execution.arrow.maxRecordsPerBatch`), media bytes never pass
through the driver, and the operator is embarrassingly parallel — the right
shape for decoding billions of images on 1000 executors.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
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
        StructField("content", BinaryType(), False),
        StructField("meta_format", StringType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_sha256 string, "
    "width int, height int, n_frames int, feature_norm double"
)


def synth_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Deterministic fake media derived from document text bytes — stands in
    for a real parquet/blob source of media columns."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("synthetic").alias("meta_format"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("meta_width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("meta_height"),
        (F.length("text") * 10).cast("long").alias("meta_duration_ms"),
    )


def _decode_image_stub(content: bytes, width: int, height: int):
    """STUB decode: a real build calls PIL.Image.open here. The fake derives
    deterministic pseudo-pixels from a sha256 of the bytes so downstream
    feature math is testable. Raises for unsupported kinds like a real
    decoder would."""
    digest = hashlib.sha256(content).digest()
    # 8 fake "pixels" per digest, scaled to [0, 1)
    return [b / 256.0 for b in digest[:8]], width, height


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode + featurize media via mapInPandas (Arrow-batched)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content)
                sha = hashlib.sha256(content).hexdigest()
                if r.kind == "image":
                    pixels, w, h = _decode_image_stub(content, r.meta_width, r.meta_height)
                    frames = 1
                elif r.kind == "video":
                    # frame-sample stub: 4 deterministic "frames"
                    pixels, w, h = _decode_image_stub(content, r.meta_width, r.meta_height)
                    frames = 4
                else:  # audio: no spatial dims
                    pixels, w, h = _decode_image_stub(content, 0, 0)
                    frames = 0
                norm = math.sqrt(sum(p * p for p in pixels))
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(content),
                        "content_sha256": sha,
                        "width": w,
                        "height": h,
                        "n_frames": frames,
                        "feature_norm": norm,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def media_features_oracle_sql() -> str:
    """DuckDB twin of synth_media + extract_features. Every output column —
    including feature_norm — is deterministic: the stub's pseudo-pixels are
    sha256 digest bytes / 256.0, reproduced here by hex-nibble arithmetic on
    DuckDB's sha256() (exact dyadic rationals, so sqrt sees the identical
    double on both engines)."""
    hexpos = "strpos('0123456789abcdef', substr(content_sha256, {k}, 1)) - 1"
    terms = " + ".join(
        "pow((16 * ({h1}) + ({h2})) / 256.0, 2)".format(
            h1=hexpos.format(k=2 * i + 1), h2=hexpos.format(k=2 * i + 2)
        )
        for i in range(8)
    )
    return f"""
WITH media AS (
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           text,
           CAST(doc_id % 640 + 32 AS INT) AS meta_width,
           CAST(doc_id % 480 + 32 AS INT) AS meta_height
    FROM documents
), f AS (
    SELECT media_id, kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256,
           CAST(CASE WHEN kind = 'audio' THEN 0 ELSE meta_width END AS INT) AS width,
           CAST(CASE WHEN kind = 'audio' THEN 0 ELSE meta_height END AS INT) AS height,
           CAST(CASE kind WHEN 'image' THEN 1 WHEN 'video' THEN 4 ELSE 0 END AS INT) AS n_frames
    FROM media
)
SELECT media_id, kind, n_bytes, content_sha256, width, height, n_frames,
       sqrt({terms}) AS feature_norm
FROM f
"""


RESIZE_SCHEMA = (
    "media_id long, kind string, in_w int, in_h int, out_w int, out_h int, "
    "content binary"
)


def resize_media(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize into a max_w x max_h box preserving aspect ratio. The
    GEOMETRY (aspect-fit, integer truncating division — identical in every
    engine) is JVM-side column math; only the pixel resample runs in
    mapInPandas, where the stub emits a deterministic buffer of exactly
    out_w*out_h bytes (a real build calls PIL `Image.resize` there).
    Audio has no spatial dims and passes through as 0x0 with empty content.

    The downstream gate query checks octet_length(content) == out_w*out_h,
    so the Arrow round-trip through the Python worker is verified, not just
    the geometry."""
    mw, mh = int(max_w), int(max_h)
    is_audio = F.col("kind") == "audio"
    fits = (F.col("meta_width") <= mw) & (F.col("meta_height") <= mh)
    # height-binding test by integer cross-multiplication (no doubles)
    by_h = (F.col("meta_width") * mh) <= (F.col("meta_height") * mw)
    out_w = (
        F.when(is_audio, F.lit(0))
        .when(fits, F.col("meta_width"))
        .when(by_h, F.expr(f"meta_width * {mh} DIV meta_height"))
        .otherwise(F.lit(mw))
        .cast("int")
    )
    out_h = (
        F.when(is_audio, F.lit(0))
        .when(fits, F.col("meta_height"))
        .when(by_h, F.lit(mh))
        .otherwise(F.expr(f"meta_height * {mw} DIV meta_width"))
        .cast("int")
    )
    geo = media.select(
        "media_id",
        "kind",
        F.col("meta_width").alias("in_w"),
        F.col("meta_height").alias("in_h"),
        out_w.alias("out_w"),
        out_h.alias("out_h"),
        "content",
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                n = int(r.out_w) * int(r.out_h)
                if n == 0:
                    buf = b""
                else:
                    # STUB resample: digest-seeded bytes, exact target size
                    digest = hashlib.sha256(bytes(r.content)).digest()
                    buf = (digest * (n // len(digest) + 1))[:n]
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "in_w": r.in_w,
                        "in_h": r.in_h,
                        "out_w": r.out_w,
                        "out_h": r.out_h,
                        "content": buf,
                    }
                )
            yield pd.DataFrame(out)

    return geo.mapInPandas(fn, schema=RESIZE_SCHEMA)


def media_resize_check(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Gate projection: geometry + produced-buffer length (content itself is
    stub-generated, so the oracle checks its SIZE, which only comes out
    right if the Python resample ran)."""
    return resize_media(media, max_w, max_h).select(
        "media_id",
        "kind",
        "in_w",
        "in_h",
        "out_w",
        "out_h",
        F.octet_length("content").cast("long").alias("out_bytes"),
    )


def media_resize_oracle_sql(max_w: int = 224, max_h: int = 224) -> str:
    return f"""
WITH media AS (
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(doc_id % 640 + 32 AS INT) AS in_w,
           CAST(doc_id % 480 + 32 AS INT) AS in_h
    FROM documents
), geo AS (
    SELECT media_id, kind, in_w, in_h,
           CAST(CASE
               WHEN kind = 'audio' THEN 0
               WHEN in_w <= {max_w} AND in_h <= {max_h} THEN in_w
               WHEN in_w * {max_h} <= in_h * {max_w} THEN in_w * {max_h} // in_h
               ELSE {max_w}
           END AS INT) AS out_w,
           CAST(CASE
               WHEN kind = 'audio' THEN 0
               WHEN in_w <= {max_w} AND in_h <= {max_h} THEN in_h
               WHEN in_w * {max_h} <= in_h * {max_w} THEN {max_h}
               ELSE in_h * {max_w} // in_w
           END AS INT) AS out_h
    FROM media
)
SELECT media_id, kind, in_w, in_h, out_w, out_h,
       CAST(out_w * out_h AS BIGINT) AS out_bytes
FROM geo
"""


FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms long, frame_sha256 string"


def media_frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: emit one row per sampled frame at a fixed
    timestamp stride (the decode-side companion to resize_media — a real
    build hands each (content, ts_ms) to a demuxer; the stub hashes the
    container bytes + frame index so the gate can verify every sampled
    frame actually crossed the Arrow boundary into Python and back).

    The SAMPLING PLAN — which frames exist — is JVM-side integer math:
    `sequence(0, (duration-1) div stride)` exploded per video, so Catalyst
    sees the fan-out and the Python worker does nothing but the per-frame
    decode kernel. Scale: explode multiplies rows by duration/stride
    (bounded per media item), stays partition-local (no shuffle), and the
    decode is embarrassingly parallel over frames — finer-grained than
    per-video, which is exactly what you want when one 2-hour video would
    otherwise pin a task."""
    stride = int(every_ms)
    frames = (
        media.where((F.col("kind") == "video") & (F.col("meta_duration_ms") > 0))
        .select(
            "media_id",
            "content",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.expr(f"(meta_duration_ms - 1) DIV {stride}"),
                )
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            "content",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            (F.col("frame_idx") * stride).cast("long").alias("ts_ms"),
        )
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                # STUB frame decode: a real build seeks to ts_ms and decodes;
                # the fake fingerprints (container bytes, frame index)
                frame = bytes(r.content) + b":" + str(int(r.frame_idx)).encode()
                out.append(
                    {
                        "media_id": r.media_id,
                        "frame_idx": int(r.frame_idx),
                        "ts_ms": int(r.ts_ms),
                        "frame_sha256": hashlib.sha256(frame).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return frames.mapInPandas(fn, schema=FRAME_SCHEMA)


def media_frame_sample_oracle_sql(every_ms: int = 1000) -> str:
    stride = int(every_ms)
    return f"""
WITH media AS (
    SELECT doc_id AS media_id, text,
           CAST(length(text) * 10 AS BIGINT) AS duration_ms
    FROM documents
    WHERE doc_id % 3 = 2
), idx AS (
    SELECT media_id, text,
           unnest(generate_series(0, (duration_ms - 1) // {stride})) AS frame_idx
    FROM media WHERE duration_ms > 0
)
SELECT media_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_idx * {stride} AS BIGINT) AS ts_ms,
       sha256(text || ':' || CAST(frame_idx AS VARCHAR)) AS frame_sha256
FROM idx
"""


def media_stats(features: DataFrame) -> DataFrame:
    """Per-kind rollup over extracted features."""
    return features.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
    )


# ---------------------------------------------------------------------------
# REAL codecs where the environment provides them.
#
# Audio: the stdlib `wave` module is a genuine RIFF/WAVE container parser,
# so the audio modality runs END-TO-END REAL — real PCM bytes synthesized
# into a real WAV container, decoded back by a real demuxer, with real DSP
# features — no stub anywhere on this path. Image decode is gated on PIL
# availability (absent in this container): `decode_image_real` raises
# ImportError cleanly and its test skips.
# ---------------------------------------------------------------------------

WAV_RATE = 8000


def _wav_samples(media_id: int) -> list[int]:
    """Deterministic int16 PCM pattern (sawtooth-ish), mirrored exactly by
    the SQL oracle: sample[i] = (media_id*31 + i*7) % 4096 - 2048."""
    n = 200 + media_id % 300
    return [((media_id * 31 + i * 7) % 4096) - 2048 for i in range(n)]


def _wav_bytes(samples: list[int], rate: int = WAV_RATE) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def synth_wav_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """One real mono 16-bit WAV per document, PCM pattern keyed by doc_id —
    built executor-side in mapInPandas (bytes never visit the driver)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [_wav_bytes(_wav_samples(int(i))) for i in ids],
                }
            )

    return documents.select("doc_id").mapInPandas(
        fn, schema="media_id long, content binary"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode + features via mapInPandas: parse the WAV container
    (stdlib `wave`), then exact integer DSP — sample count, frame rate,
    duration, peak amplitude, and RMS from the exact sum of squares."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                with wave.open(io.BytesIO(bytes(r.content)), "rb") as w:
                    rate = w.getframerate()
                    n = w.getnframes()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                sumsq = sum(s * s for s in samples)  # exact int
                out.append(
                    {
                        "media_id": r.media_id,
                        "n_samples": n,
                        "framerate": rate,
                        "duration_ms": n * 1000 // rate,
                        "peak": max(abs(s) for s in samples) if n else 0,
                        "rms": math.sqrt(sumsq / n) if n else 0.0,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        schema=(
            "media_id long, n_samples int, framerate int, duration_ms long, "
            "peak int, rms double"
        ),
    )


def audio_features_oracle_sql(rate: int = WAV_RATE) -> str:
    """Exact twin: regenerate the PCM pattern with a range join and fold the
    same integer aggregates (integer sum of squares -> identical double
    RMS)."""
    return f"""
WITH ids AS (
    SELECT doc_id AS media_id, 200 + doc_id % 300 AS n FROM documents
), samples AS (
    SELECT media_id, n,
           (media_id * 31 + i.range * 7) % 4096 - 2048 AS s
    FROM ids JOIN range(500) i ON i.range < n
)
SELECT media_id,
       CAST(n AS INT) AS n_samples,
       CAST({int(rate)} AS INT) AS framerate,
       CAST(n * 1000 // {int(rate)} AS BIGINT) AS duration_ms,
       CAST(MAX(ABS(s)) AS INT) AS peak,
       sqrt(CAST(SUM(s * s) AS DOUBLE) / n) AS rms
FROM samples
GROUP BY media_id, n
"""


def decode_image_real(content: bytes):
    """Real image decode, gated on PIL availability (raises ImportError in
    codec-less environments — callers and tests skip cleanly). Returns
    (pixels[0,1), width, height) with the same signature as the stub."""
    from PIL import Image  # noqa: F401 - the availability gate
    import io

    img = Image.open(io.BytesIO(content)).convert("L")
    px = list(img.getdata())
    return [p / 256.0 for p in px], img.width, img.height


# ---------------------------------------------------------------------------
# REAL image modality: PNG, end-to-end with no codec library.
#
# The container lacks PIL, but PNG needs only stdlib zlib: the encoder below
# writes spec-compliant PNGs (8-bit RGB, all five scanline filter types
# cycled per row, real CRC-32 chunk checksums), and the decoder is a genuine
# PNG reader — chunk walk with CRC verification, IDAT inflate, per-row
# unfiltering incl. the Paeth predictor. Features are exact integer channel
# sums, so the DuckDB oracle can regenerate them from the deterministic
# pixel pattern with a range join — the same real-decode grading design as
# the audio path above.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_dims(media_id: int) -> tuple[int, int]:
    return 8 + media_id % 9, 8 + media_id % 7  # w in 8..16, h in 8..14


def _png_pixel(media_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic RGB pattern, mirrored exactly by the SQL oracle."""
    return (
        (media_id + x * 3 + y * 7) % 256,
        (media_id * 2 + x * 5 + y) % 256,
        (media_id * 3 + x + y * 11) % 256,
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: list[tuple[int, int, int]],
    w: int,
    h: int,
    filters: list[int] | None = None,
) -> bytes:
    """Spec-compliant 8-bit RGB PNG encoder. ``filters`` gives the scanline
    filter type per row (default: cycle 0..4, so a decoder must implement
    None/Sub/Up/Average/Paeth for real)."""
    import struct
    import zlib

    bpp = 3
    prev = bytes(w * bpp)
    out = bytearray()
    for y in range(h):
        raw = bytearray()
        for x in range(w):
            raw += bytes(pixels[y * w + x])
        f = (y % 5) if filters is None else filters[y]
        out.append(f)
        for i in range(len(raw)):
            a = raw[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = raw[i]
            elif f == 1:
                v = raw[i] - a
            elif f == 2:
                v = raw[i] - b
            elif f == 3:
                v = raw[i] - (a + b) // 2
            else:
                v = raw[i] - _paeth(a, b, c)
            out.append(v & 0xFF)
        prev = bytes(raw)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def _png_bytes(media_id: int) -> bytes:
    w, h = _png_dims(media_id)
    pixels = [_png_pixel(media_id, x, y) for y in range(h) for x in range(w)]
    return encode_png(pixels, w, h)


def decode_png(content: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Real stdlib-only PNG decoder for 8-bit RGB non-interlaced images:
    chunk walk with CRC-32 verification, IDAT inflate, scanline unfiltering
    (all five filter types). Returns (width, height, pixels row-major)."""
    import struct
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    idat = bytearray()
    w = h = None
    while pos < len(content):
        if pos + 8 > len(content):
            raise ValueError("truncated PNG: partial chunk header")
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        if pos + 12 + length > len(content):
            raise ValueError(f"truncated PNG: partial {tag!r} chunk")
        data = content[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", content[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    prev = bytearray(stride)
    pixels: list[tuple[int, int, int]] = []
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 1:
                line[i] = (line[i] + a) & 0xFF
            elif f == 2:
                line[i] = (line[i] + b) & 0xFF
            elif f == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif f == 4:
                line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
            elif f != 0:
                raise ValueError(f"bad filter type {f}")
        for x in range(w):
            pixels.append(
                (line[x * bpp], line[x * bpp + 1], line[x * bpp + 2])
            )
        prev = line
    return w, h, pixels


def synth_png_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """One real PNG per document, pixel pattern keyed by doc_id — encoded
    executor-side in mapInPandas (bytes never visit the driver)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [_png_bytes(int(i)) for i in ids],
                }
            )

    return documents.select("doc_id").mapInPandas(
        fn, schema="media_id long, content binary"
    )


def image_features(media: DataFrame) -> DataFrame:
    """REAL image decode + features via mapInPandas: full PNG parse
    (CRC-verified chunks, inflate, unfilter), then exact integer channel
    sums and a Rec.601 mean luma (one exactly-rounded division)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                w, h, px = decode_png(bytes(r.content))
                sum_r = sum(p[0] for p in px)
                sum_g = sum(p[1] for p in px)
                sum_b = sum(p[2] for p in px)
                n = w * h
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": w,
                        "height": h,
                        "n_pixels": n,
                        "sum_r": sum_r,
                        "sum_g": sum_g,
                        "sum_b": sum_b,
                        # Rec.601 integer luma, one exact division at the end
                        "mean_luma": (sum_r * 299 + sum_g * 587 + sum_b * 114)
                        / (1000 * n),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        schema=(
            "media_id long, width int, height int, n_pixels long, "
            "sum_r long, sum_g long, sum_b long, mean_luma double"
        ),
    )


def image_features_oracle_sql() -> str:
    """Exact twin: regenerate the pixel pattern with two range joins and
    fold the same integer sums (identical final double division)."""
    return """
WITH ids AS (
    SELECT doc_id AS media_id,
           8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
    FROM documents
), px AS (
    SELECT media_id, w, h,
           (media_id + x.range * 3 + y.range * 7) % 256 AS r,
           (media_id * 2 + x.range * 5 + y.range) % 256 AS g,
           (media_id * 3 + x.range + y.range * 11) % 256 AS b
    FROM ids
    JOIN range(16) x ON x.range < w
    JOIN range(14) y ON y.range < h
)
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(r) * 299 + SUM(g) * 587 + SUM(b) * 114 AS DOUBLE)
         / CAST(1000 * w * h AS DOUBLE) AS mean_luma
FROM px
GROUP BY media_id, w, h
"""


# ---------------------------------------------------------------------------
# REAL video modality: Y4M (YUV4MPEG2), end-to-end with no codec library.
#
# The remaining stubbed modality closed the same way as WAV and PNG: Y4M is
# a real, standard, uncompressed video container (mjpegtools/ffmpeg
# interchange format) that needs no codec — a plain-text stream header
# ("YUV4MPEG2 W.. H.. F<num>:<den> .. C444"), then per frame a "FRAME\n"
# marker followed by raw Y, U, V planes. The encoder below writes
# spec-compliant streams (C444 = no chroma subsampling, so every plane is
# w*h bytes) and the decoder is a genuine Y4M demuxer: header tokenizer,
# frame-marker walk with parameter tolerance, plane slicing, with hard
# errors on malformed input. Features are exact integer plane sums, so the
# DuckDB oracle regenerates them from the deterministic pattern with range
# joins — the same real-decode grading design as audio/PNG above. The
# mapInPandas plumbing (Arrow batches, bytes never at the driver) is shared
# with the other modalities; stream_parse parity: the reference treats
# binary payloads as opaque tailed bytes, this engine decodes them
# executor-side.
# ---------------------------------------------------------------------------

Y4M_FPS = 25  # F25:1 -> 40 ms per frame
# Synthetic-stream geometry: w in 16..23, h in 12..17, 3..6 frames. The
# SQL oracles interpolate BOTH the formulas and their range() upper bounds
# from these constants, so widening the generator can never silently
# truncate the oracle's frame/pixel enumeration.
Y4M_W_BASE, Y4M_W_MOD = 16, 8
Y4M_H_BASE, Y4M_H_MOD = 12, 6
Y4M_N_BASE, Y4M_N_MOD = 3, 4


def _y4m_dims(media_id: int) -> tuple[int, int]:
    return Y4M_W_BASE + media_id % Y4M_W_MOD, Y4M_H_BASE + media_id % Y4M_H_MOD


def _y4m_frames(media_id: int) -> int:
    return Y4M_N_BASE + media_id % Y4M_N_MOD


def _y4m_plane_val(media_id: int, p: int, f: int, x: int, y: int) -> int:
    """Deterministic plane pattern (p: 0=Y, 1=U, 2=V), mirrored exactly by
    the SQL oracle."""
    return (
        media_id * (7 + 4 * p) + f * (13 + 2 * p) + x * (3 + p) + y * (5 + p)
    ) % 256


def encode_y4m(media_id: int) -> bytes:
    w, h = _y4m_dims(media_id)
    n = _y4m_frames(media_id)
    parts = [f"YUV4MPEG2 W{w} H{h} F{Y4M_FPS}:1 Ip A1:1 C444\n".encode()]
    for f in range(n):
        parts.append(b"FRAME\n")
        for p in range(3):
            parts.append(
                bytes(
                    _y4m_plane_val(media_id, p, f, x, y)
                    for y in range(h)
                    for x in range(w)
                )
            )
    return b"".join(parts)


def decode_y4m(content: bytes):
    """Real Y4M demux: returns (w, h, fps_num, fps_den, frames) where each
    frame is the (y, u, v) plane bytes. Only C444 (and the default C420
    tag-absent case rejected explicitly) is supported — the synth side
    writes C444; a genuinely subsampled stream raises rather than
    mis-slicing planes."""
    nl = content.index(b"\n")
    header = content[:nl].decode("ascii")
    toks = header.split(" ")
    if toks[0] != "YUV4MPEG2":
        raise ValueError(f"not a Y4M stream: {toks[0]!r}")
    w = h = None
    fps_num, fps_den = 30, 1
    colorspace = "C420"
    for t in toks[1:]:
        if not t:
            continue
        tag, val = t[0], t[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "C":
            colorspace = t
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "C444":
        raise ValueError(f"unsupported colorspace {colorspace!r} (need C444)")
    plane = w * h
    frames = []
    pos = nl + 1
    while pos < len(content):
        fnl = content.index(b"\n", pos)
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad frame marker at byte {pos}")
        pos = fnl + 1
        if pos + 3 * plane > len(content):
            raise ValueError("truncated frame payload")
        frames.append(
            (
                content[pos : pos + plane],
                content[pos + plane : pos + 2 * plane],
                content[pos + 2 * plane : pos + 3 * plane],
            )
        )
        pos += 3 * plane
    return w, h, fps_num, fps_den, frames


def synth_y4m_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """One real Y4M stream per document, plane pattern keyed by doc_id —
    built executor-side in mapInPandas (bytes never visit the driver)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [encode_y4m(int(i)) for i in ids],
                }
            )

    return documents.select("doc_id").mapInPandas(
        fn, schema="media_id long, content binary"
    )


def video_features(media: DataFrame) -> DataFrame:
    """REAL video decode + features via mapInPandas: demux the Y4M stream,
    then exact integer plane statistics — frame count, dimensions, frame
    rate, duration, total per-plane sums, peak luma, mean luma."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                w, h, num, den, frames = decode_y4m(bytes(r.content))
                y_sum = sum(sum(f[0]) for f in frames)  # exact ints
                u_sum = sum(sum(f[1]) for f in frames)
                v_sum = sum(sum(f[2]) for f in frames)
                y_max = max(max(f[0]) for f in frames) if frames else 0
                npx = len(frames) * w * h
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": w,
                        "height": h,
                        "n_frames": len(frames),
                        "fps_num": num,
                        "duration_ms": len(frames) * 1000 * den // num,
                        "y_sum": y_sum,
                        "u_sum": u_sum,
                        "v_sum": v_sum,
                        "y_max": y_max,
                        "mean_luma": y_sum / npx if npx else 0.0,
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        schema=(
            "media_id long, width int, height int, n_frames int, "
            "fps_num int, duration_ms long, y_sum long, u_sum long, "
            "v_sum long, y_max int, mean_luma double"
        ),
    )


def video_features_oracle_sql() -> str:
    """Exact twin: regenerate every (frame, x, y) plane value with range
    joins and fold the same integer sums (identical double mean)."""
    return f"""
WITH ids AS (
    SELECT doc_id AS media_id,
           {Y4M_W_BASE} + doc_id % {Y4M_W_MOD} AS w,
           {Y4M_H_BASE} + doc_id % {Y4M_H_MOD} AS h,
           {Y4M_N_BASE} + doc_id % {Y4M_N_MOD} AS n
    FROM documents
), cells AS (
    SELECT media_id, w, h, n, f.range AS f, x.range AS x, y.range AS y
    FROM ids
    JOIN range({Y4M_N_BASE} + {Y4M_N_MOD}) f ON f.range < n
    JOIN range({Y4M_W_BASE} + {Y4M_W_MOD}) x ON x.range < w
    JOIN range({Y4M_H_BASE} + {Y4M_H_MOD}) y ON y.range < h
), vals AS (
    SELECT media_id, w, h, n,
           (media_id * 7 + f * 13 + x * 3 + y * 5) % 256 AS yv,
           (media_id * 11 + f * 15 + x * 4 + y * 6) % 256 AS uv,
           (media_id * 15 + f * 17 + x * 5 + y * 7) % 256 AS vv
    FROM cells
)
SELECT media_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(n AS INT) AS n_frames,
       CAST({Y4M_FPS} AS INT) AS fps_num,
       CAST(n * 1000 // {Y4M_FPS} AS BIGINT) AS duration_ms,
       CAST(SUM(yv) AS BIGINT) AS y_sum,
       CAST(SUM(uv) AS BIGINT) AS u_sum,
       CAST(SUM(vv) AS BIGINT) AS v_sum,
       CAST(MAX(yv) AS INT) AS y_max,
       CAST(SUM(yv) AS DOUBLE) / (n * w * h) AS mean_luma
FROM vals
GROUP BY media_id, w, h, n
"""


def video_frame_sample(media: DataFrame, every_ms: int = 80) -> DataFrame:
    """REAL frame sampling on the real container: demux, keep frames whose
    presentation time (f * 1000 * den / num ms) falls on the ``every_ms``
    grid, emit one row per kept frame with its exact luma profile. The
    frame explode happens executor-side inside the Arrow batch — sampled
    frames, not full streams, are what crosses operator boundaries."""
    every = int(every_ms)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                w, h, num, den, frames = decode_y4m(bytes(r.content))
                for f, (yp, _, _) in enumerate(frames):
                    t_ms = f * 1000 * den // num
                    if t_ms % every:
                        continue
                    ysum = sum(yp)
                    out.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": f,
                            "t_ms": t_ms,
                            "y_sum": ysum,
                            "y_mean": ysum / (w * h),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "t_ms", "y_sum", "y_mean"],
            )

    return media.mapInPandas(
        fn,
        schema="media_id long, frame_idx int, t_ms long, y_sum long, y_mean double",
    )


def video_frame_sample_oracle_sql(every_ms: int = 80) -> str:
    return f"""
WITH ids AS (
    SELECT doc_id AS media_id,
           {Y4M_W_BASE} + doc_id % {Y4M_W_MOD} AS w,
           {Y4M_H_BASE} + doc_id % {Y4M_H_MOD} AS h,
           {Y4M_N_BASE} + doc_id % {Y4M_N_MOD} AS n
    FROM documents
), frames AS (
    SELECT media_id, w, h, f.range AS f,
           f.range * 1000 // {Y4M_FPS} AS t_ms
    FROM ids JOIN range({Y4M_N_BASE} + {Y4M_N_MOD}) f ON f.range < n
    WHERE (f.range * 1000 // {Y4M_FPS}) % {int(every_ms)} = 0
), cells AS (
    SELECT media_id, w, h, f, t_ms,
           (media_id * 7 + f * 13 + x.range * 3 + y.range * 5) % 256 AS yv
    FROM frames
    JOIN range({Y4M_W_BASE} + {Y4M_W_MOD}) x ON x.range < w
    JOIN range({Y4M_H_BASE} + {Y4M_H_MOD}) y ON y.range < h
)
SELECT media_id, CAST(f AS INT) AS frame_idx, CAST(t_ms AS BIGINT) AS t_ms,
       CAST(SUM(yv) AS BIGINT) AS y_sum,
       CAST(SUM(yv) AS DOUBLE) / (w * h) AS y_mean
FROM cells
GROUP BY media_id, f, t_ms, w, h
"""


# ---------------------------------------------------------------------------
# SECOND real image container: BMP (Windows DIB, 24-bit BI_RGB) — stdlib
# only, end-to-end real like the PNG path. The format details a genuine
# decoder must honor and a fake one trips over: 4-byte row padding, BGR
# byte order, and BOTTOM-UP row storage (positive biHeight) vs top-down
# (negative biHeight) — the synthetic corpus alternates orientations so
# both branches are graded. Features are exact integer channel sums, so
# the DuckDB oracle regenerates them from the deterministic pattern with
# range joins — the same real-decode grading design as PNG/WAV/Y4M. The
# PIL-gated branch elsewhere still covers compressed formats (JPEG) in
# rich environments.
# ---------------------------------------------------------------------------


def _bmp_dims(media_id: int) -> tuple[int, int]:
    # w in 5..16 so the row stride padding (w*3 mod 4) varies over all
    # four padding widths; h in 5..13
    return 5 + media_id % 12, 5 + media_id % 9


def _bmp_pixel(media_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic RGB pattern (distinct from the PNG one), mirrored
    exactly by the SQL oracle."""
    return (
        (media_id * 5 + x * 7 + y * 3) % 256,
        (media_id + x * 11 + y * 5) % 256,
        (media_id * 7 + x + y * 13) % 256,
    )


def encode_bmp(
    pixels: list[tuple[int, int, int]], w: int, h: int, top_down: bool
) -> bytes:
    """Spec-compliant 24-bit uncompressed BMP encoder: BITMAPFILEHEADER +
    BITMAPINFOHEADER (biHeight negative for top-down), BGR byte order,
    rows padded to 4-byte boundaries, bottom-up row order unless
    ``top_down``."""
    import struct

    stride = (w * 3 + 3) & ~3
    img = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for y in rows:
        line = bytearray()
        for x in range(w):
            r, g, b = pixels[y * w + x]
            line += bytes((b, g, r))
        line += bytes(stride - len(line))
        img += line
    info = struct.pack(
        "<IiihhIIiiII",
        40, w, (-h if top_down else h), 1, 24, 0, len(img), 2835, 2835, 0, 0,
    )
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(img), 0, 0, 14 + 40
    )
    return header + info + bytes(img)


def decode_bmp(content: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Real stdlib-only BMP decoder for 24-bit BI_RGB DIBs: file/info
    header parse, signed-height orientation, per-row 4-byte padding, BGR
    order. Returns (width, height, pixels row-major top-down). Hard
    errors on malformed input."""
    import struct

    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    _, fsize, _, _, offset = struct.unpack("<2sIHHI", content[:14])
    (
        hsize, w, h_signed, planes, bpp, comp, img_size, _, _, _, _
    ) = struct.unpack("<IiihhIIiiII", content[14:54])
    if hsize != 40 or planes != 1:
        raise ValueError("unsupported DIB header")
    if bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant (need 24-bit BI_RGB)")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    stride = (w * 3 + 3) & ~3
    if offset + stride * h > len(content):
        raise ValueError("truncated BMP: pixel array short")
    pixels: list[tuple[int, int, int]] = [(0, 0, 0)] * (w * h)
    for row in range(h):
        y = row if top_down else h - 1 - row
        base = offset + row * stride
        for x in range(w):
            b = content[base + x * 3]
            g = content[base + x * 3 + 1]
            r = content[base + x * 3 + 2]
            pixels[y * w + x] = (r, g, b)
    return w, h, pixels


def _bmp_bytes(media_id: int) -> bytes:
    w, h = _bmp_dims(media_id)
    pixels = [_bmp_pixel(media_id, x, y) for y in range(h) for x in range(w)]
    return encode_bmp(pixels, w, h, top_down=bool(media_id % 2))


def synth_bmp_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """One real BMP per document (orientation alternating by id) — encoded
    executor-side in mapInPandas (bytes never visit the driver)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [_bmp_bytes(int(i)) for i in ids],
                }
            )

    return documents.select("doc_id").mapInPandas(
        fn, schema="media_id long, content binary"
    )


def bmp_features(media: DataFrame) -> DataFrame:
    """REAL BMP decode + features via mapInPandas: header parse, padding,
    orientation, BGR->RGB, then exact integer channel sums and a Rec.601
    mean luma (one exactly-rounded division) — the image_features contract
    over the second container."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                w, h, px = decode_bmp(bytes(r.content))
                sum_r = sum(p[0] for p in px)
                sum_g = sum(p[1] for p in px)
                sum_b = sum(p[2] for p in px)
                n = w * h
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": w,
                        "height": h,
                        "n_pixels": n,
                        "sum_r": sum_r,
                        "sum_g": sum_g,
                        "sum_b": sum_b,
                        "mean_luma": (sum_r * 299 + sum_g * 587 + sum_b * 114)
                        / (1000 * n),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        schema=(
            "media_id long, width int, height int, n_pixels long, "
            "sum_r long, sum_g long, sum_b long, mean_luma double"
        ),
    )


def bmp_features_oracle_sql() -> str:
    """Exact twin: regenerate the BMP pixel pattern with two range joins
    and fold the same integer sums (identical final double division).
    Orientation/padding are decoder concerns only — the pixel SET is
    orientation-invariant, which is exactly what the sums grade."""
    return """
WITH ids AS (
    SELECT doc_id AS media_id,
           5 + doc_id % 12 AS w, 5 + doc_id % 9 AS h
    FROM documents
), px AS (
    SELECT media_id, w, h,
           (media_id * 5 + x.range * 7 + y.range * 3) % 256 AS r,
           (media_id + x.range * 11 + y.range * 5) % 256 AS g,
           (media_id * 7 + x.range + y.range * 13) % 256 AS b
    FROM ids
    JOIN range(16) x ON x.range < w
    JOIN range(13) y ON y.range < h
)
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(r) * 299 + SUM(g) * 587 + SUM(b) * 114 AS DOUBLE)
         / CAST(1000 * w * h AS DOUBLE) AS mean_luma
FROM px
GROUP BY media_id, w, h
"""


# ---------------------------------------------------------------------------
# REAL image modality #3: GIF89a, end-to-end with no codec library — the
# first COMPRESSED container on the stdlib-real path whose compression is
# ours (PNG leans on zlib; GIF's variable-width LZW is implemented here in
# full: 9->12-bit code growth, the KwKwK self-reference case, dictionary
# reset via CLEAR at 4096 entries, LSB-first bit packing, 255-byte
# sub-block framing). A wrong bit anywhere in the LZW loop corrupts the
# decoded index stream and with it the graded channel sums.
# ---------------------------------------------------------------------------

_GIF_MCS = 8  # 256-entry palette -> LZW minimum code size 8


def _gif_dims(media_id: int) -> tuple[int, int]:
    # every 50th image is large enough (40x30) that the LZW code width
    # actually GROWS past 9 bits inside the graded path, not only in unit
    # tests; the rest stay small for gate speed
    if media_id % 50 == 0:
        return 40, 30
    return 6 + media_id % 11, 4 + media_id % 7


def _gif_index(media_id: int, x: int, y: int) -> int:
    """Deterministic palette-index pattern (palette-based, unlike the
    PNG/BMP truecolor patterns), mirrored exactly by the SQL oracle."""
    return (media_id * 3 + x * 5 + y * 11) % 256


def _gif_palette_rgb(media_id: int, i: int) -> tuple[int, int, int]:
    """Palette entry i of image media_id — also replayed in the oracle, so
    a decode that confuses index and color is caught."""
    return (
        (i * 7 + media_id) % 256,
        (i * 5 + media_id * 3) % 256,
        (i * 11 + media_id * 7) % 256,
    )


def _lzw_encode_gif(indices: list[int], mcs: int = _GIF_MCS) -> bytes:
    """GIF-variant LZW: emit CLEAR, then greedy longest-match codes at the
    current width; width grows when next_code == (1 << width) + 1 (one
    append AFTER the decoder's (1 << width) boundary — the decoder's table
    lags the encoder's by exactly one entry, so this is the pair that
    stays in sync); CLEAR + full reset when the dictionary hits 4096.
    Returns the packed bytes (LSB-first bit order), without sub-block
    framing."""
    clear = 1 << mcs
    eoi = clear + 1

    bits: list[tuple[int, int]] = []  # (code, width)

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(clear)}, eoi + 1, mcs + 1

    table, next_code, width = fresh()
    bits.append((clear, width))
    prev = b""
    for k in indices:
        kb = bytes([k])
        if prev + kb in table:
            prev += kb
            continue
        bits.append((table[prev], width))
        if next_code == 4096:
            bits.append((clear, width))
            table, next_code, width = fresh()
        else:
            table[prev + kb] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        prev = kb
    if prev:
        bits.append((table[prev], width))
    bits.append((eoi, width))
    # LSB-first packing
    out = bytearray()
    acc = 0
    nacc = 0
    for code, w in bits:
        acc |= code << nacc
        nacc += w
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, mcs: int = _GIF_MCS) -> list[int]:
    """The canonical GIF LZW decoder (the giflib/browser behavior): read
    variable-width codes LSB-first; KwKwK case (code == next slot) emits
    prev + prev[0]; width grows when the table reaches (1 << width); table
    stops growing at 4096 until a CLEAR resets it. Hard errors on
    out-of-range codes."""
    clear = 1 << mcs
    eoi = clear + 1

    def fresh() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = mcs + 1
    prev: bytes | None = None
    out = bytearray()
    acc = 0
    nacc = 0
    pos = 0
    while True:
        while nacc < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table = fresh()
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return list(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK self-reference case
        else:
            raise ValueError(f"bad LZW code {code} (table {len(table)})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def encode_gif(
    indices: list[int],
    palette: list[tuple[int, int, int]],
    w: int,
    h: int,
) -> bytes:
    """Spec-compliant GIF89a: header, logical screen descriptor with a
    256-entry global color table, image descriptor (no local table, no
    interlace), LZW-compressed index stream in <=255-byte sub-blocks,
    trailer."""
    import struct

    out = bytearray(b"GIF89a")
    # packed: global table flag=1, color resolution=7, sort=0, size=7
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(_GIF_MCS)
    lzw = _lzw_encode_gif(indices)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(
    content: bytes,
) -> tuple[int, int, list[int], list[tuple[int, int, int]]]:
    """Real stdlib-only GIF reader: header/LSD parse, global color table,
    extension-block skipping, image descriptor, sub-block reassembly, full
    LZW decode. Returns (width, height, indices row-major top-down,
    palette). Hard errors on malformed or unsupported (interlaced / local
    color table) input."""
    import struct

    if content[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF: bad signature")
    if len(content) < 13:
        raise ValueError("truncated GIF: short logical screen descriptor")
    sw, sh, packed, _bg, _par = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        for i in range(n):
            palette.append(
                tuple(content[pos + 3 * i : pos + 3 * i + 3])
            )
        pos += 3 * n
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF trailer before any image data")
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while pos < len(content) and content[pos] != 0:
                pos += 1 + content[pos]
            if pos >= len(content):
                raise ValueError("truncated GIF extension block")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if pos + 10 > len(content):
            raise ValueError("truncated GIF: short image descriptor")
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", content[pos : pos + 9]
        )
        pos += 9
        if ipacked & 0x80:
            raise ValueError("local color tables unsupported")
        if ipacked & 0x40:
            raise ValueError("interlaced GIFs unsupported")
        if not palette:
            raise ValueError("no color table")
        if w <= 0 or h <= 0 or w > sw or h > sh:
            raise ValueError("bad image dimensions")
        mcs = content[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(content) and content[pos] != 0:
            n = content[pos]
            if pos + 1 + n > len(content):
                raise ValueError("truncated GIF image sub-block")
            lzw += content[pos + 1 : pos + 1 + n]
            pos += 1 + n
        if pos >= len(content):
            raise ValueError("truncated GIF: missing block terminator")
        indices = _lzw_decode_gif(bytes(lzw), mcs)
        if len(indices) < w * h:
            raise ValueError(
                f"short index stream: {len(indices)} < {w * h}"
            )
        return w, h, indices[: w * h], palette
    raise ValueError("no image descriptor found")


def _gif_bytes(media_id: int) -> bytes:
    w, h = _gif_dims(media_id)
    indices = [
        _gif_index(media_id, x, y) for y in range(h) for x in range(w)
    ]
    palette = [_gif_palette_rgb(media_id, i) for i in range(256)]
    return encode_gif(indices, palette, w, h)


def synth_gif_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """One real GIF89a per document — encoded executor-side in mapInPandas
    (bytes never visit the driver)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [_gif_bytes(int(i)) for i in ids],
                }
            )

    return documents.select("doc_id").mapInPandas(
        fn, schema="media_id long, content binary"
    )


def gif_features(media: DataFrame) -> DataFrame:
    """REAL GIF decode + features via mapInPandas: LZW decompress, palette
    lookup, exact integer channel sums, a distinct-index count (grades the
    index STREAM, not just dimensions), and the Rec.601 mean luma — the
    image_features contract over the third container."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                w, h, idx, pal = decode_gif(bytes(r.content))
                sum_r = sum(pal[i][0] for i in idx)
                sum_g = sum(pal[i][1] for i in idx)
                sum_b = sum(pal[i][2] for i in idx)
                n = w * h
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": w,
                        "height": h,
                        "n_pixels": n,
                        "n_distinct_idx": len(set(idx)),
                        "sum_r": sum_r,
                        "sum_g": sum_g,
                        "sum_b": sum_b,
                        "mean_luma": (sum_r * 299 + sum_g * 587 + sum_b * 114)
                        / (1000 * n),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        schema=(
            "media_id long, width int, height int, n_pixels long, "
            "n_distinct_idx long, sum_r long, sum_g long, sum_b long, "
            "mean_luma double"
        ),
    )


def gif_features_oracle_sql() -> str:
    """Exact twin: regenerate the index pattern with two range joins, map
    indices to palette colors by the same formulas, fold identical integer
    sums (and the distinct-index count) with the same final division."""
    return """
WITH ids AS (
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 50 = 0 THEN 40 ELSE 6 + doc_id % 11 END AS w,
           CASE WHEN doc_id % 50 = 0 THEN 30 ELSE 4 + doc_id % 7 END AS h
    FROM documents
), px AS (
    SELECT media_id, w, h,
           (media_id * 3 + x.range * 5 + y.range * 11) % 256 AS idx
    FROM ids
    JOIN range(40) x ON x.range < w
    JOIN range(30) y ON y.range < h
), colored AS (
    SELECT media_id, w, h, idx,
           (idx * 7 + media_id) % 256 AS r,
           (idx * 5 + media_id * 3) % 256 AS g,
           (idx * 11 + media_id * 7) % 256 AS b
    FROM px
)
SELECT media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(COUNT(DISTINCT idx) AS BIGINT) AS n_distinct_idx,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(r) * 299 + SUM(g) * 587 + SUM(b) * 114 AS DOUBLE)
         / CAST(1000 * w * h AS DOUBLE) AS mean_luma
FROM colored
GROUP BY media_id, w, h
"""


# ---------------------------------------------------------------------------
# Voice-activity detection (speech-corpus prep): frame energies over real
# decoded PCM, threshold, and gaps-and-islands segment merge — the segment
# inventory an ASR-training pipeline builds before cutting utterances.
# ---------------------------------------------------------------------------

VAD_FRAME = 80           # 10 ms at WAV_RATE
VAD_THRESH = 1_000_000   # frame energy (sum of squares) cut


def _speech_samples(media_id: int) -> list[int]:
    """Deterministic speech-like int16 PCM: 10 ms blocks alternate voiced
    (the sawtooth pattern) and near-silence by a per-doc block rule —
    mirrored exactly by the SQL oracle.

      voiced(b)  = (media_id*7 + b*13) % 5 < 2
      sample[i]  = voiced(i DIV 80) ? (media_id*31 + i*7) % 4096 - 2048
                                    : (media_id + i) % 9 - 4
    """
    n = 200 + media_id % 300
    out = []
    for i in range(n):
        if (media_id * 7 + (i // VAD_FRAME) * 13) % 5 < 2:
            out.append(((media_id * 31 + i * 7) % 4096) - 2048)
        else:
            out.append((media_id + i) % 9 - 4)
    return out


def synth_speech_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """One real mono 16-bit WAV per document with the speech-like
    voiced/silence block structure — built executor-side (bytes never
    visit the driver), same contract as synth_wav_media."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": [
                        _wav_bytes(_speech_samples(int(i))) for i in ids
                    ],
                }
            )

    return documents.select("doc_id").mapInPandas(
        fn, schema="media_id long, content binary"
    )


def _vad_frames(media: DataFrame) -> DataFrame:
    """(media_id, frame, energy, peak): real WAV decode + 10 ms framing
    with exact integer frame energies — the per-file part of the VAD
    family, shared by audio_vad and audio_vad_hangover."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            mids, frames, energies, peaks = [], [], [], []
            for r in pdf.itertuples(index=False):
                with wave.open(io.BytesIO(bytes(r.content)), "rb") as w:
                    n = w.getnframes()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                for f0 in range(0, n, VAD_FRAME):
                    chunk = samples[f0 : f0 + VAD_FRAME]
                    mids.append(r.media_id)
                    frames.append(f0 // VAD_FRAME)
                    energies.append(sum(s * s for s in chunk))
                    peaks.append(max(abs(s) for s in chunk))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame": frames,
                    "energy": energies,
                    "peak": peaks,
                }
            )

    return media.mapInPandas(
        fn, schema="media_id long, frame int, energy long, peak int"
    )


def audio_vad(media: DataFrame) -> DataFrame:
    """(media_id, seg, start_ms, end_ms, n_frames, energy, peak): energy
    VAD over REAL decoded WAV audio — the utterance segmentation a
    speech-data pipeline runs before cutting training clips.

    Split of labor (the multimodal discipline): the inherently per-file
    part — WAV container parse + 10 ms framing with exact integer frame
    energies — runs as an Arrow-batched mapInPandas; everything after is
    DataFrame algebra: threshold cut, gaps-and-islands merge of adjacent
    voiced frames (frame - ROW_NUMBER() island key over a per-media
    window — frames per file are duration-bounded, never corpus-sized),
    and per-segment integer rollups. The oracle regenerates the PCM by
    formula and applies the IDENTICAL energy rule, so the value hash
    grades the real decode path end to end.

    Scale: one decode pass, frames shuffle once on (media_id) for the
    bounded per-file window, segments are tiny. 100 TB of audio = more
    files, same per-file work."""
    from pyspark.sql import Window

    voiced = _vad_frames(media).where(F.col("energy") >= VAD_THRESH)
    w = Window.partitionBy("media_id").orderBy("frame")
    isl = voiced.withColumn(
        "grp", F.col("frame") - F.row_number().over(w)
    )
    ms = 1000 * VAD_FRAME // WAV_RATE
    return (
        isl.groupBy("media_id", "grp")
        .agg(
            F.min("frame").alias("f0"),
            F.max("frame").alias("f1"),
            F.count(F.lit(1)).cast("int").alias("n_frames"),
            F.sum("energy").cast("long").alias("energy"),
            F.max("peak").cast("int").alias("peak"),
        )
        .select(
            "media_id",
            F.row_number()
            .over(
                Window.partitionBy("media_id").orderBy("f0")
            )
            .cast("int")
            .alias("seg"),
            (F.col("f0").cast("long") * ms).alias("start_ms"),
            ((F.col("f1").cast("long") + 1) * ms).alias("end_ms"),
            "n_frames",
            "energy",
            "peak",
        )
    )


def audio_vad_oracle_sql() -> str:
    """Regenerate the speech PCM by formula, frame, threshold, and merge
    with the identical gaps-and-islands rule."""
    ms = 1000 * VAD_FRAME // WAV_RATE
    return f"""
WITH vids AS (
    SELECT doc_id AS media_id, 200 + doc_id % 300 AS n FROM documents
), vsamp AS (
    SELECT media_id, CAST(i.range // {VAD_FRAME} AS INT) AS frame,
           CASE WHEN (media_id * 7 + (i.range // {VAD_FRAME}) * 13) % 5 < 2
                THEN (media_id * 31 + i.range * 7) % 4096 - 2048
                ELSE (media_id + i.range) % 9 - 4 END AS s
    FROM vids JOIN range(500) i ON i.range < n
), vfr AS (
    SELECT media_id, frame,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(MAX(ABS(s)) AS INT) AS peak
    FROM vsamp GROUP BY media_id, frame
), vvo AS (
    SELECT media_id, frame, energy, peak,
           frame - ROW_NUMBER() OVER (PARTITION BY media_id
                                      ORDER BY frame) AS grp
    FROM vfr WHERE energy >= {VAD_THRESH}
), vseg AS (
    SELECT media_id, grp,
           MIN(frame) AS f0, MAX(frame) AS f1,
           CAST(COUNT(*) AS INT) AS n_frames,
           CAST(SUM(energy) AS BIGINT) AS energy,
           CAST(MAX(peak) AS INT) AS peak
    FROM vvo GROUP BY media_id, grp
)
SELECT media_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY f0) AS INT)
           AS seg,
       CAST(f0 AS BIGINT) * {ms} AS start_ms,
       (CAST(f1 AS BIGINT) + 1) * {ms} AS end_ms,
       n_frames, energy, peak
FROM vseg
"""


VAD_HANGOVER = 1  # bridge silence gaps of <= this many frames


def audio_vad_hangover(
    media: DataFrame, hangover: int = VAD_HANGOVER
) -> DataFrame:
    """(media_id, seg, start_ms, end_ms, n_voiced, n_bridged, energy,
    peak): the production VAD's HANGOVER smoothing — two voiced frames
    separated by <= ``hangover`` silent frames belong to ONE utterance
    (speech codecs hold the channel open across sub-100 ms pauses;
    hangover=0 reduces exactly to audio_vad's segments, pinned).

    Same split of labor as audio_vad: the framing runs in the shared
    per-file mapInPandas; the smoothing is a LAG-gap rule entirely in
    DataFrame algebra — a new segment starts where the gap to the
    previous voiced frame exceeds hangover + 1, the running sum of
    starts is the segment id, one rollup ends it. n_bridged counts the
    silent frames the hangover absorbed ((f1 - f0 + 1) - n_voiced), so
    the value hash grades the bridging itself, not just the boundaries.
    All windows per-media (duration-bounded), never corpus-sized."""
    from pyspark.sql import Window

    voiced = _vad_frames(media).where(F.col("energy") >= VAD_THRESH)
    w = Window.partitionBy("media_id").orderBy("frame")
    seg = voiced.withColumn(
        "new_seg",
        F.when(
            F.coalesce(
                F.col("frame") - F.lag("frame").over(w),
                F.lit(hangover + 2),
            )
            > hangover + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "seg",
        F.sum("new_seg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    ms = 1000 * VAD_FRAME // WAV_RATE
    return (
        seg.groupBy("media_id", "seg")
        .agg(
            F.min("frame").alias("f0"),
            F.max("frame").alias("f1"),
            F.count(F.lit(1)).cast("int").alias("n_voiced"),
            F.sum("energy").cast("long").alias("energy"),
            F.max("peak").cast("int").alias("peak"),
        )
        .select(
            "media_id",
            "seg",
            (F.col("f0").cast("long") * ms).alias("start_ms"),
            ((F.col("f1").cast("long") + 1) * ms).alias("end_ms"),
            "n_voiced",
            (F.col("f1") - F.col("f0") + 1 - F.col("n_voiced"))
            .cast("int")
            .alias("n_bridged"),
            "energy",
            "peak",
        )
    )


def audio_vad_hangover_oracle_sql(hangover: int = VAD_HANGOVER) -> str:
    ms = 1000 * VAD_FRAME // WAV_RATE
    return f"""
WITH hvids AS (
    SELECT doc_id AS media_id, 200 + doc_id % 300 AS n FROM documents
), hvsamp AS (
    SELECT media_id, CAST(i.range // {VAD_FRAME} AS INT) AS frame,
           CASE WHEN (media_id * 7 + (i.range // {VAD_FRAME}) * 13) % 5 < 2
                THEN (media_id * 31 + i.range * 7) % 4096 - 2048
                ELSE (media_id + i.range) % 9 - 4 END AS s
    FROM hvids JOIN range(500) i ON i.range < n
), hvfr AS (
    SELECT media_id, frame,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(MAX(ABS(s)) AS INT) AS peak
    FROM hvsamp GROUP BY media_id, frame
), hvvo AS (
    SELECT media_id, frame, energy, peak,
           CASE WHEN COALESCE(frame - LAG(frame) OVER (
                        PARTITION BY media_id ORDER BY frame),
                    {int(hangover) + 2}) > {int(hangover) + 1}
                THEN 1 ELSE 0 END AS new_seg
    FROM hvfr WHERE energy >= {VAD_THRESH}
), hvseg AS (
    SELECT media_id, frame, energy, peak,
           CAST(SUM(new_seg) OVER (PARTITION BY media_id ORDER BY frame
                ROWS UNBOUNDED PRECEDING) AS INT) AS seg
    FROM hvvo
)
SELECT media_id, seg,
       CAST(MIN(frame) AS BIGINT) * {ms} AS start_ms,
       (CAST(MAX(frame) AS BIGINT) + 1) * {ms} AS end_ms,
       CAST(COUNT(*) AS INT) AS n_voiced,
       CAST(MAX(frame) - MIN(frame) + 1 - COUNT(*) AS INT) AS n_bridged,
       CAST(SUM(energy) AS BIGINT) AS energy,
       CAST(MAX(peak) AS INT) AS peak
FROM hvseg
GROUP BY media_id, seg
"""
