"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns + a typed metadata struct —
the lakehouse-standard layout (parquet stores the bytes; column stats
and pruning work on the metadata).  Decode/feature-extract run as
Arrow-batched ``mapInPandas`` stages: bytes never hit the Python driver,
batches flow executor-side, and the pipeline scales by partitioning
exactly like any other operator.

Codec status: compressed codecs (PIL/ffmpeg/librosa) are NOT in this
container, so JPEG/PNG/audio decode stays STUBBED with a clear
NotImplementedError.  UNCOMPRESSED images are decoded for real:
``decode_image``/``encode_bmp`` implement the public BMP format
(BITMAPINFOHEADER, 24bpp bottom-up, 4-byte row padding) in pure numpy,
``resize_nearest`` is numpy nearest-neighbor, and ``extract_features``
computes real channel-statistics + grayscale-histogram features for BMP
content (hash-derived fake vectors remain the fallback for non-BMP
bytes, keeping the plumbing testable for any payload).

Reference: no counterpart in Presto (varbinary + UDF would be the
closest) — this is §"beyond the reference" training-pipeline surface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_DIM",
    "blob_table_from_documents",
    "bmp_media_from_documents",
    "bmp_closed_form_media",
    "decode_image",
    "encode_bmp",
    "image_features",
    "resize_nearest",
    "extract_features",
    "sample_frames",
]

FEATURE_DIM = 16


def _python_stage_parallelism(spark: SparkSession) -> int:
    """Partition count for the Arrow/Python codec stages (round 15).

    The single-row-group fixture scan drags the whole chained
    encode->decode->stats Python pipeline through ONE task / ONE Python
    worker (stage profile: 0.35 s wall, 0.03 s JVM CPU — the rest was
    one worker working serially).  Full core-count fan-out overshoots
    the other way: each task of a chained two-Python-stage pipeline
    holds TWO workers, and at 32 partitions the per-task worker
    round-trips cost more than the ~0.3 s of actual Python compute
    (measured 0.64 s wall at 32 vs 0.35 s single-task).  A modest
    fan-out amortizes worker startup while still parallelizing the
    codec work; env-overridable for clusters where the Python work per
    row is heavier (then raise toward the core count).
    """
    import os

    try:
        n = int(os.environ.get("SPARK_GRAFT_PY_STAGE_PARTITIONS", "0") or 0)
    except ValueError:
        # non-numeric override: fall back to the computed default rather
        # than failing every multimodal query at build time (ADVICE r15)
        n = 0
    if n > 0:
        return n
    return max(2, spark.sparkContext.defaultParallelism // 4)


def _spread_for_python(df, spark: SparkSession):
    """Establish the Python-stage parallelism floor WITHOUT coalescing a
    naturally-split scan (ADVICE r15): the unconditional repartition was
    right for the single-row-group fixtures but on a production scan
    with more partitions than the floor it would CONCENTRATE Arrow
    batches into cores/4 huge partitions.  Same guarded-no-op contract
    as qutil.spread_scan — repartition only when the scan is below the
    floor."""
    floor = _python_stage_parallelism(spark)
    if df.rdd.getNumPartitions() >= floor:
        return df
    return df.repartition(floor)

# media_id + raw bytes + typed metadata: the multimodal table layout.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image/audio/video
        StructField("content", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def blob_table_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a deterministic multimodal table from the documents
    fixture (text bytes stand in for media bytes; metadata derived from
    doc stats).  Real pipelines read parquet with a binary column."""
    from ..catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def bmp_media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose image rows carry REAL BMP bytes: each document
    becomes a small deterministic RGB pattern image (seeded by doc_id)
    encoded with :func:`encode_bmp` inside mapInPandas — the bytes are
    produced and consumed executor-side, never on the driver."""
    from ..catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = 4 + int(doc_id) % 13
                h = 4 + int(n_chars) % 11
                rng = np.random.default_rng(int(doc_id))
                px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                rows.append((int(doc_id), encode_bmp(px), w, h))
            yield pd.DataFrame(
                rows, columns=["media_id", "content", "width", "height"]
            )

    media = d.mapInPandas(
        gen, schema="media_id long, content binary, width int, height int"
    )
    return media.select(
        "media_id",
        F.lit("image").alias("media_type"),
        "content",
        F.struct(
            F.col("width"),
            F.col("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("bmp").alias("codec"),
        ).alias("meta"),
    )


def bmp_closed_form_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image media rows with REAL BMP bytes whose pixel values follow a
    CLOSED FORM — the image twin of ``wav_media_from_documents``: every
    doc_id % 3 == 0 document becomes a (4 + n_chars % 11) x
    (4 + doc_id % 13) RGB image with
    pixel(y, x, c) = (doc_id*7 + y*31 + x*13 + c*5) % 256, encoded
    executor-side with :func:`encode_bmp`.  The bytes never touch the
    driver, and the pixel formula lets a SQL oracle recompute every
    statistic without parsing a byte (round 8 — closes the
    multimodal_features rows-only residue)."""
    from ..catalog import load_table

    # spread BEFORE the Python stages (round 15; rationale + measured
    # sweet spot in _python_stage_parallelism): parallelism must be
    # established before the opaque Python boundary (guide §4), Spark
    # cannot re-split inside it.  Guarded no-op on a naturally-split
    # scan (ADVICE r15 — see _spread_for_python).
    d = _spread_for_python(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", "n_chars"),
        spark,
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id = int(doc_id)
                w = 4 + doc_id % 13
                h = 4 + int(n_chars) % 11
                y = np.arange(h, dtype=np.int64)[:, None, None]
                x = np.arange(w, dtype=np.int64)[None, :, None]
                c = np.arange(3, dtype=np.int64)[None, None, :]
                px = ((doc_id * 7 + y * 31 + x * 13 + c * 5) % 256).astype(
                    np.uint8
                )
                rows.append((doc_id, encode_bmp(px)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return d.mapInPandas(gen, schema="media_id long, content binary")


def image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched BMP feature extraction: parse the container with
    :func:`decode_image` (the REAL 24bpp reader) and compute integer
    image statistics — per-channel pixel sums and the bright-pixel count
    (r + g + b >= 384, i.e. mean channel >= 128).  All int64, so the
    whole encode -> shuffle -> decode -> stats path is SQL-replayable
    exactly (the audio_features design, applied to images)."""

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                img = decode_image(raw).astype(np.int64)
                h, w = img.shape[:2]
                rows.append(
                    (
                        int(media_id),
                        len(raw),
                        w,
                        h,
                        int(img[:, :, 0].sum()),
                        int(img[:, :, 1].sum()),
                        int(img[:, :, 2].sum()),
                        int((img.sum(axis=2) >= 384).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_bytes",
                    "width",
                    "height",
                    "r_sum",
                    "g_sum",
                    "b_sum",
                    "bright_px",
                ],
            )

    return media.mapInPandas(
        feats,
        schema="media_id long, n_bytes long, width int, height int,"
        " r_sum long, g_sum long, b_sum long, bright_px long",
    )


def encode_bmp(pixels) -> bytes:
    """(H, W, 3) uint8 RGB -> 24bpp bottom-up BMP bytes (public spec:
    BITMAPFILEHEADER + BITMAPINFOHEADER, BGR byte order, rows padded to
    4 bytes)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    size = 14 + 40 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + info + bytes(body)


def decode_image(content: bytes):
    """Decode image bytes -> (H, W, 3) uint8 RGB array.

    REAL for 24bpp uncompressed BMP (pure numpy, public spec).
    Compressed codecs are not installed in this container, so other
    magics raise NotImplementedError with the documented message —
    extract_features then substitutes the deterministic fake embedding.
    """
    import struct

    import numpy as np

    if content[:2] == b"BM":
        data_off = struct.unpack_from("<I", content, 10)[0]
        hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
            "<IiiHHI", content, 14
        )
        if bpp != 24 or comp != 0:
            raise NotImplementedError(f"BMP variant bpp={bpp} comp={comp}")
        pad = (-(w * 3)) % 4
        stride = w * 3 + pad
        rows = np.frombuffer(
            content, dtype=np.uint8, count=abs(h) * stride, offset=data_off
        ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
        if h > 0:  # bottom-up
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR -> RGB
    raise NotImplementedError(
        "compressed image decode requires PIL/pillow (not available in this"
        " container); extract_features substitutes a deterministic fake"
        " embedding"
    )


def resize_nearest(img, out_h: int, out_w: int):
    """Nearest-neighbor resize for (H, W, 3) arrays — the pre-model
    normalization step, pure numpy."""
    import numpy as np

    img = np.asarray(img)
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi][:, xi]


def _bmp_features(content: bytes) -> list[float]:
    """Real features for decodable content: per-channel means + overall
    std (4) + 12-bin grayscale histogram of the 8x8 nearest-resize =
    FEATURE_DIM floats, all in [0, 1]."""
    import numpy as np

    img = decode_image(content).astype(np.float64) / 255.0
    small = resize_nearest(img, 8, 8)
    gray = small.mean(axis=2)
    hist, _ = np.histogram(gray, bins=FEATURE_DIM - 4, range=(0.0, 1.0))
    hist = hist / gray.size
    return [
        float(img[:, :, 0].mean()),
        float(img[:, :, 1].mean()),
        float(img[:, :, 2].mean()),
        float(img.std()),
        *[float(v) for v in hist],
    ]


def _fake_embedding(content: bytes) -> list[float]:
    """Deterministic stand-in for model(decode(bytes)): md5-seeded floats
    in [-1, 1).  Stable across runs/partitions — testable plumbing."""
    out: list[float] = []
    h = content
    while len(out) < FEATURE_DIM:
        h = hashlib.md5(h).digest()
        out.extend(int.from_bytes(h[i : i + 4], "big") / 2**31 - 1.0 for i in (0, 4, 8, 12))
    return out[:FEATURE_DIM]


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: (media_id, media_type, content) ->
    (media_id, media_type, n_bytes, feature array<float>).

    The iterator-of-batches shape is the production contract: each Arrow
    batch is decoded + embedded in one vectorized call (model inference
    batches naturally); memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch, not partition size.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("media_type", StringType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("feature", ArrayType(FloatType()), False),
        ]
    )

    def embed(content: bytes) -> list[float]:
        # ANY undecodable payload falls back to the deterministic fake —
        # including garbage that starts with 'BM' but truncates mid-
        # header (struct.error/ValueError), which a corpus of arbitrary
        # bytes will always contain
        try:
            return _bmp_features(bytes(content))
        except Exception:
            return _fake_embedding(bytes(content))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feature": pdf["content"].map(embed),
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    offset (plumbing real — frame *content* decode is stubbed to a
    deterministic byte slice).  explode() keeps it JVM-side."""
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)),
        lambda off: F.struct(
            off.alias("offset_ms"),
            # stub: real impl decodes the frame at `off`; we slice bytes
            F.substring(F.col("content"), 1, 16).alias("frame_stub"),
        ),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.explode(frames).alias("f"))
        .select("media_id", "f.offset_ms", "f.frame_stub")
    )


# --------------------------------------------------------------------------
# Audio: REAL RIFF/WAVE PCM16 codec (public spec — RIFF container, fmt
# chunk, little-endian int16 data), pure struct/numpy like the BMP path.
# Compressed audio (mp3/ogg/flac) stays honestly stubbed: no codec libs
# in this container.
# --------------------------------------------------------------------------
def encode_wav(samples, rate: int = 16000) -> bytes:
    """int16 mono PCM samples -> RIFF/WAVE bytes."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    data = struct.pack("<4sI", b"data", len(s)) + s
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
        + fmt
        + data
    )


def decode_wav(content: bytes):
    """RIFF/WAVE bytes -> (sample_rate, np.int16 array).

    REAL for PCM16 mono (chunk walk per the public spec); anything else
    raises NotImplementedError with the documented message."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed/non-RIFF audio decode requires codec libs"
            " (not available in this container)"
        )
    off, rate = 12, None
    while off + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, off)
        off += 8
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", content, off
            )
            if audio_fmt != 1 or ch != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV variant fmt={audio_fmt} ch={ch} bits={bits}"
                )
        elif cid == b"data":
            return rate, np.frombuffer(
                content, dtype="<i2", count=size // 2, offset=off
            ).copy()
        off += size + (size % 2)
    raise NotImplementedError("WAV payload without a data chunk")


def wav_media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media rows whose audio entries carry REAL WAV bytes: every
    doc_id % 3 == 1 document becomes a deterministic int16 waveform
    s_i = ((doc_id*31 + i*17) % 2048) - 1024 of 200 + doc_id % 97
    samples, encoded executor-side with :func:`encode_wav` — the bytes
    never touch the driver, and the closed-form sample formula lets a
    SQL oracle recompute every statistic without parsing a byte."""
    from ..catalog import load_table

    # spread BEFORE the Python stages (round 15) — same starved-scan fix
    # as bmp_closed_form_media: without it the encode->decode->stats
    # chain runs in ONE Python worker.  Guarded no-op on a naturally-
    # split scan (ADVICE r15 — see _spread_for_python).
    d = _spread_for_python(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select("doc_id"),
        spark,
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 200 + doc_id % 97
                i = np.arange(n, dtype=np.int64)
                s = ((doc_id * 31 + i * 17) % 2048) - 1024
                rate = 8000 + (doc_id % 3) * 4000
                rows.append((doc_id, encode_wav(s.astype("<i2"), rate)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return d.mapInPandas(gen, schema="media_id long, content binary")


def audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched WAV feature extraction: parse the RIFF container,
    compute integer signal statistics (all int64 — products of int16
    samples are widened BEFORE multiplying, numpy would silently wrap
    int16 * int16)."""

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                rate, s = decode_wav(bytes(content))
                s = s.astype(np.int64)
                rows.append(
                    (
                        int(media_id),
                        int(rate),
                        int(s.size),
                        int(np.abs(s).sum()),
                        int((s * s).sum()),
                        int(np.sum(s[1:] * s[:-1] < 0)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_samples",
                    "sum_abs",
                    "energy",
                    "zero_crossings",
                ],
            )

    return media.mapInPandas(
        feats,
        schema="media_id long, sample_rate long, n_samples long,"
        " sum_abs long, energy long, zero_crossings long",
    )
